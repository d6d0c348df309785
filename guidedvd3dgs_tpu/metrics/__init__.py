from guidedvd3dgs_tpu.metrics.lpips import lpips, LPIPSModel, load_lpips  # noqa: F401
