"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding code is exercised without TPU hardware via
xla_force_host_platform_device_count — the standard way to test mesh/pjit
code (SURVEY.md section 4). NOTE: the JAX_PLATFORMS env var is overridden by
the axon TPU plugin in this image, so we must force the platform through
jax.config before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
# NOTE: never combine this flag with real-TPU runs — through the axon
# plugin it deterministically mis-compiles the Pallas tile rasterizer
# (verified: same kernel, same inputs, 0.64 max color error with the flag,
# 6e-5 without; bit-identical across runs either way).
if not os.environ.get("GVDTPU_TEST_TPU") and (
    "xla_force_host_platform_device_count" not in flags
):
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# GVDTPU_TEST_TPU=1 leaves the real device visible so the `tpu`-marked
# hardware tests (compiled-kernel parity / grad finiteness) can run:
#   GVDTPU_TEST_TPU=1 pytest tests/test_raster_tiles.py -m tpu -o addopts=""
if not os.environ.get("GVDTPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
