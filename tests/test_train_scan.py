"""train_scan (chunked, one dispatch per ~100 steps) must reproduce the
per-step trainer exactly: same rng camera sequence, same schedule semantics
(SH bump at k*500, densify/reset boundaries, per-step xyz LR, adam skipped
on densify iterations)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_camera, random_gaussians

pytestmark = pytest.mark.slow


class _Opt:
    iterations = 260
    position_lr_init = 0.00016
    position_lr_final = 0.0000016
    position_lr_delay_mult = 0.01
    position_lr_max_steps = 260
    feature_lr = 0.0025
    opacity_lr = 0.05
    scaling_lr = 0.005
    rotation_lr = 0.001
    percent_dense = 0.01
    lambda_dssim = 0.2
    densification_interval = 100
    opacity_reset_interval = 10_000
    densify_from_iter = 50
    prune_from_iter = 50
    densify_until_iter = 200
    densify_grad_threshold = 1e10  # sparse-view setting: no grad densify
    prune_threshold = 0.005
    dist_thres = 10.0
    seed = 3


class _Pipe:
    use_confidence = False
    raster_backend = "dense"


class _MP:
    sh_degree = 1
    white_background = False


class _Scene:
    def __init__(self, cams, extent=3.0):
        self._cams = cams
        self.cameras_extent = extent

    def getTrainCameras(self):
        return self._cams

    def getTestCameras(self):
        return []


def _make_state():
    from guidedvd3dgs_tpu.models import gaussians as G

    xyz, log_scales, rots, opac_logit, sh = random_gaussians(n=300, seed=0)
    rgb = 1.0 / (1.0 + np.exp(-sh[:, 0]))
    return G.create_from_pcd(xyz, rgb, capacity=512)


def test_scan_matches_per_step_trainer():
    from guidedvd3dgs_tpu.train.baseline import BaselineTrainer

    cams = [make_camera(height=48, width=48, seed=i, look_noise=0.05) for i in range(4)]

    t1 = BaselineTrainer(_Scene(cams), _make_state(), _Opt(), _Pipe(), _MP())
    for it in range(1, _Opt.iterations + 1):
        t1.step(it)

    t2 = BaselineTrainer(_Scene(cams), _make_state(), _Opt(), _Pipe(), _MP())
    t2.train_scan(iterations=_Opt.iterations, log_every=0)

    assert t2.active_sh_degree == t1.active_sh_degree
    for a, b, name in [
        (t1.state.params.xyz, t2.state.params.xyz, "xyz"),
        (t1.state.params.opacity, t2.state.params.opacity, "opacity"),
        (t1.state.params.scaling, t2.state.params.scaling, "scaling"),
    ]:
        # compiled-once scan body vs per-call jits fuse differently; after
        # 260 Adam steps a handful of elements accumulate ~1e-3 relative
        # drift — allow that while still pinning the semantics
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4, err_msg=name
        )
