"""The chunked guided trainer (train_scan: one device dispatch per span
between schedule events, device-resident pseudo pool) must reproduce the
per-step guided trainer: same rng streams (camera picks, pseudo picks,
event shuffles), same schedule semantics (densify boundaries, per-step xyz
LR, pseudo window/weight, diffusion events after steps (it-1)%vd==0)."""

import dataclasses
import math

import numpy as np
import pytest

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.train.guided import (
    FrozenRenderer,
    GuidedTrainer,
    MockDiffusionEngine,
)

from helpers import random_gaussians, activated
from test_train_baseline import FakeModelParams, FakeOpt, FakePipe, FakeScene, make_synthetic

pytestmark = pytest.mark.slow


@dataclasses.dataclass
class ScanOpt(FakeOpt):
    iterations: int = 130
    start_sample_pseudo: int = 10
    end_sample_pseudo: int = 125
    sample_pseudo_interval: int = 1
    pseudo_cam_weight: float = 0.05
    pseudo_cam_ssim: bool = False
    pseudo_cam_lpips: bool = False
    pseudo_cam_weight_decay: bool = False
    guidance_vd_iter: int = 40
    guidance_vc_center_scale: float = 1.0
    no_guidance: bool = False
    # cover a densify boundary inside the run
    densification_interval: int = 50
    densify_from_iter: int = 20
    densify_until_iter: int = 100
    opacity_reset_interval: int = 10_000


def _intrinsic(cam):
    fx = cam.image_width / (2.0 * math.tan(cam.FoVx / 2.0))
    fy = cam.image_height / (2.0 * math.tan(cam.FoVy / 2.0))
    return np.array(
        [[fx, 0, cam.image_width / 2.0], [0, fy, cam.image_height / 2.0], [0, 0, 1]]
    )


def _make_trainer():
    cams = make_synthetic()
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=1.2, size=(96, 3)).astype(np.float32)
    cols = rng.uniform(size=(96, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=256)

    gt_parts = activated(*random_gaussians(n=80, seed=42))
    gt_state = G.create_from_pcd(
        np.asarray(gt_parts[0]), np.ones((80, 3)) * 0.5, capacity=128
    )
    frozen = FrozenRenderer(gt_state, sh_degree=0, backend="dense")

    scene = FakeScene(cams, extent=3.0)
    engine = MockDiffusionEngine(video_length=5, height=40, width=40)
    return GuidedTrainer(
        scene, state, ScanOpt(), FakePipe(), FakeModelParams(),
        frozen=frozen, engine=engine,
        pcd_points=pts, pcd_colors=cols,
        guidance_intrinsic=_intrinsic(cams[0]),
    )


def test_guided_scan_matches_per_step_trainer():
    t1 = _make_trainer()
    t1.init_trajectory_pool()
    for it in range(1, ScanOpt.iterations + 1):
        t1.step(it)

    t2 = _make_trainer()
    t2.init_trajectory_pool()
    t2.train_scan(iterations=ScanOpt.iterations, log_every=0)

    assert t2.events_run == t1.events_run
    assert len(t2.pseudo_stack) == len(t1.pseudo_stack)
    assert len(t2.pseudo_stack_alltime) == len(t1.pseudo_stack_alltime)
    for a, b, name in [
        (t1.state.params.xyz, t2.state.params.xyz, "xyz"),
        (t1.state.params.opacity, t2.state.params.opacity, "opacity"),
        (t1.state.params.scaling, t2.state.params.scaling, "scaling"),
        (t1.state.params.features_dc, t2.state.params.features_dc, "features_dc"),
    ]:
        # compiled-once scan body vs per-call jits fuse differently; after
        # 130 Adam steps isolated elements accumulate ~1-2% relative drift
        # (same rationale as test_train_scan). Real semantic divergence
        # (wrong camera/pseudo frame/weight) shows up orders of magnitude
        # larger, so 2% still pins the semantics.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3, err_msg=name
        )
