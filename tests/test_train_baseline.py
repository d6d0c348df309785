"""End-to-end baseline training on a synthetic scene: loss falls, PSNR rises,
densify/reset fire without breaking the jitted step."""

import pytest
import dataclasses

import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.models.render import render_state
from guidedvd3dgs_tpu.train.baseline import BaselineTrainer

from helpers import make_camera, random_gaussians, activated


@dataclasses.dataclass
class FakeOpt:
    iterations: int = 300
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 300
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 10000
    densify_from_iter: int = 100
    prune_from_iter: int = 100
    densify_until_iter: int = 300
    densify_grad_threshold: float = 0.0005
    prune_threshold: float = 0.005
    dist_thres: float = 10.0
    seed: int = 1


@dataclasses.dataclass
class FakePipe:
    use_confidence: bool = False
    raster_backend: str = "dense"


@dataclasses.dataclass
class FakeModelParams:
    sh_degree: int = 3
    white_background: bool = False


class FakeScene:
    def __init__(self, cams, extent):
        self.cams = cams
        self.cameras_extent = extent

    def getTrainCameras(self):
        return self.cams

    def getTestCameras(self):
        return self.cams

    def save(self, it, state):
        pass


def make_synthetic():
    # ground-truth gaussian set renders the target images
    gt_parts = activated(*random_gaussians(n=80, seed=42))
    gt_state_inputs = tuple(jnp.asarray(p) for p in gt_parts)

    cams = []
    for i, z in enumerate([-4.0, -4.5, -3.6]):
        cam = make_camera(height=40, width=40, cam_z=z, seed=i)
        from guidedvd3dgs_tpu.ops.raster_dense import rasterize_dense

        out = rasterize_dense(*gt_state_inputs, cam.raster_camera(), jnp.zeros(3))
        cam.image = np.clip(np.asarray(out.color), 0, 1)
        cams.append(cam)
    return cams


@pytest.mark.slow
def test_baseline_training_improves_psnr():
    cams = make_synthetic()
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=1.2, size=(96, 3)).astype(np.float32)
    cols = rng.uniform(size=(96, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=512)

    scene = FakeScene(cams, extent=3.0)
    trainer = BaselineTrainer(scene, state, FakeOpt(), FakePipe(), FakeModelParams())

    first = trainer.evaluate(cams)
    trainer.train(iterations=300, log_every=0)
    last = trainer.evaluate(cams)

    assert last["psnr"] > first["psnr"] + 3.0, (first, last)
    assert np.isfinite(last["psnr"])
    # densify ran (state still valid, compacted)
    act = np.asarray(trainer.state.active)
    n = act.sum()
    assert act[:n].all()


def test_write_checkpoint_hook_roundtrip(tmp_path):
    """BaselineTrainer.write_checkpoint (the hook GuidedTrainer overrides)
    writes a load_checkpoint-compatible file."""
    from guidedvd3dgs_tpu.train.checkpoint import load_checkpoint

    cams = make_synthetic()
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=1.2, size=(32, 3)).astype(np.float32)
    cols = rng.uniform(size=(32, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=64)
    scene = FakeScene(cams, extent=3.0)
    trainer = BaselineTrainer(scene, state, FakeOpt(), FakePipe(), FakeModelParams())

    path = str(tmp_path / "chkpnt7.ckpt")
    trainer.write_checkpoint(path, 7)
    restored, it = load_checkpoint(path, trainer.state)
    assert it == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params.xyz), np.asarray(trainer.state.params.xyz)
    )
