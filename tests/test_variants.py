"""Trainer-variant tests: two-renderer mask source, hybrid txt warmup,
project-cam epochs, preset trajectories."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from guidedvd3dgs_tpu.guidance import pose_math as pm
from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.train.guided import FrozenRenderer, GuidedTrainer, MockDiffusionEngine
from guidedvd3dgs_tpu.train.project_cam import ProjectCamTrainer

from helpers import make_camera, random_gaussians, activated
from test_train_baseline import FakeModelParams, FakeOpt, FakePipe, FakeScene, make_synthetic
from test_train_guided import GuidedOpt, _intrinsic, _setup


def test_traj_presets_shapes():
    c2w = np.eye(4)[None]
    c2w[0, 2, 3] = 1.0
    for name, (phis, thetas, rs) in pm.TRAJ_PRESETS.items():
        traj = pm.traj_from_txt(c2w, phis, thetas, rs, frames=25)
        assert traj.shape == (25, 4, 4), name
        assert np.isfinite(traj).all(), name
        np.testing.assert_allclose(traj[0], c2w[0], atol=1e-9)


def test_hybrid_traj_warmup_switches_to_pool():
    trainer, cams = _setup()
    trainer.hybrid_traj = True
    trainer.txt_traj_warmup = True
    trainer.init_trajectory_pool()
    pool_sizes = {k: len(v) for k, v in trainer.trajectory_pool_shuffle.items()}
    # first epoch of events: txt trajectories, pool untouched
    for _ in range(len(cams)):
        trainer.run_diffusion_event(1)
    assert {k: len(v) for k, v in trainer.trajectory_pool_shuffle.items()} == pool_sizes
    assert trainer.txt_traj_warmup  # flips on the NEXT epoch's refill
    trainer.run_diffusion_event(2)
    assert not trainer.txt_traj_warmup
    total_after = sum(len(v) for v in trainer.trajectory_pool_shuffle.values())
    assert total_after == sum(pool_sizes.values()) - 1  # one pool pop


def test_two_renderer_mask_source():
    trainer, cams = _setup()
    # mask renderer: empty model -> alpha == 0 -> mask (alpha<0.9) everywhere
    empty = G.create_from_pcd(np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
                              capacity=16)
    empty = empty._replace(active=jnp.zeros((16,), bool))
    trainer.frozen_mask = FrozenRenderer(empty, sh_degree=0, backend="dense")
    trainer.init_trajectory_pool()
    # with an all-empty mask renderer every candidate has huge unobserved
    # area -> the pool is empty (all filtered by the 0.1*H*W threshold)
    assert all(len(v) == 0 for v in trainer.trajectory_pool.values())


def test_project_cam_trainer_epochs():
    cams = make_synthetic()
    for c in cams:
        c.projected_image = np.asarray(c.image) * 0.5
        c.projected_mask = np.ones((1, c.image_height, c.image_width), np.float32)

    @dataclasses.dataclass
    class Opt(FakeOpt):
        project_cam_prob: float = -1.0  # rand() > -1 -> ALWAYS project cams
        project_cam_weight: float = 0.05
        densify_from_iter: int = 1000
        densify_until_iter: int = 0

    rng = np.random.default_rng(7)
    pts = rng.normal(scale=1.2, size=(96, 3)).astype(np.float32)
    cols = rng.uniform(size=(96, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=256)

    class SceneWithProj(FakeScene):
        def getProjectCameras(self):
            return self.cams

    scene = SceneWithProj(cams, extent=3.0)
    trainer = ProjectCamTrainer(scene, state, Opt(), FakePipe(), FakeModelParams())
    for it in range(1, 21):
        stats = trainer.step(it)
    assert trainer.use_project_cam
    assert np.isfinite(stats.loss)
