"""End-to-end guided training on a synthetic scene with the mock diffusion
engine: trajectory pool builds, diffusion events fire, pseudo cameras feed
the loss, PSNR improves."""

import pytest
import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.train.guided import (
    FrozenRenderer,
    GuidedTrainer,
    MockDiffusionEngine,
    build_trajectory_pool,
)

from helpers import make_camera, random_gaussians, activated
from test_train_baseline import FakeModelParams, FakeOpt, FakePipe, FakeScene, make_synthetic


@dataclasses.dataclass
class GuidedOpt(FakeOpt):
    iterations: int = 120
    start_sample_pseudo: int = 10
    end_sample_pseudo: int = 110
    sample_pseudo_interval: int = 1
    pseudo_cam_weight: float = 0.05
    pseudo_cam_ssim: bool = False
    pseudo_cam_lpips: bool = False
    pseudo_cam_weight_decay: bool = False
    guidance_vd_iter: int = 40
    guidance_vc_center_scale: float = 1.0
    no_guidance: bool = False
    densify_from_iter: int = 1000  # keep densify off for the tiny run
    densify_until_iter: int = 0


def _intrinsic(cam):
    fx = cam.image_width / (2.0 * math.tan(cam.FoVx / 2.0))
    fy = cam.image_height / (2.0 * math.tan(cam.FoVy / 2.0))
    return np.array(
        [[fx, 0, cam.image_width / 2.0], [0, fy, cam.image_height / 2.0], [0, 0, 1]]
    )


def _setup():
    cams = make_synthetic()
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=1.2, size=(96, 3)).astype(np.float32)
    cols = rng.uniform(size=(96, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=256)

    # frozen "baseline": the ground-truth gaussians themselves
    gt_parts = activated(*random_gaussians(n=80, seed=42))
    gt_state = G.create_from_pcd(np.asarray(gt_parts[0]), np.ones((80, 3)) * 0.5,
                                 capacity=128)
    frozen = FrozenRenderer(gt_state, sh_degree=0, backend="dense")

    scene = FakeScene(cams, extent=3.0)
    engine = MockDiffusionEngine(video_length=5, height=40, width=40)
    trainer = GuidedTrainer(
        scene, state, GuidedOpt(), FakePipe(), FakeModelParams(),
        frozen=frozen, engine=engine,
        pcd_points=pts, pcd_colors=cols,
        guidance_intrinsic=_intrinsic(cams[0]),
    )
    return trainer, cams


def test_trajectory_pool_builds():
    trainer, cams = _setup()
    trainer.init_trajectory_pool()
    assert set(trainer.trajectory_pool.keys()) == {0, 1, 2}
    for v, entries in trainer.trajectory_pool.items():
        assert len(entries) <= 6  # 3 + 2 + 1 max
        for e in entries:
            assert e.traj_c2ws.shape == (5, 4, 4)
            # trajectory starts at the training view
            np.testing.assert_allclose(
                e.traj_c2ws[0], trainer.train_c2ws[v], atol=1e-6
            )


@pytest.mark.slow
def test_guided_training_runs_and_improves():
    trainer, cams = _setup()
    trainer.init_trajectory_pool()
    first = trainer.evaluate(cams)
    for it in range(1, 121):
        m = trainer.step(it)
    last = trainer.evaluate(cams)

    assert trainer.events_run >= 3, trainer.events_run
    assert len(trainer.pseudo_stack) == 4  # video_length - 1
    assert np.isfinite(m.loss)
    assert last["psnr"] > first["psnr"] + 2.0, (first, last)


def test_pseudo_branch_contributes():
    trainer, cams = _setup()
    trainer.init_trajectory_pool()
    # run one event to fill the stack, then check pseudo_l1 is reported
    trainer.run_diffusion_event(1)
    assert trainer.pseudo_stack
    m = None
    for it in range(11, 16):
        m = trainer.step(it)
    assert float(trainer.last_metrics["pseudo_l1"]) > 0.0


def test_pipelined_events_lag_one_boundary():
    """pipeline_guidance submits at a boundary and materializes at the next:
    the pseudo stack appears one event late, stays in sync afterwards, and a
    drain at train()-end finalizes the last pending event."""
    trainer, cams = _setup()
    trainer.pipeline_guidance = True
    trainer.init_trajectory_pool()

    for it in range(1, 41):  # first boundary at it=1 (submit only)
        trainer.step(it)
    assert trainer.events_run == 0  # not yet materialized
    assert trainer._pending_event is not None
    assert not trainer.pseudo_stack

    trainer.step(41)  # second boundary: finalize #1, submit #2
    assert trainer.events_run == 1
    assert len(trainer.pseudo_stack) == 4  # video_length - 1
    assert trainer._pending_event is not None

    # drain path
    trainer.finalize_diffusion_event(trainer._pending_event)
    trainer._pending_event = None
    assert trainer.events_run == 2


def test_oracle_engine_renders_gt(tmp_path):
    """OracleDiffusionEngine: pseudo-GT comes from the known GT gaussians —
    generate() must reproduce FrozenRenderer output at the event trajectory,
    and a diffusion event must fill the pseudo stack with those frames."""
    from guidedvd3dgs_tpu.train.guided import OracleDiffusionEngine

    trainer, cams = _setup()
    # write the frozen GT state as a gt_gaussians.npz (make_synthetic_scene
    # format) and build the oracle engine from it
    st = trainer.frozen.state
    n = int(np.asarray(st.active).sum())
    npz = tmp_path / "gt_gaussians.npz"
    np.savez(
        npz,
        xyz=np.asarray(st.params.xyz[:n]),
        f_dc=np.asarray(st.params.features_dc[:n]),
        f_rest=np.asarray(st.params.features_rest[:n]),
        scaling=np.asarray(st.params.scaling[:n]),
        rotation=np.asarray(st.params.rotation[:n]),
        opacity=np.asarray(st.params.opacity[:n]),
    )
    engine = OracleDiffusionEngine(str(npz), video_length=5, height=40,
                                   width=40, sh_degree=0, backend="dense")
    trainer.engine = engine
    trainer.init_trajectory_pool()
    trainer.run_diffusion_event(1)

    assert len(trainer.pseudo_stack) == 4
    # the pseudo frames must equal frozen-GT renders at the stored cameras
    pc = trainer.pseudo_stack[0]
    w2c = np.eye(4)
    w2c[:3, :3] = np.asarray(pc.R).T
    w2c[:3, 3] = np.asarray(pc.T)
    rgb, _, _ = trainer.frozen.render(w2c, trainer.intrinsic, 40, 40)
    np.testing.assert_allclose(
        np.asarray(pc.pseudo_gt), np.clip(np.asarray(rgb), 0, 1), atol=2e-5
    )
    # and through the LOSS-side camera path: the pseudo step renders via
    # PseudoCamera.raster_camera() (FoV-based), which must agree with the
    # K-based oracle camera — a convention mismatch here silently turns
    # perfect pseudo supervision into harmful noise
    from guidedvd3dgs_tpu.models.render import render_state

    out = render_state(trainer.frozen.state, pc.raster_camera(),
                       jnp.zeros(3), 0, backend="dense")
    np.testing.assert_allclose(
        np.asarray(pc.pseudo_gt), np.clip(np.asarray(out.color), 0, 1), atol=2e-5
    )


def test_timing_summary_and_projection(tmp_path):
    """GuidedTrainer._write_timing_summary persists the measured phase split
    and tools/project_wallclock.project turns it into an hours-per-scene
    number at the reference workload (reference README.md: 3-4 h/scene)."""
    import types

    from guidedvd3dgs_tpu.train.guided import GuidedTrainer
    from tools.project_wallclock import project

    t = types.SimpleNamespace(
        model_params=types.SimpleNamespace(model_path=str(tmp_path)),
        events_run=2, H=40, W=40,
        engine=types.SimpleNamespace(),
        event_phase_s={"pc_render": 1.0, "frozen": 2.0, "artifacts": 0.5,
                       "generate": 10.0},
    )
    GuidedTrainer._write_timing_summary(
        t, iterations=300, start_iteration=0, total_s=100.0, chunk_s=60.0,
        event_s=20.0, n_events=2,
    )
    import json

    summary = json.load(open(tmp_path / "timing_summary.json"))
    assert summary["iterations"] == 300
    assert summary["other_s"] == 20.0
    assert summary["event_phase_s"]["generate"] == 10.0

    out = project(summary, None, events=37, ddim_steps=50, iterations=10_000)
    # train: 10000/(300/60)=2000s; events: 37*(1.75+5)=249.75s; other 20s
    assert out["unit"] == "h"
    assert abs(out["value"] - (2000 + 37 * 6.75 + 20) / 3600) < 0.01
    assert out["vs_baseline"] > 0

    # a full-size smoke number overrides the measured generate phase
    smoke = {"timings": {"guided_step_run_s": 4.0}}
    out2 = project(summary, smoke, events=37, ddim_steps=50, iterations=10_000)
    assert out2["detail"]["generate_per_event_s"] == 200.0


def test_guided_checkpoint_resume_exact(tmp_path):
    """A guided run checkpointed mid-stream and resumed in a fresh trainer
    must produce bit-identical final parameters and pseudo-stack structure
    to the uninterrupted run (the reference cannot resume guided runs at
    all — train_guidedvd.py never wires --start_checkpoint)."""
    from guidedvd3dgs_tpu.train.guided_checkpoint import (
        load_guided_checkpoint,
        save_guided_checkpoint,
    )

    ck = str(tmp_path / "chkpnt80.ckpt")

    # run A: 0 -> 120 with a checkpoint at 80
    a, _ = _setup()
    a.init_trajectory_pool()
    a.train_scan(iterations=120, log_every=0,
                 checkpoint_iterations={80}, checkpoint_dir=str(tmp_path),
                 alltime_cap=16)
    xyz_a = np.asarray(a.state.params.xyz)

    # run B: fresh trainer, resume at 80, continue to 120
    b, _ = _setup()
    it = load_guided_checkpoint(ck, b)
    assert it == 80
    # events up to iter 80 (at 1 and 41) must be in the checkpoint
    assert b.events_run == 2
    b.train_scan(iterations=120, log_every=0, start_iteration=it,
                 alltime_cap=16)

    np.testing.assert_allclose(
        np.asarray(b.state.params.xyz), xyz_a, atol=0, rtol=0
    )
    assert len(b.pseudo_stack) == len(a.pseudo_stack)
    assert len(b.pseudo_stack_alltime) == len(a.pseudo_stack_alltime)
    assert [c.pool_slot for c in b.pseudo_stack_alltime] == [
        c.pool_slot for c in a.pseudo_stack_alltime
    ]


def test_video_files_store_and_reuse(tmp_path):
    """guidance_save_videos writes the reference video_files_scale layout
    (train_guidedvd.py:562-566) and --guidance_videos_from_file reuses the
    stored video instead of calling the engine."""
    trainer, _ = _setup()
    trainer.model_params.model_path = str(tmp_path)
    trainer.opt.guidance_save_videos = True
    trainer.init_trajectory_pool()
    trainer.run_diffusion_event(1)

    import glob

    files = glob.glob(str(tmp_path / "video_files_scale*" / "*" / "*.npz"))
    assert len(files) == 1, files
    saved = np.load(files[0])["video"]
    assert saved.shape == (5, 3, trainer.H, trainer.W)

    # reuse: re-seed the shuffle with the SAME entry, break the engine, and
    # expect the stored video to be used verbatim
    key = trainer._cur_video_key
    sidx, view, cidx = key
    entry = next(e for e in trainer.trajectory_pool[view] if e.cand_idx == cidx
                 and e.scale_idx == sidx)
    trainer.trajectory_pool_shuffle[view] = [entry]
    trainer.vd_indices = [view]
    trainer.opt.guidance_videos_from_file = True
    trainer.engine.generate = None  # would raise if called
    trainer.run_diffusion_event(261)
    pg = np.asarray(trainer.pseudo_stack[0].pseudo_gt)
    np.testing.assert_allclose(pg, saved[1], atol=1e-6)


def test_guidance_with_training_gs_renders_current_state(tmp_path):
    """guidance_with_training_gs >= startiter renders guidance rgb from the
    CURRENT training gaussians (reference train_guidedvd.py:493-517); the
    mask still comes from the frozen baseline unless decide_mask."""
    trainer, _ = _setup()
    trainer.opt.guidance_with_training_gs = True
    trainer.opt.guidance_with_training_gs_startiter = 0
    trainer.init_trajectory_pool()
    trainer.run_diffusion_event(1)
    assert trainer.events_run == 1
    assert len(trainer.pseudo_stack) == 4
    assert trainer._live_renderer is not None
    # live renderer must follow the training state object
    assert trainer._live_renderer.state is trainer.state


def test_guided_checkpoint_empty_view_and_plain_fallback(tmp_path):
    """Views with empty candidate lists survive the checkpoint roundtrip
    (submit_diffusion_event indexes trajectory_pool[view] directly), and a
    plain pool-less checkpoint (per-step path) resumes by rebuilding the
    trajectory pool instead of crashing on the missing sidecar."""
    from guidedvd3dgs_tpu.train.checkpoint import save_checkpoint
    from guidedvd3dgs_tpu.train.guided_checkpoint import (
        load_guided_checkpoint,
        save_guided_checkpoint,
    )

    a, _ = _setup()
    a.init_trajectory_pool()
    a._init_pseudo_pool(8)
    a.trajectory_pool[0] = []           # view with no surviving candidates
    a.trajectory_pool_shuffle[0] = []
    ck = str(tmp_path / "c.ckpt")
    save_guided_checkpoint(ck, a, 42)

    b, _ = _setup()
    assert load_guided_checkpoint(ck, b) == 42
    assert b.trajectory_pool[0] == []
    assert set(b.trajectory_pool) == set(a.trajectory_pool)

    # plain fallback: no .guided.npz sidecar
    ck2 = str(tmp_path / "plain.ckpt")
    save_checkpoint(ck2, a.state, 17)
    c, _ = _setup()
    assert load_guided_checkpoint(ck2, c) == 17
    assert set(c.trajectory_pool) == {0, 1, 2}  # rebuilt by rendering


def test_checkpoint_video_length_mismatch_rejected(tmp_path):
    from guidedvd3dgs_tpu.train.guided_checkpoint import (
        load_guided_checkpoint,
        save_guided_checkpoint,
    )

    a, _ = _setup()
    a.init_trajectory_pool()
    a._init_pseudo_pool(8)
    ck = str(tmp_path / "c.ckpt")
    save_guided_checkpoint(ck, a, 1)

    b, _ = _setup()
    b.engine.video_length = 3  # pool slot layout depends on T
    with pytest.raises(ValueError, match="video_length"):
        load_guided_checkpoint(ck, b)


def test_topk_candidate_selection_matches_reference_rule():
    """Side-by-side fixture for the reference's selection (train_guidedvd.py:
    175-179): torch.argsort(mask_regions[filtered], descending=True)[:top_k]
    over filtered = (mask_regions < thresh).nonzero() -- i.e. the LARGEST
    unobserved areas strictly below the threshold, in descending order."""
    import numpy as np
    import torch

    from guidedvd3dgs_tpu.train.guided import select_topk_candidates

    rng = np.random.default_rng(3)
    for trial in range(20):
        areas = rng.integers(0, 1000, size=12).astype(np.float32)
        thresh = float(rng.integers(100, 900))
        top_k = int(rng.integers(1, 4))

        mask_regions = torch.from_numpy(areas)
        filtered = (mask_regions < thresh).nonzero(as_tuple=True)[0]
        sorted_idx = torch.argsort(mask_regions[filtered], descending=True)[:top_k]
        ref = filtered[sorted_idx].numpy()

        ours = select_topk_candidates(areas, thresh, top_k)
        np.testing.assert_array_equal(ours, ref)


def test_txt_preset_trajectory_mode_without_pool():
    """use_trajectory_pool=False runs diffusion events on the fixed loop2
    preset (reference train_guidedvd.py:434-452 + hardcoded traj_txt), with
    no pool built; guidance_random_traj picks among presets instead."""
    trainer, _ = _setup()
    trainer.opt.use_trajectory_pool = False
    trainer.init_view_geometry()
    assert not trainer.trajectory_pool  # never built
    trainer.run_diffusion_event(iteration=1)
    assert len(trainer.pseudo_stack) == trainer.engine.video_length - 1

    trainer.opt.guidance_random_traj = True
    trainer.opt.guidance_no_wave_traj = True
    trainer.run_diffusion_event(iteration=41)
    assert trainer.events_run == 2
