"""ViewCrafterEngine end-to-end at a tiny config: the real engine class
(conditioning via the vocab-free prompt cache, guided DDIM through the toy
UNet/VAE/CLIP/resampler, train-res != engine-res resize both ways, pred_x0
debug artifacts) driven through a full GuidedTrainer diffusion event.

Covers the reference run_video_diffusion call stack
(utils/viewcrafter_wrapper.py:550-573 + diffusion_utils.py:118-223) at toy
scale with random weights — the full-size single-chip memory smoke lives in
tools/diffusion_fullsize_smoke.py.
"""


import os

import numpy as np
import pytest

import jax

from guidedvd3dgs_tpu.diffusion import clip as clip_mod
from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
from guidedvd3dgs_tpu.diffusion.model import LatentDiffusionConfig
from guidedvd3dgs_tpu.diffusion.resampler import ResamplerConfig
from guidedvd3dgs_tpu.diffusion.synthesis import SynthesisConfig
from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig
from guidedvd3dgs_tpu.diffusion.vae import VAEConfig
from guidedvd3dgs_tpu.train.guided import ViewCrafterEngine

from test_train_guided import _setup

pytestmark = pytest.mark.slow

CTX = 32  # text width == unet context == resampler dim/output_dim
EMB = 48  # vision width == resampler embedding_dim
T = 5


def _tiny_engine():
    mcfg = LatentDiffusionConfig(
        unet=UNetConfig(
            model_channels=32, num_res_blocks=1, attention_resolutions=(1,),
            channel_mult=(1,), num_head_channels=8, context_dim=CTX,
            temporal_length=T,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), resolution=32, z_channels=4),
    )
    scfg = SynthesisConfig(
        ddim_steps=2,
        text_config=clip_mod.TextConfig(width=CTX, heads=4, layers=2),
        vision_config=clip_mod.VisionConfig(width=EMB, heads=4, layers=2,
                                            patch_size=32, image_size=224),
        resampler_config=ResamplerConfig(
            dim=CTX, depth=1, dim_head=8, heads=4, num_queries=4,
            embedding_dim=EMB, output_dim=CTX, video_length=T,
        ),
    )
    params = init_diffusion_params(mcfg, scfg, jax.random.key(0))
    return ViewCrafterEngine(params, mcfg, scfg, video_length=T,
                             height=32, width=32)


def test_engine_event_end_to_end(tmp_path):
    trainer, _ = _setup()  # train res 40x40 != engine 32x32: resize both ways
    engine = _tiny_engine()
    trainer.engine = engine
    trainer.opt.save_pred_x0 = True
    trainer.model_params.model_path = str(tmp_path)

    trainer.init_trajectory_pool()
    trainer.run_diffusion_event(1)

    # pseudo stack rebuilt at TRAIN resolution from the engine-res video
    assert len(trainer.pseudo_stack) == T - 1
    pc = trainer.pseudo_stack[0]
    assert pc.pseudo_gt.shape == (3, trainer.H, trainer.W)
    assert np.isfinite(pc.pseudo_gt).all()
    assert pc.pseudo_gt.min() >= 0.0 and pc.pseudo_gt.max() <= 1.0

    ev = os.path.join(str(tmp_path), "diffusion_events", "train_iter1")
    assert os.path.exists(os.path.join(ev, "render0.mp4"))
    assert os.path.exists(os.path.join(ev, "diffusion0.mp4"))
    # one pred_x0 video per DDIM step
    steps = [f for f in os.listdir(ev) if f.startswith("pred_x0_step")]
    assert sorted(steps) == ["pred_x0_step000.mp4", "pred_x0_step001.mp4"]


def test_offload_matches_resident_residency():
    """The phase-split offload path (conditioning jit -> free encoder
    weights -> sampling jit with slim params) must reproduce the one-jit
    resident path: same rng discipline (split_synthesis_rng), same math,
    only the executable boundaries differ."""
    mcfg_scfg_params = _tiny_engine()
    # build two engines over the SAME weights
    eng_off = mcfg_scfg_params
    assert eng_off.encoder_residency == "offload"
    import jax.numpy as jnp

    # _enc_host deliberately carries neither the UNet nor the text tower
    # (clip_text is dropped — the text pair is precomputed once), so the
    # resident twin rebuilds the FULL param set with _tiny_engine's seed
    params_full = jax.tree.map(
        jnp.asarray,
        init_diffusion_params(eng_off.mcfg, eng_off.scfg, jax.random.key(0)),
    )
    eng_res = ViewCrafterEngine(
        params_full, eng_off.mcfg, eng_off.scfg, video_length=T,
        height=32, width=32, encoder_residency="resident",
    )

    rng = np.random.default_rng(7)
    pc = jnp.asarray(rng.uniform(size=(T, 32, 32, 3)).astype(np.float32))
    gi = jnp.asarray(rng.uniform(size=(T, 3, 32, 32)).astype(np.float32))
    gm = jnp.ones((T, 1, 32, 32), jnp.float32)
    gd = jnp.ones((T, 1, 32, 32), jnp.float32)

    out_off = np.asarray(eng_off.generate(pc, gi, gm, gd, jax.random.key(3)))
    out_res = np.asarray(eng_res.generate(pc, gi, gm, gd, jax.random.key(3)))
    np.testing.assert_allclose(out_off, out_res, atol=2e-5, rtol=2e-5)

    # and the no-guidance (plain DDIM) path through offload still runs
    out_ng = np.asarray(
        eng_off.generate(pc, gi, gm, gd, jax.random.key(3), no_guidance=True)
    )
    assert np.isfinite(out_ng).all()


def test_offload_engine_does_not_delete_caller_buffers():
    """Regression (r5 review): _compute_text_pair must only delete device
    buffers ITS transfer created — jnp.asarray aliases leaves that are
    already device arrays, and deleting an aliased buffer invalidates the
    caller's params. Build an engine from device-resident params, then
    prove the caller's tree is still fully usable."""
    from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
    import jax.numpy as jnp

    mcfg, scfg, params = None, None, None
    eng = _tiny_engine()  # builds its own params; grab configs from it
    mcfg, scfg = eng.mcfg, eng.scfg
    params = init_diffusion_params(mcfg, scfg, jax.random.key(3))
    dev_params = jax.tree.map(jnp.asarray, params)  # device-resident leaves
    ViewCrafterEngine(dev_params, mcfg, scfg, video_length=T,
                      height=32, width=32, encoder_residency="offload")
    # every caller leaf must still be alive and readable
    for leaf in jax.tree.leaves(dev_params):
        np.asarray(leaf)  # raises RuntimeError if the buffer was deleted
