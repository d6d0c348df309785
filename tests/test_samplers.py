"""DDIM sampler tests: tiny end-to-end runs + guidance-gradient semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion import schedules as S
from guidedvd3dgs_tpu.diffusion.model import (
    Conditioning,
    DiffusionParams,
    LatentDiffusionConfig,
    apply_model,
    decode_video_frames,
    encode_video_frames,
)
from guidedvd3dgs_tpu.diffusion.samplers.ddim import ddim_sample
from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import (
    GuidedSampleConfig,
    guided_ddim_sample,
)
from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig, build_layout
from guidedvd3dgs_tpu.diffusion.vae import VAEConfig


def _tiny_cfg():
    return LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(1,), channel_mult=(1,), num_head_channels=8,
            context_dim=16, temporal_length=2,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(),
                      resolution=32, z_channels=4),
    )


def _init_params(rng, cfg: LatentDiffusionConfig):
    """Random torch-layout params for the tiny UNet + VAE, built by walking
    the same layout the apply functions consume."""
    import torch

    import sys
    sys.path.insert(0, "/root/reference/third_party/ViewCrafter")
    from lvdm.modules.networks.openaimodel3d import UNetModel
    from lvdm.modules.networks.ae_modules import Decoder, Encoder

    torch.manual_seed(0)
    u = cfg.unet
    m = UNetModel(
        in_channels=u.in_channels, out_channels=u.out_channels,
        model_channels=u.model_channels, num_res_blocks=u.num_res_blocks,
        attention_resolutions=list(u.attention_resolutions),
        channel_mult=list(u.channel_mult), num_head_channels=u.num_head_channels,
        transformer_depth=1, context_dim=u.context_dim, use_linear=True,
        use_checkpoint=False, temporal_conv=u.temporal_conv,
        temporal_attention=u.temporal_attention, temporal_selfatt_only=True,
        use_relative_position=False, use_causal_attention=False,
        temporal_length=u.temporal_length, addition_attention=u.addition_attention,
        image_cross_attention=u.image_cross_attention, fs_condition=u.fs_condition,
    )
    v = cfg.vae
    dd = dict(double_z=True, z_channels=v.z_channels, resolution=v.resolution,
              in_channels=3, out_ch=3, ch=v.ch, ch_mult=list(v.ch_mult),
              num_res_blocks=v.num_res_blocks, attn_resolutions=[], dropout=0.0)
    enc, dec = Encoder(**dd), Decoder(**dd)
    quant = torch.nn.Conv2d(2 * v.z_channels, 2 * v.z_channels, 1)
    post = torch.nn.Conv2d(v.z_channels, v.z_channels, 1)

    from guidedvd3dgs_tpu.diffusion.convert import from_torch_module

    vae_p = {}
    for pre, mod in [("encoder.", enc), ("decoder.", dec),
                     ("quant_conv.", quant), ("post_quant_conv.", post)]:
        for k, w in from_torch_module(mod).items():
            vae_p[pre + k] = w
    unet_p = from_torch_module(m)
    # the reference zero-inits the final conv and every transformer proj_out
    # (zero_module); a random-init model then outputs exactly 0 (0/0 in
    # rescale_noise_cfg) and ignores conditioning entirely — randomize them
    # so the tiny sampler behaves like a trained model
    key = jax.random.key(42)
    for k in list(unet_p):
        if k == "out.2.weight" or k.endswith("proj_out.weight"):
            key, sub = jax.random.split(key)
            unet_p[k] = 0.02 * jax.random.normal(sub, unet_p[k].shape)
    return DiffusionParams(
        unet=unet_p, vae=vae_p, resampler={}, clip_text={}, clip_image={}
    )


@pytest.fixture(scope="module")
def tiny():
    cfg = _tiny_cfg()
    params = _init_params(jax.random.key(0), cfg)
    return cfg, params


def _cond(rng, b, t, ctx_dim, h, w):
    k1, k2 = jax.random.split(rng)
    return Conditioning(
        context=jax.random.normal(k1, (b, 7, ctx_dim)),
        concat=jax.random.normal(k2, (b, t, h, w, 4)) * 0.1,
        fs=jnp.full((b,), 10, jnp.int32),
    )


@pytest.mark.slow
def test_plain_ddim_runs_and_is_finite(tiny):
    cfg, params = tiny
    sched = cfg.schedule()
    pr = S.make_ddim_params(sched, 4, eta=1.0, method="uniform_trailing")
    b, t, h, w = 1, 2, 8, 8
    cond = _cond(jax.random.key(1), b, t, 16, h, w)
    uncond = cond._replace(context=jnp.zeros_like(cond.context))

    def ap_c(x, ts):
        return apply_model(params, cfg, x, ts, cond)

    def ap_u(x, ts):
        return apply_model(params, cfg, x, ts, uncond)

    x_T = jax.random.normal(jax.random.key(2), (b, t, h, w, 4))
    x0 = jax.jit(lambda xt, key: ddim_sample(sched, pr, ap_c, ap_u, xt, key))(
        x_T, jax.random.key(3)
    )
    assert x0.shape == x_T.shape
    assert bool(jnp.isfinite(x0).all())


@pytest.mark.slow
def test_guided_ddim_moves_toward_guidance(tiny):
    """The guidance gradient must pull decoded frames toward the target:
    guided samples must have strictly lower guidance loss than unguided."""
    cfg, params = tiny
    sched = cfg.schedule()
    pr = S.make_ddim_params(sched, 3, eta=1.0, method="uniform_trailing")
    b, t, h, w = 1, 2, 8, 8
    cond = _cond(jax.random.key(1), b, t, 16, h, w)
    uncond = cond._replace(context=jnp.zeros_like(cond.context))
    # tiny VAE has ch_mult=(1,): no downsampling, pixels == latent res
    target = jnp.zeros((t, h, w, 3)) + 0.25

    def guidance_fn(frame, ddim_index, frame_idx):
        diff = (frame - target[frame_idx]) ** 2
        return 0.5 * diff.sum(), jnp.float32(diff.size)

    x_T = jax.random.normal(jax.random.key(2), (b, t, h, w, 4))

    def ap_c(x, ts):
        return apply_model(params, cfg, x, ts, cond)

    def ap_u(x, ts):
        return apply_model(params, cfg, x, ts, uncond)

    x0_plain = ddim_sample(sched, pr, ap_c, ap_u, x_T, jax.random.key(3))
    x0_guided = guided_ddim_sample(
        params, cfg, sched, pr, cond, uncond, x_T, jax.random.key(3),
        guidance_fn, GuidedSampleConfig(rho_scale=2.0),
    )
    assert bool(jnp.isfinite(x0_guided).all())

    def total_loss(x0):
        frames = decode_video_frames(params, cfg, x0[0])
        return jnp.mean((frames - target) ** 2)

    lg, lp = float(total_loss(x0_guided)), float(total_loss(x0_plain))
    assert lg < lp, f"guided loss {lg} !< plain loss {lp}"


def test_vae_roundtrip_shapes(tiny):
    cfg, params = tiny
    frames = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3)) * 2 - 1
    z = encode_video_frames(params, cfg, frames, jax.random.key(1))
    assert z.shape == (2, 8, 8, 4)
    d = decode_video_frames(params, cfg, z)
    assert d.shape == (2, 8, 8, 3)
    assert bool(jnp.isfinite(d).all())


def test_multicond_reduces_to_plain_cfg_when_uncond_img_is_uncond():
    """With apply_uncond_img == apply_uncond and cfg_img == cfg_text the
    two-scale combine u + s_i*(ui-u) + s_t*(c-ui) collapses to plain CFG
    u + s*(c-u) (reference ddim_multiplecond.py:233-235), so the multicond
    sampler must match ddim_sample bit-for-bit on the same rng."""
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_multicond import (
        ddim_sample_multicond,
    )

    sched = S.make_schedule()
    pr = S.make_ddim_params(sched, 6, eta=1.0, method="uniform_trailing")
    shape = (1, 2, 8, 8, 4)
    w_c = jax.random.normal(jax.random.key(10), shape) * 0.05
    w_u = jax.random.normal(jax.random.key(11), shape) * 0.05

    def ap_c(x, ts):
        return 0.1 * x + w_c

    def ap_u(x, ts):
        return 0.1 * x + w_u

    x_T = jax.random.normal(jax.random.key(12), shape)
    key = jax.random.key(13)
    ref = ddim_sample(sched, pr, ap_c, ap_u, x_T, key, cfg_scale=7.5,
                      guidance_rescale=0.7)
    got = ddim_sample_multicond(sched, pr, ap_c, ap_u, ap_u, x_T, key,
                                cfg_text=7.5, cfg_img=7.5,
                                guidance_rescale=0.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)

    # A distinct image-uncond branch must change the output and stay finite.
    def ap_ui(x, ts):
        return 0.1 * x + 0.5 * (w_c + w_u)

    got2 = ddim_sample_multicond(sched, pr, ap_c, ap_u, ap_ui, x_T, key,
                                 cfg_text=7.5, cfg_img=1.2,
                                 guidance_rescale=0.7)
    assert bool(jnp.isfinite(got2).all())
    assert not np.allclose(np.asarray(got2), np.asarray(ref))


@pytest.mark.slow
def test_guided_ddim_pred_x0_trace(tiny):
    """return_trace stacks per-step pred_x0 as a scan output: shape
    (S, T, h, w, 4), finite, last step's trace entry equals the returned x0
    (x_prev at the final step IS pred_x0 when alpha_prev=final; we only
    assert shape/finiteness + that the final x0 is reproducible)."""
    cfg, params = tiny
    sched = cfg.schedule()
    pr = S.make_ddim_params(sched, 3, eta=1.0, method="uniform_trailing")
    b, t, h, w = 1, 2, 8, 8
    cond = _cond(jax.random.key(1), b, t, 16, h, w)
    uncond = cond._replace(context=jnp.zeros_like(cond.context))
    target = jnp.zeros((t, h, w, 3)) + 0.25

    def guidance_fn(frame, ddim_index, frame_idx):
        diff = (frame - target[frame_idx]) ** 2
        return 0.5 * diff.sum(), jnp.float32(diff.size)

    x_T = jax.random.normal(jax.random.key(2), (b, t, h, w, 4))
    x0, trace = guided_ddim_sample(
        params, cfg, sched, pr, cond, uncond, x_T, jax.random.key(3),
        guidance_fn, GuidedSampleConfig(rho_scale=2.0), return_trace=True,
    )
    assert trace.shape == (3, t, h, w, 4)
    assert bool(jnp.isfinite(trace).all())
    # trace must not change the sampled result
    x0_ref = guided_ddim_sample(
        params, cfg, sched, pr, cond, uncond, x_T, jax.random.key(3),
        guidance_fn, GuidedSampleConfig(rho_scale=2.0),
    )
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), atol=1e-6)


@pytest.mark.slow
def test_guided_step_pair_modes_equivalent(tiny):
    """serial / serial_ckpt / batched CFG-pair modes and decode chunking are
    pure perf/memory trades — identical numerics on the same inputs."""
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import _guided_step

    cfg, params = tiny
    sched = cfg.schedule()
    pr = S.make_ddim_params(sched, 3, eta=1.0, method="uniform_trailing")
    b, t, h, w = 1, 2, 8, 8
    cond = _cond(jax.random.key(1), b, t, 16, h, w)
    uncond = cond._replace(context=jnp.zeros_like(cond.context))
    target = jnp.zeros((t, h, w, 3)) + 0.25

    def guidance_fn(frame, ddim_index, frame_idx):
        diff = (frame - target[frame_idx]) ** 2
        return 0.5 * diff.sum(), jnp.float32(diff.size)

    x = jax.random.normal(jax.random.key(2), (b, t, h, w, 4))

    def run(pair_mode, decode_chunk):
        scfg = GuidedSampleConfig(
            rho_scale=2.0, pair_mode=pair_mode, decode_chunk=decode_chunk
        )
        x_prev, px0, _ = _guided_step(
            params, cfg, sched, pr, cond, uncond, scfg, guidance_fn,
            jnp.float32(1.0), x, jnp.int32(2), jax.random.key(3),
        )
        return np.asarray(x_prev), np.asarray(px0)

    ref_x, ref_p = run("serial_ckpt", 1)
    for mode, ck in [("serial", 1), ("batched", 1), ("batched_ckpt", 1),
                     ("serial_ckpt_half", 1), ("serial_ckpt", 2)]:
        got_x, got_p = run(mode, ck)
        np.testing.assert_allclose(got_x, ref_x, rtol=0, atol=1e-5,
                                   err_msg=f"{mode}/ck={ck}")
        np.testing.assert_allclose(got_p, ref_p, rtol=0, atol=1e-5)


def test_per_frame_guidance_grads_chunk_pad():
    """Chunked decode grads must match the per-frame loop exactly, including
    when the chunk does not divide the trajectory length (pad path)."""
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import (
        _per_frame_guidance_grads,
    )

    zs = jax.random.normal(jax.random.key(0), (5, 4, 4, 2))
    scale = jnp.arange(1.0, 6.0)

    def floss(z_f, frame_idx):
        return (scale[frame_idx] * z_f ** 2).sum(), jnp.float32(7.0)

    ref = _per_frame_guidance_grads(floss, zs, GuidedSampleConfig(decode_chunk=1))
    for ck in (2, 3, 5, 99):
        got = _per_frame_guidance_grads(
            floss, zs, GuidedSampleConfig(decode_chunk=ck)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6,
                                   err_msg=f"ck={ck}")
