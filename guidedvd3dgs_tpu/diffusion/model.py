"""VIPLatentDiffusion equivalent: UNet + VAE + conditioning glue.

Role of the reference `LatentDiffusion`/`VIPLatentDiffusion`
(reference: third_party/ViewCrafter/lvdm/models/ddpm3d.py:464-1028, 1250+):
hybrid conditioning (per-frame latent concat on channels + cross-attention
context, DiffusionWrapper ddpm3d.py:1420-1492), per-frame VAE encode/decode
(perframe_ae, ddpm3d.py:620-666), v-parameterization schedule.

Stateless: all parameters live in a `DiffusionParams` pytree; every method is
a pure function, jit/grad/shard-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.schedules import DiffusionSchedule, make_schedule
from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig, unet_apply
from guidedvd3dgs_tpu.diffusion.vae import VAEConfig, vae_decode, vae_encode


class DiffusionParams(NamedTuple):
    unet: dict
    vae: dict
    resampler: dict
    clip_text: dict
    clip_image: dict


@dataclass(frozen=True)
class LatentDiffusionConfig:
    unet: UNetConfig = field(default_factory=UNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012
    rescale_betas_zero_snr: bool = True
    use_dynamic_rescale: bool = True
    base_scale: float = 0.3
    uncond_type: str = "empty_seq"
    # UNet compute dtype ("bfloat16" for full-size single-chip inference —
    # the reference runs the UNet under fp16 autocast, viewcrafter.py:101;
    # sampler/schedule math stays float32 regardless)
    compute_dtype: str = "float32"

    def schedule(self) -> DiffusionSchedule:
        return make_schedule(
            timesteps=self.timesteps,
            linear_start=self.linear_start,
            linear_end=self.linear_end,
            rescale_betas_zero_snr=self.rescale_betas_zero_snr,
            use_dynamic_rescale=self.use_dynamic_rescale,
            base_scale=self.base_scale,
        )


class Conditioning(NamedTuple):
    """c_crossattn context + c_concat latents (hybrid conditioning_key)."""

    context: jnp.ndarray  # (B, 77 + T*16, 1024)
    concat: jnp.ndarray  # (B, T, h, w, 4) per-frame pcd-render latents
    fs: jnp.ndarray  # (B,) int


def apply_model(
    params: DiffusionParams,
    cfg: LatentDiffusionConfig,
    x_noisy: jnp.ndarray,  # (B, T, h, w, 4)
    t: jnp.ndarray,  # (B,)
    cond: Conditioning,
) -> jnp.ndarray:
    """Hybrid conditioning: channel-concat + cross-attn
    (reference ddpm3d.py:723-738 apply_model + :1447-1452 hybrid branch).
    Returns the v prediction."""
    cd = jnp.dtype(cfg.compute_dtype)
    xc = jnp.concatenate([x_noisy, cond.concat.astype(x_noisy.dtype)], axis=-1)
    v = unet_apply(
        params.unet, cfg.unet, xc.astype(cd), t, cond.context.astype(cd), fs=cond.fs
    )
    return v.astype(x_noisy.dtype)


def encode_video_frames(
    params: DiffusionParams,
    cfg: LatentDiffusionConfig,
    frames: jnp.ndarray,  # (T, H, W, 3) in [-1, 1]
    rng: jax.Array,
    sample: bool = True,
) -> jnp.ndarray:
    """Per-frame VAE encode (perframe_ae; reference ddpm3d.py:620-644).
    Returns (T, h, w, 4) scaled latents."""

    def enc(carry, inp):
        frame, key = inp
        z = vae_encode(params.vae, cfg.vae, frame[None], rng=key, sample=sample)[0]
        return carry, z

    keys = jax.random.split(rng, frames.shape[0])
    _, zs = jax.lax.scan(enc, None, (frames, keys))
    return zs


def decode_frame(
    params: DiffusionParams, cfg: LatentDiffusionConfig, z: jnp.ndarray
) -> jnp.ndarray:
    """Single-frame differentiable VAE decode (reference ddpm3d.py:669-675).
    z: (h, w, 4) -> (H, W, 3). Runs in cfg.compute_dtype (the reference
    decodes under CUDA fp16 autocast) and returns at the input dtype: the
    f32 decode measured 17.2 ms/frame on v5e — 2x the bf16 MXU rate — and
    the guidance path pays it 25x per guided DDIM step."""
    cd = jnp.dtype(cfg.compute_dtype)
    return vae_decode(params.vae, cfg.vae, z[None].astype(cd))[0].astype(z.dtype)


def decode_video_frames(
    params: DiffusionParams, cfg: LatentDiffusionConfig, zs: jnp.ndarray
) -> jnp.ndarray:
    """Per-frame decode of (T, h, w, 4) -> (T, H, W, 3) (perframe_ae)."""

    def dec(carry, z):
        return carry, decode_frame(params, cfg, z)

    _, frames = jax.lax.scan(dec, None, zs)
    return frames
