"""AutoencoderKL (first-stage VAE) — functional JAX rebuild.

Equivalent of the reference SD-style VAE
(reference: third_party/ViewCrafter/lvdm/models/autoencoder.py:13-200 and
lvdm/modules/networks/ae_modules.py:26-77 AttnBlock, :90-133 Down/Upsample
with the asymmetric (0,1,0,1) downsample padding, :151-210 ResnetBlock,
:364-464 Encoder, :466-560 Decoder). Channels-last activations, torch-named
flat parameter dicts (see nnops.py). The guidedvd config uses
ch=128, ch_mult=(1,2,4,4), 2 res blocks, no attn resolutions, z=4, double_z.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import (
    Params,
    attention,
    avg_pool_2x,
    conv2d,
    group_norm,
    silu,
    upsample_nearest_2x,
)


@dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    double_z: bool = True
    resolution: int = 256
    embed_dim: int = 4
    scale_factor: float = 0.18215


def _resnet_block(p: Params, prefix: str, x: jnp.ndarray, in_ch: int, out_ch: int):
    h = conv2d(p, f"{prefix}.conv1", silu(group_norm(p, f"{prefix}.norm1", x, eps=1e-6)))
    h = conv2d(p, f"{prefix}.conv2", silu(group_norm(p, f"{prefix}.norm2", h, eps=1e-6)))
    if in_ch != out_ch:
        x = conv2d(p, f"{prefix}.nin_shortcut", x, padding=0)
    return x + h


def _attn_block(p: Params, prefix: str, x: jnp.ndarray):
    """Single-head spatial self-attention (reference ae_modules.py:26-77)."""
    b, hh, ww, c = x.shape
    h = group_norm(p, f"{prefix}.norm", x, eps=1e-6)
    q = conv2d(p, f"{prefix}.q", h, padding=0).reshape(b, 1, hh * ww, c)
    k = conv2d(p, f"{prefix}.k", h, padding=0).reshape(b, 1, hh * ww, c)
    v = conv2d(p, f"{prefix}.v", h, padding=0).reshape(b, 1, hh * ww, c)
    # nnops.attention routes long sequences (full-size: 40*56 = 2240 tokens)
    # through the Pallas flash kernel on TPU; einsum otherwise
    out = attention(q, k, v, c ** -0.5).reshape(b, hh, ww, c)
    return x + conv2d(p, f"{prefix}.proj_out", out, padding=0)


def encoder_apply(p: Params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3) -> moments (B, H/8, W/8, 2*z)."""
    n = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)
    curr_res = cfg.resolution
    h = conv2d(p, "conv_in", x)
    for i in range(n):
        block_in = cfg.ch * in_mult[i]
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            h = _resnet_block(p, f"down.{i}.block.{j}", h, block_in, block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                h = _attn_block(p, f"down.{i}.attn.{j}", h)
        if i != n - 1:
            # asymmetric pad (left 0, right 1, top 0, bottom 1), stride-2 conv
            hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(p, f"down.{i}.downsample.conv", hp, stride=2, padding=0)
            curr_res //= 2
    ch = cfg.ch * cfg.ch_mult[-1]
    h = _resnet_block(p, "mid.block_1", h, ch, ch)
    h = _attn_block(p, "mid.attn_1", h)
    h = _resnet_block(p, "mid.block_2", h, ch, ch)
    h = conv2d(p, "conv_out", silu(group_norm(p, "norm_out", h, eps=1e-6)))
    return h


def decoder_apply(p: Params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: (B, h, w, z_channels) -> (B, 8h, 8w, 3)."""
    n = len(cfg.ch_mult)
    block_in = cfg.ch * cfg.ch_mult[-1]
    h = conv2d(p, "conv_in", z)
    h = _resnet_block(p, "mid.block_1", h, block_in, block_in)
    h = _attn_block(p, "mid.attn_1", h)
    h = _resnet_block(p, "mid.block_2", h, block_in, block_in)
    for i in reversed(range(n)):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            h = _resnet_block(p, f"up.{i}.block.{j}", h, block_in, block_out)
            block_in = block_out
        if i != 0:
            h = conv2d(p, f"up.{i}.upsample.conv", upsample_nearest_2x(h))
    h = conv2d(p, "conv_out", silu(group_norm(p, "norm_out", h, eps=1e-6)))
    return h


def _sub(p: Params, prefix: str) -> Params:
    pl = len(prefix)
    return {k[pl:]: v for k, v in p.items() if k.startswith(prefix)}


def vae_encode_moments(p: Params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) -> (B,h,w,2z) mean|logvar (reference autoencoder.py:59-63)."""
    h = encoder_apply(_sub(p, "encoder."), cfg, x)
    return conv2d(p, "quant_conv", h, padding=0)


def vae_encode(
    p: Params, cfg: VAEConfig, x: jnp.ndarray,
    rng: Optional[jax.Array] = None, sample: bool = True,
) -> jnp.ndarray:
    """Returns the scale_factor-multiplied latent (the `get_latent_z` /
    `get_first_stage_encoding` convention, reference ddpm3d.py:611-644)."""
    moments = vae_encode_moments(p, cfg, x)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if sample:
        assert rng is not None
        logvar = jnp.clip(logvar, -30.0, 20.0)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    else:
        z = mean
    return cfg.scale_factor * z


def vae_decode(p: Params, cfg: VAEConfig, z: jnp.ndarray, unscale: bool = True) -> jnp.ndarray:
    """(B,h,w,z) latent -> (B,H,W,3) pixels (reference ddpm3d.py:646-675:
    1/scale_factor then decoder; differentiable by construction in JAX)."""
    if unscale:
        z = z / cfg.scale_factor
    z = conv2d(p, "post_quant_conv", z, padding=0)
    return decoder_apply(_sub(p, "decoder."), cfg, z)
