"""Perceiver-style image-token Resampler (image_proj_model).

Equivalent of the reference Resampler
(reference: third_party/ViewCrafter/lvdm/modules/encoders/resampler.py:47-144):
learned queries cross-attend to projected CLIP image tokens; guidedvd config:
dim 1024, depth 4, 12 heads x 64, 16 queries/frame, embedding 1280 -> 1024.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import Params, gelu, layer_norm, linear


@dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: int = 16


def _perceiver_attention(p: Params, prefix: str, x, latents, heads: int, dim_head: int):
    """reference resampler.py:48-95."""
    x = layer_norm(p, f"{prefix}.norm1", x)
    latents = layer_norm(p, f"{prefix}.norm2", latents)
    b, l, _ = latents.shape

    q = linear(p, f"{prefix}.to_q", latents)
    kv = linear(p, f"{prefix}.to_kv", jnp.concatenate([x, latents], axis=-2))
    k, v = jnp.split(kv, 2, axis=-1)

    def heads_split(t):
        return t.reshape(t.shape[0], t.shape[1], heads, -1).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    scale = 1.0 / (dim_head ** 0.25)
    w = jnp.einsum("bhid,bhjd->bhij", q * scale, k * scale)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", w, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, -1)
    return linear(p, f"{prefix}.to_out", out)


def _ff(p: Params, prefix: str, x):
    h = linear(p, f"{prefix}.1", layer_norm(p, f"{prefix}.0", x))
    return linear(p, f"{prefix}.3", gelu(h))


def resampler_apply(p: Params, cfg: ResamplerConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N_img_tokens, embedding_dim) -> (B, T*num_queries, output_dim)."""
    latents = jnp.broadcast_to(
        p["latents"], (x.shape[0],) + p["latents"].shape[1:]
    ).astype(x.dtype)
    x = linear(p, "proj_in", x)
    for d in range(cfg.depth):
        latents = _perceiver_attention(
            p, f"layers.{d}.0", x, latents, cfg.heads, cfg.dim_head
        ) + latents
        latents = _ff(p, f"layers.{d}.1", latents) + latents
    latents = linear(p, "proj_out", latents)
    return layer_norm(p, "norm_out", latents)
