"""OpenCLIP ViT-H-14 text + vision towers (conditioning encoders).

Equivalents of the reference FrozenOpenCLIPEmbedder (text, penultimate layer)
and FrozenOpenCLIPImageEmbedderV2 (vision tokens, no ln_post)
(reference: third_party/ViewCrafter/lvdm/modules/encoders/condition.py:174-236,
:295-373). Parameters use open_clip state-dict names (the "model." /
"model.visual." prefixes stripped — see strip_prefix). The kornia bicubic
224x224 antialiased resize of the reference preprocess is reproduced with
jax.image.resize (bicubic + antialias).

ViT-H-14: text width 1024 / 24 layers / 16 heads / ctx 77 / vocab 49408;
vision width 1280 / 32 layers / 16 heads / patch 14 / 224 input (257 tokens).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import Params, layer_norm, linear

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True  # layer="penultimate": skip the last resblock


@dataclass(frozen=True)
class VisionConfig:
    width: int = 1280
    heads: int = 16
    layers: int = 32
    patch_size: int = 14
    image_size: int = 224


def strip_prefix(p: Params, prefix: str) -> Params:
    n = len(prefix)
    return {k[n:]: v for k, v in p.items() if k.startswith(prefix)}


def _mha(p: Params, prefix: str, x: jnp.ndarray, heads: int, causal_mask=None):
    """torch nn.MultiheadAttention with packed in_proj. x: (B, N, C)."""
    b, n, c = x.shape
    qkv = x @ p[f"{prefix}.in_proj_weight"].T.astype(x.dtype) + p[
        f"{prefix}.in_proj_bias"
    ].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    scale = (c // heads) ** -0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    if causal_mask is not None:
        sim = sim + causal_mask
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return linear(p, f"{prefix}.out_proj", out)


def _resblock(p: Params, prefix: str, x: jnp.ndarray, heads: int, causal_mask=None):
    h = layer_norm(p, f"{prefix}.ln_1", x)
    x = x + _mha(p, f"{prefix}.attn", h, heads, causal_mask)
    h = layer_norm(p, f"{prefix}.ln_2", x)
    h = linear(p, f"{prefix}.mlp.c_fc", h)
    # open_clip uses exact GELU for these towers
    h = jax.nn.gelu(h, approximate=False)
    x = x + linear(p, f"{prefix}.mlp.c_proj", h)
    return x


def text_encode(p: Params, cfg: TextConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: (B, 77) int32 -> (B, 77, width) penultimate-layer features,
    ln_final applied (reference condition.py:213-231)."""
    x = p["token_embedding.weight"][tokens].astype(jnp.float32)
    x = x + p["positional_embedding"].astype(x.dtype)
    n = tokens.shape[1]
    causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)[None, None]
    n_layers = cfg.layers - (1 if cfg.penultimate else 0)
    for i in range(n_layers):
        x = _resblock(p, f"transformer.resblocks.{i}", x, cfg.heads, causal)
    return layer_norm(p, "ln_final", x)


def image_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """images: (B, H, W, 3) in [-1, 1] -> CLIP-normalized (B, 224, 224, 3)
    (reference condition.py:321-329 preprocess)."""
    x = jax.image.resize(
        images, (images.shape[0], 224, 224, 3), method="bicubic", antialias=True
    )
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


def image_encode(p: Params, cfg: VisionConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images: (B, H, W, 3) in [-1, 1] -> (B, 1 + grid^2, width) token
    features WITHOUT ln_post (the V2 embedder, condition.py:341-373)."""
    return image_encode_preprocessed(p, cfg, image_preprocess(images))


def image_encode_preprocessed(p: Params, cfg: VisionConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Vision tower on already CLIP-normalized (B, S, S, 3) input."""
    w = p["conv1.weight"].astype(x.dtype)  # OIHW, stride=patch, no bias
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )  # (B, grid, grid, width)
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype), (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)
    x = layer_norm(p, "ln_pre", x)
    for i in range(cfg.layers):
        x = _resblock(p, f"transformer.resblocks.{i}", x, cfg.heads)
    return x
