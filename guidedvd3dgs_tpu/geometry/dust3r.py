"""DUSt3R two-view pointmap network — functional JAX rebuild (L4c).

Equivalent of the reference AsymmetricCroCo3DStereo
(reference: third_party/ViewCrafter/extern/dust3r/dust3r/model.py:20-170,
croco/models/blocks.py:44-230 Attention/CrossAttention/Block/DecoderBlock/
PatchEmbed, croco/models/pos_embed.py:112-159 RoPE2D,
croco/models/dpt_block.py + dust3r/heads/* DPT pointmap head,
dust3r/heads/postprocess.py:10-58 exp depth/conf activations).

Config of the shipped DUSt3R_ViTLarge_BaseDecoder_512_dpt checkpoint:
ViT-L encoder (1024 x 24 x 16h), base decoder (768 x 12 x 12h) with
cross-attention between the two views and RoPE2D (freq 100) positions,
DPT head with hooks [0, 6, 9, 12], depth_mode=('exp',-inf,inf),
conf_mode=('exp', 1, inf). Parameters are flat torch-named dicts; conversion
is layout-preserving (see diffusion/nnops.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import Params, gelu, layer_norm, linear
from jax import lax


@dataclass(frozen=True)
class Dust3rConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_freq: float = 100.0
    feature_dim: int = 256  # DPT
    last_dim: int = 128
    has_conf: bool = True

    @property
    def hooks(self) -> Tuple[int, int, int, int]:
        l2 = self.dec_depth
        return (0, l2 * 2 // 4, l2 * 3 // 4, l2)


# --- RoPE2D (reference pos_embed.py:112-159) ---------------------------------


def _rope_cos_sin(d_half: int, positions: jnp.ndarray, freq: float):
    inv_freq = 1.0 / (freq ** (jnp.arange(0, d_half, 2, dtype=jnp.float32) / d_half))
    t = positions.astype(jnp.float32)  # (B, N)
    fr = t[..., None] * inv_freq  # (B, N, d/2/2... d_half/2)
    fr = jnp.concatenate([fr, fr], axis=-1)  # (B, N, d_half)
    return jnp.cos(fr), jnp.sin(fr)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope2d(tokens: jnp.ndarray, positions: jnp.ndarray, freq: float) -> jnp.ndarray:
    """tokens: (B, H, N, D), positions: (B, N, 2) (y, x)."""
    d = tokens.shape[-1] // 2
    y, x = jnp.split(tokens, 2, axis=-1)

    def one(tok, pos1d):
        cos, sin = _rope_cos_sin(d, pos1d, freq)  # (B, N, d)
        cos = cos[:, None]
        sin = sin[:, None]
        return tok * cos + _rotate_half(tok) * sin

    return jnp.concatenate([one(y, positions[:, :, 0]), one(x, positions[:, :, 1])], -1)


# --- transformer blocks (reference blocks.py) --------------------------------


def _heads(t, n):
    b, s, c = t.shape
    return t.reshape(b, s, n, c // n).transpose(0, 2, 1, 3)


def _unheads(t):
    b, h, s, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _attn(q, k, v, scale):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    a = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", a, v)


def self_attention(p: Params, pre: str, x, xpos, heads: int, freq: float):
    """reference blocks.py:81-112 (fused qkv + RoPE on q/k)."""
    b, n, c = x.shape
    qkv = linear(p, f"{pre}.qkv", x).reshape(b, n, 3, heads, c // heads)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, D)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = rope2d(q, xpos, freq)
    k = rope2d(k, xpos, freq)
    out = _unheads(_attn(q, k, v, (c // heads) ** -0.5))
    return linear(p, f"{pre}.proj", out)


def cross_attention(p: Params, pre: str, x, y, xpos, ypos, heads: int, freq: float):
    """reference blocks.py:132-169."""
    c = x.shape[-1]
    q = _heads(linear(p, f"{pre}.projq", x), heads)
    k = _heads(linear(p, f"{pre}.projk", y), heads)
    v = _heads(linear(p, f"{pre}.projv", y), heads)
    q = rope2d(q, xpos, freq)
    k = rope2d(k, ypos, freq)
    out = _unheads(_attn(q, k, v, (c // heads) ** -0.5))
    return linear(p, f"{pre}.proj", out)


def _mlp(p: Params, pre: str, x):
    return linear(p, f"{pre}.fc2", gelu(linear(p, f"{pre}.fc1", x)))


def encoder_block(p: Params, pre: str, x, xpos, heads: int, freq: float):
    x = x + self_attention(p, f"{pre}.attn", layer_norm(p, f"{pre}.norm1", x, eps=1e-6),
                           xpos, heads, freq)
    x = x + _mlp(p, f"{pre}.mlp", layer_norm(p, f"{pre}.norm2", x, eps=1e-6))
    return x


def decoder_block(p: Params, pre: str, x, y, xpos, ypos, heads: int, freq: float):
    """reference blocks.py:171-191."""
    x = x + self_attention(p, f"{pre}.attn", layer_norm(p, f"{pre}.norm1", x, eps=1e-6),
                           xpos, heads, freq)
    y_ = layer_norm(p, f"{pre}.norm_y", y, eps=1e-6)
    x = x + cross_attention(p, f"{pre}.cross_attn",
                            layer_norm(p, f"{pre}.norm2", x, eps=1e-6), y_,
                            xpos, ypos, heads, freq)
    x = x + _mlp(p, f"{pre}.mlp", layer_norm(p, f"{pre}.norm3", x, eps=1e-6))
    return x


# --- patch embed + encoder/decoder -------------------------------------------


def patch_embed(p: Params, cfg: Dust3rConfig, img: jnp.ndarray):
    """img: (B, H, W, 3) -> tokens (B, N, C), positions (B, N, 2).
    (reference blocks.py:209-230 PatchEmbed + PositionGetter)."""
    w = p["patch_embed.proj.weight"].astype(img.dtype)  # (C, 3, P, P)
    ps = cfg.patch_size
    x = lax.conv_general_dilated(
        img, w, (ps, ps), "VALID", dimension_numbers=("NHWC", "OIHW", "NHWC")
    ) + p["patch_embed.proj.bias"].astype(img.dtype)
    b, nh, nw, c = x.shape
    tokens = x.reshape(b, nh * nw, c)
    yy, xx = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw), indexing="ij")
    pos = jnp.stack([yy, xx], -1).reshape(1, nh * nw, 2)
    return tokens, jnp.broadcast_to(pos, (b, nh * nw, 2)), (nh, nw)


def encode_image(p: Params, cfg: Dust3rConfig, img: jnp.ndarray):
    """reference model.py:83-95."""
    x, pos, grid = patch_embed(p, cfg, img)
    for i in range(cfg.enc_depth):
        x = encoder_block(p, f"enc_blocks.{i}", x, pos, cfg.enc_num_heads, cfg.rope_freq)
    x = layer_norm(p, "enc_norm", x, eps=1e-6)
    return x, pos, grid


def decode_pair(p: Params, cfg: Dust3rConfig, f1, pos1, f2, pos2):
    """Cross-attending twin decoders; returns per-layer token lists for the
    DPT hooks (reference model.py:127-146)."""
    outs1, outs2 = [f1], [f2]
    f1 = linear(p, "decoder_embed", f1)
    f2 = linear(p, "decoder_embed", f2)
    for i in range(cfg.dec_depth):
        n1 = decoder_block(p, f"dec_blocks.{i}", f1, f2, pos1, pos2,
                           cfg.dec_num_heads, cfg.rope_freq)
        n2 = decoder_block(p, f"dec_blocks2.{i}", f2, f1, pos2, pos1,
                           cfg.dec_num_heads, cfg.rope_freq)
        f1, f2 = n1, n2
        outs1.append(f1)
        outs2.append(f2)
    outs1[-1] = layer_norm(p, "dec_norm", outs1[-1], eps=1e-6)
    outs2[-1] = layer_norm(p, "dec_norm", outs2[-1], eps=1e-6)
    return outs1, outs2


# --- DPT head (reference croco/models/dpt_block.py + dust3r/heads) ------------


def _conv(p, name, x, stride=1, padding=0):
    w = p[f"{name}.weight"].astype(x.dtype)
    pad = [(padding, padding)] * 2
    y = lax.conv_general_dilated(x, w, (stride, stride), pad,
                                 dimension_numbers=("NHWC", "OIHW", "NHWC"))
    b = p.get(f"{name}.bias")
    return y if b is None else y + b.astype(x.dtype)


def _conv_transpose(p, name, x, stride):
    """torch ConvTranspose2d, padding=0 (weight (in, out, kh, kw)):
    input dilation by `stride`, (k-1) padding, spatially-flipped kernel with
    in/out channels swapped."""
    w = p[f"{name}.weight"].astype(x.dtype)  # (in, out, kh, kw)
    kh, kw = w.shape[2], w.shape[3]
    w2 = jnp.flip(w, (-2, -1)).transpose(1, 0, 2, 3)  # (out, in, kh, kw)
    y = lax.conv_general_dilated(
        x, w2, window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    b = p.get(f"{name}.bias")
    return y if b is None else y + b.astype(x.dtype)


def _resize2x(x, align_corners=True):
    b, h, w, c = x.shape
    if align_corners:
        # torch align_corners=True bilinear
        return _interp_align_corners(x, 2 * h, 2 * w)
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


def _interp_align_corners(x, oh, ow):
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).reshape(1, oh, 1, 1)
    wx = (xs - x0).reshape(1, 1, ow, 1)
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _residual_conv_unit(p, pre, x):
    """reference dpt_block.py:79-140 (no BN at inference config)."""
    out = jax.nn.relu(x)
    out = _conv(p, f"{pre}.conv1", out, padding=1)
    out = jax.nn.relu(out)
    out = _conv(p, f"{pre}.conv2", out, padding=1)
    return out + x


def _fusion_block(p, pre, x, skip=None):
    """reference dpt_block.py:144-218 FeatureFusionBlock_custom."""
    out = x
    if skip is not None:
        out = out + _residual_conv_unit(p, f"{pre}.resConfUnit1", skip)
    out = _residual_conv_unit(p, f"{pre}.resConfUnit2", out)
    out = _resize2x(out, align_corners=True)
    return _conv(p, f"{pre}.out_conv", out)


def dpt_head(p: Params, cfg: Dust3rConfig, tokens: List[jnp.ndarray],
             grid: Tuple[int, int], prefix: str) -> jnp.ndarray:
    """tokens: hooked layers' (B, N, C); returns (B, H, W, 3+conf)
    (reference dpt_block.py:417-449 + dpt_head.py:38-65)."""
    nh, nw = grid
    dpt = f"{prefix}.dpt"
    layers = []
    for idx, hook in enumerate(cfg.hooks):
        t = tokens[hook]
        b, n, c = t.shape
        fm = t.reshape(b, nh, nw, c)
        pre = f"{dpt}.act_postprocess.{idx}"
        if idx == 0:
            fm = _conv(p, f"{pre}.0", fm)
            fm = _conv_transpose(p, f"{pre}.1", fm, stride=4)
        elif idx == 1:
            fm = _conv(p, f"{pre}.0", fm)
            fm = _conv_transpose(p, f"{pre}.1", fm, stride=2)
        elif idx == 2:
            fm = _conv(p, f"{pre}.0", fm)
        else:
            fm = _conv(p, f"{pre}.0", fm)
            fm = _conv(p, f"{pre}.1", fm, stride=2, padding=1)
        fm = _conv(p, f"{dpt}.scratch.layer{idx + 1}_rn", fm, padding=1)
        layers.append(fm)

    path4 = _fusion_block(p, f"{dpt}.scratch.refinenet4", layers[3])
    path4 = path4[:, : layers[2].shape[1], : layers[2].shape[2]]
    path3 = _fusion_block(p, f"{dpt}.scratch.refinenet3", path4, layers[2])
    path2 = _fusion_block(p, f"{dpt}.scratch.refinenet2", path3, layers[1])
    path1 = _fusion_block(p, f"{dpt}.scratch.refinenet1", path2, layers[0])

    h = _conv(p, f"{dpt}.head.0", path1, padding=1)
    h = _resize2x(h, align_corners=True)
    h = _conv(p, f"{dpt}.head.2", h, padding=1)
    h = jax.nn.relu(h)
    return _conv(p, f"{dpt}.head.4", h)


def postprocess(out: jnp.ndarray, has_conf: bool = True):
    """exp depth/conf activations (reference postprocess.py:10-58 with the
    shipped modes depth ('exp', -inf, inf) and conf ('exp', 1, inf))."""
    xyz = out[..., 0:3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts3d = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    res = {"pts3d": pts3d}
    if has_conf:
        res["conf"] = 1.0 + jnp.exp(out[..., 3])
    return res


def dust3r_apply(p: Params, cfg: Dust3rConfig, img1: jnp.ndarray, img2: jnp.ndarray):
    """Full two-view forward: (B, H, W, 3) normalized images ->
    dict(pts3d, conf) per view; view1's pointmap is in view1's frame, view2's
    in view1's frame too (reference model.py:160-170)."""
    f1, pos1, grid = encode_image(p, cfg, img1)
    f2, pos2, _ = encode_image(p, cfg, img2)
    outs1, outs2 = decode_pair(p, cfg, f1, pos1, f2, pos2)
    o1 = dpt_head(p, cfg, outs1, grid, "downstream_head1")
    o2 = dpt_head(p, cfg, outs2, grid, "downstream_head2")
    return postprocess(o1, cfg.has_conf), postprocess(o2, cfg.has_conf)
