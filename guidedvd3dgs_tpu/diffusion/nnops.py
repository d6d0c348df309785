"""Functional NN primitives over torch-named parameter dicts.

The diffusion stack stores parameters as a flat dict keyed by the SOURCE
torch state_dict names (e.g. "input_blocks.0.0.weight") with tensors kept in
torch memory layout (Linear (out,in), Conv2d OIHW, Conv3d OIDHW). Ops consume
those layouts directly via `lax.conv_general_dilated` dimension numbers, so
checkpoint conversion is a pure `tensor.numpy()` copy — no permutes to get
wrong — and XLA picks optimal TPU layouts internally. Activations are
channels-last (NHWC / NTHWC), the TPU-native layout.

Reference semantics: third_party/ViewCrafter/lvdm/basics.py (normalization =
GroupNorm32 run in f32), lvdm/models/utils_diffusion.py:8-28
(timestep_embedding, [cos, sin] order).
"""

from __future__ import annotations

import math
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = dict  # flat {torch_name: jnp.ndarray}


def linear(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    w = p[f"{name}.weight"]  # (out, in) torch layout
    y = x @ w.T.astype(x.dtype)
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv2d(p: Params, name: str, x: jnp.ndarray, stride: int = 1, padding=1) -> jnp.ndarray:
    """x: (N, H, W, C); weight: torch OIHW."""
    w = p[f"{name}.weight"].astype(x.dtype)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv3d(p: Params, name: str, x: jnp.ndarray, padding=(1, 0, 0)) -> jnp.ndarray:
    """x: (N, T, H, W, C); weight: torch OIDHW (D = time)."""
    w = p[f"{name}.weight"].astype(x.dtype)
    pad = [(padding[0],) * 2, (padding[1],) * 2, (padding[2],) * 2]
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=pad,
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
    )
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv1d_k1(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Pointwise Conv1d (kernel_size=1) as a matmul. x: (..., C_in)."""
    w = p[f"{name}.weight"]  # (out, in, 1)
    y = x @ w[:, :, 0].T.astype(x.dtype)
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def group_norm(
    p: Params, name: str, x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5
) -> jnp.ndarray:
    """Channels-last GroupNorm with f32 statistics (reference
    GroupNormSpecific, lvdm/basics.py:76-87).

    f32 inputs take the reference two-pass form verbatim. Half-precision
    inputs (the UNet/VAE bf16 autocast path) take a traffic-minimal form:
    the stats reductions read the bf16 tensor directly with f32
    accumulation, and the normalize+affine folds into one fused
    x*scale+shift writing bf16 — no f32 copy of the activation is ever
    materialized, halving the HBM bytes of every GroupNorm round trip
    (UNET_BLOCK_PROFILE.json measured ~0.66 ms per f32 round trip at the
    level-0 extent; 4 of them per temporal res block)."""
    c = x.shape[-1]
    g = num_groups
    xg = x.reshape(x.shape[:-1] + (g, c // g))
    red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    w = p[f"{name}.weight"].astype(jnp.float32)
    b = p[f"{name}.bias"].astype(jnp.float32)
    if x.dtype == jnp.float32:
        mean = xg.mean(axis=red_axes, keepdims=True)
        var = xg.var(axis=red_axes, keepdims=True)
        xg = (xg - mean) * lax.rsqrt(var + eps)
        return xg.reshape(x.shape) * w + b
    mean = jnp.mean(xg, axis=red_axes, keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32) - mean), axis=red_axes, keepdims=True
    )
    rstd = lax.rsqrt(var + eps)
    scale = rstd * w.reshape(g, c // g)
    shift = b.reshape(g, c // g) - mean * scale
    y = xg.astype(jnp.float32) * scale + shift
    return y.reshape(x.shape).astype(x.dtype)


def layer_norm(p: Params, name: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    return y * p[f"{name}.weight"].astype(x.dtype) + p[f"{name}.bias"].astype(x.dtype)


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    # torch F.gelu default = exact erf form
    return jax.nn.gelu(x, approximate=False)


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """[cos | sin] sinusoidal embedding (reference utils_diffusion.py:8-28)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsampling on (..., H, W, C)."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    x = jnp.repeat(x, 2, axis=h_axis)
    x = jnp.repeat(x, 2, axis=w_axis)
    return x


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    n = x.ndim
    window = [1] * n
    window[n - 3] = window[n - 2] = 2
    return lax.reduce_window(x, 0.0, lax.add, window, window, "VALID") / 4.0


# Fused (flash) attention for long self-attention sequences. The einsum
# path materializes (B, H, N, N) f32 logits — ~2.5 GB per call for the
# full-size engine's base-level spatial self-attention (N = 40*56 = 2240,
# 25 frames) — while the Pallas TPU flash kernel streams KV blocks with an
# online softmax (no N^2 residents, custom VJP included). TPU-only; CPU /
# interpret runs fall back to the einsum path automatically.
_FUSED_ATTENTION = [True]
_FUSED_MIN_SEQ = 1024


def set_fused_attention(flag: bool) -> None:
    _FUSED_ATTENTION[0] = flag


def _flash_block_sizes(n_pad: int):
    """Largest uniform block <= 768 dividing the padded sequence, applied to
    every fwd/bwd block knob. The kernel's get_default() is 128 everywhere,
    which shreds the grid into thousands of (128, 64) @ (64, 128) matmuls:
    at the UNet's base level (B25 H5 N2240 D64, padded 2304) the default
    measures 21.6 ms fwd / 42.6 ms fwd+vjp vs 3.7 / 9.4 at 768-blocks
    (ATTN_BLOCK_SWEEP.json, v5e)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    blk = 128
    # Cap at 768: the sweep validated 768 (and 1152 via a larger-pad probe);
    # 1024-blocks were never measured, so sequences they would divide take
    # the largest measured configuration instead (ADVICE r4).
    for cand in range(128, 769, 128):  # largest <=768 divisor, mult of 128
        if n_pad % cand == 0:
            blk = cand
    return BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )


def _flash_attention_padded(q, k, v, scale: float) -> jnp.ndarray:
    """Self-attention via the Pallas TPU flash kernel, zero-padding the
    sequence to the kernel's block granularity. Pad KV tokens are excluded
    with segment ids (pad queries attend only among themselves and are
    sliced off)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention,
    )

    b, h, n, d = q.shape
    n_pad = -(-n // 128) * 128
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        seg = jnp.concatenate(
            [jnp.ones((b, n), jnp.int32), jnp.full((b, n_pad - n), 2, jnp.int32)],
            axis=1,
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    out = flash_attention(
        q, k, v, segment_ids=segment_ids, sm_scale=scale,
        block_sizes=_flash_block_sizes(n_pad),
    )
    return out[:, :, :n, :]


# Group size for the block-diagonal small-sequence attention: G sequences
# ride ONE (G*N, D) @ (D, G*N) MXU matmul with off-diagonal blocks masked
# to -inf before the softmax (rows then only see their own sequence, so the
# full-row softmax IS the per-sequence softmax).
#
# Measured split verdict at the production shape (v5e):
#   * isolated fwd (TEMPORAL_ATTN_SWEEP.json): plain einsum WINS — 0.65 ms
#     vs grouped g4/g5/g8 1.17/1.41/1.28 (XLA already batches the (25,64)
#     matmuls acceptably; the r4 "3.2 ms MXU-hostile attn" premise in
#     XFORMER_PARTS_PROFILE.json was the in-context slice, not the op);
#   * isolated fwd+vjp: grouped g5 WINS — 1.71 vs einsum 1.95 ms;
#   * the PRODUCTION guided DDIM step (fwd CFG pair + vjp backward, the
#     regime every one of the ~100 UNet applications per event runs in):
#     grouped ON 2.88 s vs OFF 2.97 s (profile_guided_step --free-encoders,
#     serial_ckpt). The step is what ships, so grouped stays ON (G=5:
#     5*25=125 tokens pads to one 128-lane tile). Disable for fwd-only
#     experiments with GVD_SMALL_ATTN_GROUP=1.
_SMALL_ATTN_GROUP = [int(_os.environ.get("GVD_SMALL_ATTN_GROUP", "5"))]
_SMALL_ATTN_MAX_SEQ = 32
_SMALL_ATTN_MIN_BATCH = 1024


def set_small_attn_group(g: int) -> None:
    _SMALL_ATTN_GROUP[0] = g


def _grouped_small_attention(q, k, v, scale: float) -> jnp.ndarray:
    """Self-attention over many tiny sequences as block-diagonal attention
    over grouped sequences. q,k,v: (B, H, N, D) with N small; exact (the
    mask is applied before softmax; padded tail rows attend to themselves
    and are sliced off)."""
    b, h, n, d = q.shape
    g = max(1, _SMALL_ATTN_GROUP[0])
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    pad = (-bh) % g
    if pad:
        qf, kf, vf = (
            jnp.concatenate([x, jnp.zeros((pad, n, d), x.dtype)], 0)
            for x in (qf, kf, vf)
        )
    ng = (bh + pad) // g
    qg = qf.reshape(ng, g * n, d)
    kg = kf.reshape(ng, g * n, d)
    vg = vf.reshape(ng, g * n, d)
    sim = (
        jnp.einsum("gid,gjd->gij", qg, kg, preferred_element_type=jnp.float32)
        * scale
    )
    blk = jnp.arange(g * n) // n
    same = blk[:, None] == blk[None, :]
    sim = jnp.where(same, sim, jnp.finfo(sim.dtype).min)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("gij,gjd->gid", attn.astype(vg.dtype), vg)
    out = out.reshape(bh + pad, n, d)[:bh]
    return out.reshape(b, h, n, d)


def attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    bias: Optional[jnp.ndarray] = None, mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax attention; q,k,v: (B, H, N, D). Softmax in f32.

    Long unmasked self-attention dispatches to the Pallas flash kernel on
    TPU (see _flash_attention_padded); huge-batch tiny-sequence
    self-attention (the UNet's temporal attention over the 25 frames) takes
    the block-diagonal grouped form (see _grouped_small_attention);
    everything else — cross-attention over short contexts, masked/biased
    attention, CPU runs — uses the plain einsum path (reference
    lvdm/modules/attention.py:100-127 semantics)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")  # axon = tunneled TPU
    if (
        _FUSED_ATTENTION[0]
        and bias is None
        and mask is None
        and q.shape[2] == k.shape[2]
        and q.shape[2] >= _FUSED_MIN_SEQ
        and on_tpu
    ):
        return _flash_attention_padded(q, k, v, scale)
    if (
        _FUSED_ATTENTION[0]  # kill-switch covers BOTH optimized forms:
        # set_fused_attention(False) must restore plain-einsum reference
        # semantics everywhere, not just for the flash path
        and bias is None
        and mask is None
        and q.shape[2] == k.shape[2]
        and q.shape[2] <= _SMALL_ATTN_MAX_SEQ
        and q.shape[0] * q.shape[1] >= _SMALL_ATTN_MIN_BATCH
        and _SMALL_ATTN_GROUP[0] > 1
        and on_tpu
    ):
        return _grouped_small_attention(q, k, v, scale)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        sim = sim + bias
    if mask is not None:
        sim = jnp.where(mask, sim, jnp.finfo(sim.dtype).min)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)
