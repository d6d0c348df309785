"""DPT monocular depth network (MiDaS v3 "dpt_large") in functional JAX.

Role of the reference MiDaS wrapper (reference:
utils/midas_depth_estimator.py:9-39 — torch.hub DPT, used by the
`append_pcd_from_video_diffusion` path to lift diffusion frames to points,
train_guidedvd.py:569-612). The architecture follows the DPT paper's pure-ViT
variant; parameter names match the HuggingFace `DPTForDepthEstimation` state
dict verbatim, so real `Intel/dpt-large` (or converted MiDaS) weights load
with no renaming, and a randomly-initialized HF model serves as the
activation-parity oracle (tests/test_dpt_parity.py).

Structure (HF transformers/models/dpt/modeling_dpt.py):
  ViT backbone (patch16 conv + cls + resizable pos embed, pre-LN blocks)
  -> 4 tapped hidden states (backbone_out_indices)
  -> reassemble: readout-project (cat cls, linear+gelu), 1x1 project to
     neck channels, resize by factors (4, 2, 1, 0.5)
  -> neck convs 3x3 (no bias) to fusion width
  -> fusion stage: pre-act residual units + align-corners 2x upsampling
  -> head: conv -> 2x upsample -> conv -> relu -> 1x1 -> relu.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

MIDAS_MEAN = (0.5, 0.5, 0.5)
MIDAS_STD = (0.5, 0.5, 0.5)


@dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    patch_size: int = 16
    pos_grid: int = 24  # trained pos-embed grid (384 / 16)
    out_indices: Tuple[int, ...] = (5, 11, 17, 23)
    neck_hidden: Tuple[int, ...] = (256, 512, 1024, 1024)
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden: int = 256


def _conv(p, name, x, stride=1, padding="SAME"):
    w = p[f"{name}.weight"]  # OIHW
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    b = p.get(f"{name}.bias")
    return out if b is None else out + b


def _conv_transpose(p, name, x, stride):
    w = p[f"{name}.weight"]  # torch ConvTranspose2d: (in, out, kh, kw)
    out = jax.lax.conv_transpose(
        x, jnp.transpose(w, (2, 3, 0, 1)), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )
    return out + p[f"{name}.bias"]


def _linear(p, name, x):
    return x @ p[f"{name}.weight"].T + p[f"{name}.bias"]


def _ln(p, name, x, eps=1e-12):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * p[f"{name}.weight"] + p[f"{name}.bias"]


def _vit_layer(p, pre, x, heads):
    b, n, c = x.shape
    h = _ln(p, f"{pre}.layernorm_before", x)
    q = _linear(p, f"{pre}.attention.attention.query", h)
    k = _linear(p, f"{pre}.attention.attention.key", h)
    v = _linear(p, f"{pre}.attention.attention.value", h)

    def split(t):
        return t.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (c // heads) ** -0.5
    att = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", att, v).transpose(0, 2, 1, 3).reshape(b, n, c)
    x = x + _linear(p, f"{pre}.attention.output.dense", o)
    h = _ln(p, f"{pre}.layernorm_after", x)
    h = jax.nn.gelu(_linear(p, f"{pre}.intermediate.dense", h), approximate=False)
    return x + _linear(p, f"{pre}.output.dense", h)


def _resize_pos_embed(pos, gh, gw, grid0):
    tok = pos[:, :1]
    grid = pos[0, 1:].reshape(1, grid0, grid0, -1)
    if (gh, gw) != (grid0, grid0):
        grid = jax.image.resize(grid, (1, gh, gw, grid.shape[-1]), "bilinear",
                                antialias=False)
    return jnp.concatenate([tok, grid.reshape(1, gh * gw, -1)], axis=1)


def _upsample_align_corners(x, h2, w2):
    """torch F.interpolate(mode=bilinear, align_corners=True) on NHWC."""
    b, h, w, c = x.shape

    def idx(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.zeros((n_out,), jnp.int32), jnp.zeros((n_out,), jnp.float32)
        pos = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        return i0, (pos - i0).astype(jnp.float32)

    yi, yf = idx(h, h2)
    xi, xf = idx(w, w2)
    top = x[:, yi] * (1 - yf)[None, :, None, None] + x[:, yi + 1] * yf[None, :, None, None]
    out = (
        top[:, :, xi] * (1 - xf)[None, None, :, None]
        + top[:, :, xi + 1] * xf[None, None, :, None]
    )
    return out


def _residual_unit(p, pre, x):
    h = jax.nn.relu(x)
    h = _conv(p, f"{pre}.convolution1", h)
    h = jax.nn.relu(h)
    h = _conv(p, f"{pre}.convolution2", h)
    return x + h


def dpt_forward(p: Params, cfg: DPTConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values: (B, H, W, 3), already MiDaS-normalized. H, W divisible by
    patch_size. Returns relative (inverse) depth (B, H, W)."""
    b, H, W, _ = pixel_values.shape
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps

    x = _conv(p, "dpt.embeddings.patch_embeddings.projection", pixel_values,
              stride=ps, padding="VALID")
    x = x.reshape(b, gh * gw, cfg.hidden_size)
    cls = jnp.broadcast_to(p["dpt.embeddings.cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _resize_pos_embed(p["dpt.embeddings.position_embeddings"], gh, gw, cfg.pos_grid)

    taps: List[jnp.ndarray] = []
    for i in range(cfg.num_layers):
        x = _vit_layer(p, f"dpt.encoder.layer.{i}", x, cfg.num_heads)
        if i in cfg.out_indices:
            taps.append(x)

    # reassemble (readout_type="project") + neck convs
    feats = []
    for i, t in enumerate(taps):
        cls_tok, tok = t[:, 0], t[:, 1:]
        readout = jnp.broadcast_to(cls_tok[:, None], tok.shape)
        h = jnp.concatenate([tok, readout], axis=-1)
        h = jax.nn.gelu(
            _linear(p, f"neck.reassemble_stage.readout_projects.{i}.0", h),
            approximate=False,
        )
        h = h.reshape(b, gh, gw, cfg.hidden_size)
        h = _conv(p, f"neck.reassemble_stage.layers.{i}.projection", h)
        f = cfg.reassemble_factors[i]
        if f > 1:
            h = _conv_transpose(p, f"neck.reassemble_stage.layers.{i}.resize", h, int(f))
        elif f < 1:
            h = _conv(p, f"neck.reassemble_stage.layers.{i}.resize", h, stride=int(round(1 / f)))
        h = _conv(p, f"neck.convs.{i}", h)
        feats.append(h)

    # fusion, coarsest first (HF reverses; fusion layer k consumes feats[-1-k])
    fused = None
    for k, h in enumerate(feats[::-1]):
        pre = f"neck.fusion_stage.layers.{k}"
        if fused is None:
            fused = h
        else:
            fused = fused + _residual_unit(p, f"{pre}.residual_layer1", h)
        fused = _residual_unit(p, f"{pre}.residual_layer2", fused)
        fused = _upsample_align_corners(fused, fused.shape[1] * 2, fused.shape[2] * 2)
        fused = _conv(p, f"{pre}.projection", fused)

    h = _conv(p, "head.head.0", fused)
    h = _upsample_align_corners(h, h.shape[1] * 2, h.shape[2] * 2)
    h = jax.nn.relu(_conv(p, "head.head.2", h))
    h = jax.nn.relu(_conv(p, "head.head.4", h))
    return h[..., 0]


def midas_preprocess(frames: jnp.ndarray, height: int = 384, width: int = 512) -> jnp.ndarray:
    """frames: (T, H, W, 3) in [-1, 1] -> normalized (T, height, width, 3)
    (reference midas_depth_estimator.py:16-39 resizes to 384x512 and
    normalizes with the midas transform)."""
    x = jnp.clip((frames + 1.0) / 2.0, 0.0, 1.0)
    x = jax.image.resize(x, (frames.shape[0], height, width, 3), "bilinear")
    mean = jnp.asarray(MIDAS_MEAN, x.dtype)
    std = jnp.asarray(MIDAS_STD, x.dtype)
    return (x - mean) / std


def make_depth_estimator(params: Params, cfg: DPTConfig = DPTConfig(),
                         height: int = 384, width: int = 512):
    """Returns `estimator(frames (T,H,W,3) in [-1,1]) -> (T, H, W) relative
    inverse depth at the input resolution` — the guided trainer's
    depth_estimator hook (train/guided.py run_diffusion_event)."""

    # params is a jit ARGUMENT (closing the DPT-large weights into the jit
    # would embed ~1.3 GB as lowering constants — see train/guided.py)
    @jax.jit
    def _run(p, frames):
        t, h0, w0 = frames.shape[0], frames.shape[1], frames.shape[2]
        x = midas_preprocess(frames, height, width)
        d = dpt_forward(p, cfg, x)
        return jax.image.resize(d, (t, h0, w0), "bilinear")

    def estimator(frames):
        return _run(params, frames)

    return estimator


def init_dpt_params(cfg: DPTConfig, seed: int = 0) -> Params:
    """Random init with the exact HF key set (tests / weightless runs)."""
    rng = np.random.default_rng(seed)
    p: Dict[str, np.ndarray] = {}

    def normal(shape, scale=0.02):
        return (scale * rng.standard_normal(shape)).astype(np.float32)

    c = cfg.hidden_size
    p["dpt.embeddings.cls_token"] = normal((1, 1, c))
    p["dpt.embeddings.position_embeddings"] = normal((1, cfg.pos_grid ** 2 + 1, c))
    p["dpt.embeddings.patch_embeddings.projection.weight"] = normal((c, 3, cfg.patch_size, cfg.patch_size))
    p["dpt.embeddings.patch_embeddings.projection.bias"] = np.zeros((c,), np.float32)
    for i in range(cfg.num_layers):
        pre = f"dpt.encoder.layer.{i}"
        for nm in ("query", "key", "value"):
            p[f"{pre}.attention.attention.{nm}.weight"] = normal((c, c))
            p[f"{pre}.attention.attention.{nm}.bias"] = np.zeros((c,), np.float32)
        p[f"{pre}.attention.output.dense.weight"] = normal((c, c))
        p[f"{pre}.attention.output.dense.bias"] = np.zeros((c,), np.float32)
        p[f"{pre}.intermediate.dense.weight"] = normal((cfg.mlp_dim, c))
        p[f"{pre}.intermediate.dense.bias"] = np.zeros((cfg.mlp_dim,), np.float32)
        p[f"{pre}.output.dense.weight"] = normal((c, cfg.mlp_dim))
        p[f"{pre}.output.dense.bias"] = np.zeros((c,), np.float32)
        for ln in ("layernorm_before", "layernorm_after"):
            p[f"{pre}.{ln}.weight"] = np.ones((c,), np.float32)
            p[f"{pre}.{ln}.bias"] = np.zeros((c,), np.float32)
    for i, (nh, f) in enumerate(zip(cfg.neck_hidden, cfg.reassemble_factors)):
        p[f"neck.reassemble_stage.readout_projects.{i}.0.weight"] = normal((c, 2 * c))
        p[f"neck.reassemble_stage.readout_projects.{i}.0.bias"] = np.zeros((c,), np.float32)
        p[f"neck.reassemble_stage.layers.{i}.projection.weight"] = normal((nh, c, 1, 1))
        p[f"neck.reassemble_stage.layers.{i}.projection.bias"] = np.zeros((nh,), np.float32)
        if f > 1:
            p[f"neck.reassemble_stage.layers.{i}.resize.weight"] = normal((nh, nh, int(f), int(f)))
            p[f"neck.reassemble_stage.layers.{i}.resize.bias"] = np.zeros((nh,), np.float32)
        elif f < 1:
            p[f"neck.reassemble_stage.layers.{i}.resize.weight"] = normal((nh, nh, 3, 3))
            p[f"neck.reassemble_stage.layers.{i}.resize.bias"] = np.zeros((nh,), np.float32)
        p[f"neck.convs.{i}.weight"] = normal((cfg.fusion_hidden, nh, 3, 3))
    for k in range(len(cfg.neck_hidden)):
        pre = f"neck.fusion_stage.layers.{k}"
        p[f"{pre}.projection.weight"] = normal((cfg.fusion_hidden, cfg.fusion_hidden, 1, 1))
        p[f"{pre}.projection.bias"] = np.zeros((cfg.fusion_hidden,), np.float32)
        for r in (1, 2):
            p[f"{pre}.residual_layer{r}.convolution1.weight"] = normal(
                (cfg.fusion_hidden, cfg.fusion_hidden, 3, 3))
            p[f"{pre}.residual_layer{r}.convolution1.bias"] = np.zeros((cfg.fusion_hidden,), np.float32)
            p[f"{pre}.residual_layer{r}.convolution2.weight"] = normal(
                (cfg.fusion_hidden, cfg.fusion_hidden, 3, 3))
            p[f"{pre}.residual_layer{r}.convolution2.bias"] = np.zeros((cfg.fusion_hidden,), np.float32)
    fh = cfg.fusion_hidden
    p["head.head.0.weight"] = normal((fh // 2, fh, 3, 3))
    p["head.head.0.bias"] = np.zeros((fh // 2,), np.float32)
    p["head.head.2.weight"] = normal((32, fh // 2, 3, 3))
    p["head.head.2.bias"] = np.zeros((32,), np.float32)
    p["head.head.4.weight"] = normal((1, 32, 1, 1))
    p["head.head.4.bias"] = np.zeros((1,), np.float32)
    return p


def load_hf_dpt_weights(path: str) -> Params:
    """Load an HF DPTForDepthEstimation checkpoint (.safetensors or torch
    .bin) — keys are used verbatim."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}
