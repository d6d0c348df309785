#!/usr/bin/env python
"""On-chip packed-vs-exact rasterizer tolerance check (ADVICE r2 #2).

The interpret-mode parity tests run the blend prefix as exact f32 dots, so
the packed-mode tradeoffs (f16 field packing + default-precision bf16
log-transmittance prefix, see raster_tiles._chunk_blend_quantities) are only
ever exercised by real hardware. This tool renders the bench-style scene
fwd+bwd twice on the chip — tiling.set_pack_fields(True/False) — and prices
the difference: per-pixel color/depth/alpha errors and relative parameter
gradient errors.

Writes PACKED_PARITY.json at the repo root. Pass/fail thresholds, sized to
the consumers of the two outputs:
  - color max-abs <= 3/255 AND mean-abs <= 1e-3: renders feed 8-bit targets
    and L1/SSIM losses; the max is an extreme-tail statistic over 143k
    pixels (deep blends accumulate per-instance f16/bf16 noise), while the
    mean — what the losses integrate — sits two orders below an 8-bit LSB
    (measured r3: max 0.0080, mean 1.7e-4).
  - grad relative L2 <= 2% per parameter tensor: bf16-packed gradient noise
    must stay far below SGD minibatch noise (measured r3: 0.2-0.5%).
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.artifact_io import write_artifact

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N = 200_000
H, W = 320, 448


def make_scene():
    rng = np.random.default_rng(3)
    means = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    means[:, 2] += 3.0
    scales = np.exp(rng.uniform(-6.5, -4.5, (N, 3))).astype(np.float32)
    rots = rng.normal(size=(N, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(size=(N, 1))))).astype(np.float32)
    shs = (rng.normal(size=(N, 16, 3)) * 0.3).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, rots, opac, shs)))


def make_camera():
    from guidedvd3dgs_tpu.ops.projection import RasterCamera
    from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix, getWorld2View2

    fov = math.radians(60)
    view = np.asarray(getWorld2View2(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))).T
    proj = np.asarray(getProjectionMatrix(0.01, 100.0, fov, fov)).T
    return RasterCamera(
        jnp.asarray(view), jnp.asarray(view @ proj),
        jnp.asarray(np.linalg.inv(view.T)[:3, 3]),
        math.tan(fov / 2), math.tan(fov / 2), H, W,
    )


def run(packed: bool, args, cam, bg):
    from guidedvd3dgs_tpu.ops import tiling
    from guidedvd3dgs_tpu.ops.raster_tiles import rasterize_tiles

    tiling.set_pack_fields(packed)

    def fwd(m, s, r, o, sh):
        out = rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3)
        return out.color, out.depth, out.alpha

    def loss(m, s, r, o, sh):
        c, d, a = fwd(m, s, r, o, sh)
        # image-space cosine weighting so grads are not a plain sum
        wy = jnp.cos(jnp.arange(H, dtype=jnp.float32))[None, :, None]
        return (c * wy).sum() + 0.1 * (d * wy[0]).sum() + 0.1 * (a * wy[0]).sum()

    imgs = jax.jit(fwd)(*args)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    out = [np.asarray(x) for x in imgs], [np.asarray(g) for g in grads]
    tiling.set_pack_fields(True)
    return out


def rel_l2(a, b):
    denom = float(np.linalg.norm(b.ravel())) or 1.0
    return float(np.linalg.norm((a - b).ravel())) / denom


def main():
    cam = make_camera()
    bg = jnp.zeros((3,), jnp.float32)
    args = make_scene()
    (ic, idp, ia), gp = run(True, args, cam, bg)
    (ec, edp, ea), ge = run(False, args, cam, bg)

    names = ["means", "scales", "rots", "opacity", "shs"]
    report = {
        "device": str(jax.devices()[0]),
        "n_gaussians": N,
        "color_max_abs": float(np.abs(ic - ec).max()),
        "color_mean_abs": float(np.abs(ic - ec).mean()),
        "depth_max_abs": float(np.abs(idp - edp).max()),
        "alpha_max_abs": float(np.abs(ia - ea).max()),
        "grad_rel_l2": {n: rel_l2(a, b) for n, a, b in zip(names, gp, ge)},
    }
    report["pass"] = bool(
        report["color_max_abs"] <= 3.0 / 255.0
        and report["color_mean_abs"] <= 1e-3
        and all(v <= 0.02 for v in report["grad_rel_l2"].values())
    )
    write_artifact(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PACKED_PARITY.json"), report)
    print(json.dumps(report, indent=1))
    if not report["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
