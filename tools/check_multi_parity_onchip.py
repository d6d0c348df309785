#!/usr/bin/env python
"""On-chip batched-multi-camera vs single-camera rasterizer parity.

The interpret-mode tests (tests/test_raster_multi.py) prove the virtual-
framebuffer batching is algebraically right; this tool proves the REAL
Mosaic compilation of the bigger grid (grid_y = B * gy) and the banded
binning produce the same images and gradients on hardware, in the
production packed configuration. Two cameras, bench-style scene, fwd+bwd:

  batched  : rasterize_tiles_multi (one kernel chain, union buffer)
  reference: two rasterize_tiles calls (grads summed)

Writes MULTI_PARITY.json at the repo root. Thresholds: the two paths share
the kernels but organize instances in different buffer layouts, so f16
field packing + bf16 log-transmittance noise differ per instance order —
the same tolerance class as PACKED_PARITY (color max-abs 3/255, grad
rel-L2 2%).
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

N = int(os.environ.get("GVD_MP_N", "200000"))
H = int(os.environ.get("GVD_MP_H", "320"))
W = int(os.environ.get("GVD_MP_W", "448"))


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


def make_camera(tz=0.0):
    from guidedvd3dgs_tpu.ops.projection import RasterCamera
    from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix, getWorld2View2

    fov = math.radians(60)
    view = np.asarray(
        getWorld2View2(
            np.eye(3, dtype=np.float32), np.array([0.0, 0.0, -tz], np.float32)
        )
    ).T
    proj = np.asarray(getProjectionMatrix(0.01, 100.0, fov, fov)).T
    return RasterCamera(
        jnp.asarray(view), jnp.asarray(view @ proj),
        jnp.asarray(np.linalg.inv(view.T)[:3, 3]),
        math.tan(fov / 2), math.tan(fov / 2), H, W,
    )


def rel_l2(a, b):
    denom = float(np.linalg.norm(np.asarray(b).ravel())) or 1.0
    return float(np.linalg.norm(np.asarray(a - b).ravel())) / denom


def main():
    from guidedvd3dgs_tpu.parallel.data_parallel import stack_cameras
    from guidedvd3dgs_tpu.ops.raster_tiles import (
        rasterize_tiles,
        rasterize_tiles_multi,
    )

    cams = [make_camera(0.0), make_camera(0.8)]
    cams_s = stack_cameras(cams)
    bg = jnp.zeros((3,), jnp.float32)
    args = make_scene()
    # measure demand, then size the buffers 1.3x (an oversized static
    # buffer bloats the sort programs and their compile time)
    probe = jax.jit(
        lambda m, s, r, o, sh: rasterize_tiles(
            m, s, r, o, sh, cams[1], bg, sh_degree=3, max_instances=2 << 20
        ).num_instances
    )
    demand = int(probe(*args))
    mi = 2 * (-(-int(demand * 1.3) // 4096) * 4096)

    wy = jnp.cos(jnp.arange(H, dtype=jnp.float32))[None, :, None]

    def loss_single(m, s, r, o, sh):
        t = 0.0
        for c in cams:
            out = rasterize_tiles(m, s, r, o, sh, c, bg, sh_degree=3,
                                  max_instances=mi // 2)
            t = t + (out.color * wy).sum() + 0.1 * (out.depth * wy[0]).sum()
        return t

    def loss_multi(m, s, r, o, sh):
        out = rasterize_tiles_multi(m, s, r, o, sh, cams_s, bg, sh_degree=3,
                                    max_instances=mi)
        return (out.color * wy[None]).sum() + 0.1 * (out.depth * wy).sum()

    def fwd_single(m, s, r, o, sh):
        outs = [
            rasterize_tiles(m, s, r, o, sh, c, bg, sh_degree=3,
                            max_instances=mi // 2)
            for c in cams
        ]
        return (
            jnp.stack([o_.color for o_ in outs]),
            jnp.stack([o_.depth for o_ in outs]),
            jnp.stack([o_.alpha for o_ in outs]),
        )

    def fwd_multi(m, s, r, o, sh):
        out = rasterize_tiles_multi(m, s, r, o, sh, cams_s, bg, sh_degree=3,
                                    max_instances=mi)
        return out.color, out.depth, out.alpha

    sc, sd, sa = [np.asarray(x) for x in jax.jit(fwd_single)(*args)]
    mc, md, ma = [np.asarray(x) for x in jax.jit(fwd_multi)(*args)]
    gs = jax.jit(jax.grad(loss_single, argnums=(0, 1, 2, 3, 4)))(*args)
    gm = jax.jit(jax.grad(loss_multi, argnums=(0, 1, 2, 3, 4)))(*args)

    names = ["means", "scales", "rots", "opacity", "shs"]
    report = {
        "device": str(jax.devices()[0]),
        "n_gaussians": N,
        "color_max_abs": float(np.abs(mc - sc).max()),
        "color_mean_abs": float(np.abs(mc - sc).mean()),
        "depth_max_abs": float(np.abs(md - sd).max()),
        "alpha_max_abs": float(np.abs(ma - sa).max()),
        "grad_rel_l2": {n: rel_l2(a, b) for n, a, b in zip(names, gm, gs)},
    }
    report["pass"] = bool(
        report["color_max_abs"] <= 3.0 / 255.0
        and report["color_mean_abs"] <= 1e-3
        and all(v <= 0.02 for v in report["grad_rel_l2"].values())
    )
    write_artifact(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MULTI_PARITY.json"), report)
    print(json.dumps(report, indent=1))
    if not report["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
