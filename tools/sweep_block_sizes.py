#!/usr/bin/env python
"""Sweep the Pallas block-size knobs (GVD_EXPAND_BLK / GVD_SEGSUM_BBLK /
GVD_RASTER_CHUNK) on the real chip. Parent process spawns one subprocess
per config (the constants bind at import time)."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CONFIGS = [
    {},
    # expand VPU work per slot is BLK+128 (window overhead), so SMALLER
    # blocks do less arithmetic — the round-2 sweep only went upward
    {"GVD_EXPAND_BLK": "128"},
    {"GVD_EXPAND_BLK": "512"},
    {"GVD_SEGSUM_BBLK": "256"},
    {"GVD_SEGSUM_BBLK": "1024"},
    {"GVD_RASTER_CHUNK": "256"},
]

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from bench import make_camera, make_inputs, H, W
from guidedvd3dgs_tpu.ops import expand, segsum, tiling
from guidedvd3dgs_tpu.ops import raster_tiles as rt
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians

ITERS = 8
GX, GY = (W + 15) // 16, (H + 15) // 16

def timeit(name, fn, *args):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(carry * 0.0, *a)
            leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
                      if hasattr(x, "astype")]
            s = jnp.stack(leaves).sum()
            return s * 1e-30, s
        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs
    out = rep(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(rep(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:32s} {best / ITERS * 1000.0:8.2f} ms", flush=True)

cam = make_camera()
means, scales, rots, opac, shs = make_inputs()
bg = jnp.zeros((3,), jnp.float32)
proc = jax.jit(lambda m, s, r, o, sh: preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3))(
    means, scales, rots, opac, shs)
demand = int(jnp.sum(jnp.where(proc.radii > 0, tiling.tile_rects(proc, W, H)[4], 0)))
M = -(-int(demand * 1.3) // 1024) * 1024
binning = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)

def binning_total(e, p):
    p = p._replace(means2d=p.means2d + e)
    return tiling.bin_gaussians(p, W, H, M)
timeit("binning TOTAL", binning_total, proc)

# depth_bits is STATIC in TileBinning but `binning` came out of a jitted
# call (tracer); rebuild the static value (21 at this tile count)
dp = dict(depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
          depth_bits=21)

def jiggle(inst, e):
    return inst ^ (e * 0).astype(jnp.int32)

def fwd_kernel_only(e, b_inst, b_start, b_count):
    return rt._run_fwd(jiggle(b_inst, e), b_start, b_count, bg, GX, GY, **dp)
timeit("fwd blend kernel", fwd_kernel_only, binning.inst_data,
       binning.tile_start, binning.tile_count)

C, D, A = jax.jit(lambda i, s, c: rt._run_fwd(i, s, c, bg, GX, GY, **dp))(
    binning.inst_data, binning.tile_start, binning.tile_count)
dC, dD, dA = jnp.ones_like(C), jnp.ones_like(D), jnp.ones_like(A)

def bwd_kernel_only(e, inst, start, count, C, D, A):
    return rt._run_bwd(jiggle(inst, e), start, count, C, D, A, dC, dD, dA, GX, GY, **dp)
timeit("bwd blend kernel", bwd_kernel_only, binning.inst_data,
       binning.tile_start, binning.tile_count, C, D, A)

grad_inst = jax.jit(lambda i, s, c, C, D, A: rt._run_bwd(i, s, c, C, D, A, dC, dD, dA, GX, GY, **dp))(
    binning.inst_data, binning.tile_start, binning.tile_count, C, D, A)

def reduce_only(e, grad_inst, binning):
    return rt._reduce_per_gaussian(jiggle(grad_inst, e), binning)
timeit("reduce (sort+segsum)", reduce_only, grad_inst, binning)

def loss(m, s, r, o, sh):
    out = rt.rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3, max_instances=M)
    return out.color.sum() + 0.1 * out.depth.sum() + 0.1 * out.alpha.sum()
vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
timeit("FULL fwd+bwd", lambda e, m, s, r, o, sh: vg(m + e, s, r, o, sh),
       means, scales, rots, opac, shs)
""" % {"repo": REPO}


def main():
    for cfg in CONFIGS:
        env = dict(os.environ)
        env.update(cfg)
        print(f"=== {cfg or 'base'} ===", flush=True)
        r = subprocess.run(
            [sys.executable, "-u", "-c", CHILD], env=env,
            stderr=subprocess.DEVNULL, timeout=1500,
        )
        if r.returncode != 0:
            print(f"  FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
