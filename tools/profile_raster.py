#!/usr/bin/env python
"""Stage-by-stage timing of the tile raster pipeline at bench scale.

Times (with in-graph scan repetition, excluding dispatch latency):
preprocess / binning / fwd kernel / bwd kernel / full fwd / full fwd+bwd.
All inputs are passed as jit arguments (never closed over) so XLA cannot
constant-fold the pipeline at compile time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import make_camera, make_inputs, H, W, N
from guidedvd3dgs_tpu.ops import tiling
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
from guidedvd3dgs_tpu.ops import raster_tiles as rt

ITERS = 8
GX, GY = (W + 15) // 16, (H + 15) // 16


def timeit(name, fn, *args):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(*a)
            leaves = [
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree.leaves(out)
                if hasattr(x, "astype")
            ]
            # fold the carry in so the scan body cannot be hoisted/CSE'd
            return carry + leaves[0] * 0.0, jnp.stack(leaves).sum()

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs

    out = rep(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = rep(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:34s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    bg = jnp.zeros((3,), jnp.float32)
    means, scales, rots, opac, shs = make_inputs()
    max_instances = 4 * N

    def preproc(m, s, r, o, sh):
        return preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)

    proc = jax.jit(preproc)(means, scales, rots, opac, shs)
    jax.block_until_ready(proc)
    timeit("preprocess", preproc, means, scales, rots, opac, shs)

    def binn(p):
        b = tiling.bin_gaussians(p, W, H, max_instances)
        return (b.inst_data, b.tile_start, b.tile_count, b.overflow, b.num_instances)

    b = jax.jit(binn)(proc)
    jax.block_until_ready(b)
    print(f"{'':34s} overflow={int(b[3])} demand={int(b[4])}", flush=True)
    timeit("binning", binn, proc)

    inst_data, tile_start, tile_count = b[0], b[1], b[2]

    def fwdk(i, ts, tc):
        return rt._run_fwd(i, ts, tc, bg, GX, GY)

    C, D, A = jax.jit(fwdk)(inst_data, tile_start, tile_count)
    jax.block_until_ready((C, D, A))
    timeit("fwd kernel only", fwdk, inst_data, tile_start, tile_count)

    dC = jnp.ones_like(C)
    dD = jnp.ones_like(D) * 0.1
    dA = jnp.ones_like(A) * 0.1

    def bwdk(i, ts, tc, c, d, a):
        return rt._run_bwd(i, ts, tc, c, d, a, dC, dD, dA, GX, GY)

    g = jax.jit(bwdk)(inst_data, tile_start, tile_count, C, D, A)
    jax.block_until_ready(g)
    timeit("bwd kernel only", bwdk, inst_data, tile_start, tile_count, C, D, A)

    def full_fwd(m, s, r, o, sh):
        out = rt.rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3)
        return out.color.sum() + 0.1 * out.depth.sum() + 0.1 * out.alpha.sum()

    timeit("full fwd", full_fwd, means, scales, rots, opac, shs)

    vg = jax.value_and_grad(full_fwd, argnums=(0, 1, 2, 3, 4))
    timeit("full fwd+bwd", vg, means, scales, rots, opac, shs)


if __name__ == "__main__":
    main()
