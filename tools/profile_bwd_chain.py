#!/usr/bin/env python
"""Time the real backward chain pieces on actual binning outputs:
_run_bwd kernel -> transpose -> scatter-adds, in one graph."""
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
from guidedvd3dgs_tpu.ops import raster_tiles as rt
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
from guidedvd3dgs_tpu.ops.tiling import F_OP, F_R, F_D, TILE

ITERS = 8
GX, GY = (W + TILE - 1) // TILE, (H + TILE - 1) // TILE
M = rt.CHUNK * (-(-4 * N // rt.CHUNK))


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
            return carry + leaves[0] * 0.0, jnp.stack(leaves).sum()

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs

    out = rep(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = rep(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:44s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    bg = jnp.zeros((3,), jnp.float32)
    means, scales, rots, opac, shs = make_inputs()

    proc = jax.jit(
        lambda m, s, r, o, sh: preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
    )(means, scales, rots, opac, shs)
    b = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)
    C, D, A = jax.jit(lambda i, ts, tc: rt._run_fwd(i, ts, tc, bg, GX, GY))(
        b.inst_data, b.tile_start, b.tile_count
    )
    dC = jnp.ones_like(C)
    dD = jnp.ones_like(D) * 0.1
    dA = jnp.ones_like(A) * 0.1

    def kernel_plus_scatter(inst, ts, tc, ids, c, d, a):
        grad_inst = rt._run_bwd(inst, ts, tc, c, d, a, dC, dD, dA, GX, GY)
        gi = jax.lax.optimization_barrier(grad_inst.T)
        acc = jnp.zeros((N, 16), jnp.float32).at[ids].add(gi, mode="drop")
        return acc

    timeit("bwd kernel + transpose + scatter", kernel_plus_scatter,
           b.inst_data, b.tile_start, b.tile_count, b.inst_gauss, C, D, A)

    def kernel_plus_T(inst, ts, tc, c, d, a):
        grad_inst = rt._run_bwd(inst, ts, tc, c, d, a, dC, dD, dA, GX, GY)
        return grad_inst.T * 2.0

    timeit("bwd kernel + transpose only", kernel_plus_T,
           b.inst_data, b.tile_start, b.tile_count, C, D, A)

    def scatter_on_real(gi_t, ids):
        gi = gi_t  # already (M, F)
        d_m2d = jnp.zeros((N, 2), jnp.float32).at[ids].add(gi[:, 0:2], mode="drop")
        d_conic = jnp.zeros((N, 3), jnp.float32).at[ids].add(gi[:, 2:5], mode="drop")
        d_opac = jnp.zeros((N,), jnp.float32).at[ids].add(gi[:, F_OP], mode="drop")
        d_color = jnp.zeros((N, 3), jnp.float32).at[ids].add(gi[:, F_R:F_R+3], mode="drop")
        d_depth = jnp.zeros((N,), jnp.float32).at[ids].add(gi[:, F_D], mode="drop")
        return d_m2d, d_conic, d_opac, d_color, d_depth

    grad_inst = jax.jit(
        lambda i, ts, tc, c, d, a: rt._run_bwd(i, ts, tc, c, d, a, dC, dD, dA, GX, GY).T
    )(b.inst_data, b.tile_start, b.tile_count, C, D, A)
    grad_inst = jnp.nan_to_num(grad_inst)
    timeit("scatter on real grads (materialized)", scatter_on_real, grad_inst, b.inst_gauss)


if __name__ == "__main__":
    main()
