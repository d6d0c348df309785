#!/usr/bin/env python
"""Find the fastest per-Gaussian reduction of the Pallas bwd kernel output.

Variants (all consume the live kernel output in one graph):
  A. transpose + barrier + row scatter-add        (current, slow: layout trap)
  B. column scatter-add on (16, M) directly
  C. inv-perm lane-gather + lane cumsum + boundary gathers (sort-free segsum)
  D. transpose via explicit XLA copy (reshape through 1D) + row scatter
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
import numpy as np

from bench import make_camera, make_inputs, H, W, N
from guidedvd3dgs_tpu.ops import tiling
from guidedvd3dgs_tpu.ops import raster_tiles as rt
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
from guidedvd3dgs_tpu.ops.tiling import TILE

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

    try:
        out = rep(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = rep(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / ITERS * 1000.0
        print(f"{name:48s} {ms:9.2f} ms", flush=True)
        return ms
    except Exception as e:
        print(f"{name:48s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return -1.0


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
    ids = b.inst_gauss

    def kern(inst, ts, tc, c, d, a):
        return rt._run_bwd(inst, ts, tc, c, d, a, dC, dD, dA, GX, GY)

    kargs = (b.inst_data, b.tile_start, b.tile_count, C, D, A)

    def varA(inst, ts, tc, c, d, a, ids):
        g = kern(inst, ts, tc, c, d, a)
        gi = jax.lax.optimization_barrier(g.T)
        return jnp.zeros((N, 16), jnp.float32).at[ids].add(gi, mode="drop")

    timeit("A transpose+barrier+row scatter", varA, *kargs, ids)

    def varB(inst, ts, tc, c, d, a, ids):
        g = kern(inst, ts, tc, c, d, a)  # (16, M)
        return jnp.zeros((16, N + 1), jnp.float32).at[:, jnp.minimum(ids, N)].add(g)

    timeit("B column scatter on (16, M)", varB, *kargs, ids)

    def varD(inst, ts, tc, c, d, a, ids):
        g = kern(inst, ts, tc, c, d, a)
        flat = jax.lax.optimization_barrier(g.T.reshape(-1))
        gi = flat.reshape(M, 16)
        return jnp.zeros((N, 16), jnp.float32).at[ids].add(gi, mode="drop")

    timeit("D transpose->flatten barrier->row scatter", varD, *kargs, ids)

    # C: inv-perm + cumsum segment reduce (needs perm from binning: recompute
    # here via one extra sort of (ids-stable keys). For timing purposes we
    # approximate perm with a random permutation of equal size.)
    rng = np.random.default_rng(0)
    inv_perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    cum = jnp.asarray((np.arange(N, dtype=np.int64) + 1) * (M // N), dtype=jnp.int32)

    def varC(inst, ts, tc, c, d, a, inv_perm, cum):
        g = kern(inst, ts, tc, c, d, a)  # (16, M)
        pre = jnp.take(g, inv_perm, axis=1)  # lane gather
        P = jnp.cumsum(pre, axis=1)
        hi = jnp.take(P, cum - 1, axis=1)
        lo_idx = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
        lo = jnp.where(lo_idx[None, :] > 0, jnp.take(P, lo_idx - 1, axis=1), 0.0)
        return hi - lo

    timeit("C lane-gather+cumsum segment reduce", varC, *kargs, inv_perm, cum)

    def varE(inst, ts, tc, c, d, a, inv_perm):
        g = kern(inst, ts, tc, c, d, a)
        pre = jnp.take(g, inv_perm, axis=1)
        return pre.sum(axis=1)

    timeit("E lane gather only (cost probe)", varE, *kargs, inv_perm)


if __name__ == "__main__":
    main()
