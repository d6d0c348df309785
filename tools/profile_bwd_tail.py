#!/usr/bin/env python
"""Micro-profile of the raster backward tail: cotangent padding, the
per-Gaussian scatter-add reduction, and the preprocess VJP."""
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
from guidedvd3dgs_tpu.ops.projection import RasterCamera, preprocess_gaussians
from guidedvd3dgs_tpu.ops.tiling import NUM_FIELDS, F_OP, F_R, F_D

ITERS = 8
M = 4 * N


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
    print(f"{name:40s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()

    def preproc(m, s, r, o, sh):
        return preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)

    proc = jax.jit(preproc)(means, scales, rots, opac, shs)
    b = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)
    ids = b.inst_gauss
    rng = np.random.default_rng(0)
    gi = jnp.asarray(rng.normal(size=(M, NUM_FIELDS)).astype(np.float32))

    def scatter_reduce(gi, ids):
        n = N
        d_m2d = jnp.zeros((n, 2), jnp.float32).at[ids].add(gi[:, 0:2], mode="drop")
        d_conic = jnp.zeros((n, 3), jnp.float32).at[ids].add(gi[:, 2:5], mode="drop")
        d_opac = jnp.zeros((n,), jnp.float32).at[ids].add(gi[:, F_OP], mode="drop")
        d_color = jnp.zeros((n, 3), jnp.float32).at[ids].add(gi[:, F_R:F_R+3], mode="drop")
        d_depth = jnp.zeros((n,), jnp.float32).at[ids].add(gi[:, F_D], mode="drop")
        return d_m2d, d_conic, d_opac, d_color, d_depth

    timeit("scatter-add reduce (5 fields)", scatter_reduce, gi, ids)

    def scatter_reduce_one(gi, ids):
        return jnp.zeros((N, NUM_FIELDS), jnp.float32).at[ids].add(gi, mode="drop")

    timeit("scatter-add reduce (one 16-wide)", scatter_reduce_one, gi, ids)

    def seg_sum(gi, ids):
        return jax.ops.segment_sum(gi, ids, num_segments=N + 1)[:N]

    timeit("segment_sum (16-wide)", seg_sum, gi, ids)

    # preprocess VJP alone
    d_m2d = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32))
    d_depthn = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    d_conic = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    d_color = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    d_opacn = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def preproc_vjp(m, s, r, o, sh, dm, dd, dc, dcol, dop):
        def f(m, s, r, o, sh):
            p = preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)

        _, vjp_fn = jax.vjp(f, m, s, r, o, sh)
        return vjp_fn((dm, dd, dc, dcol, dop))

    timeit("preprocess vjp", preproc_vjp, means, scales, rots, opac, shs,
           d_m2d, d_depthn, d_conic, d_color, d_opacn)

    # cotangent pad + plane repack
    gx, gy = (W + 15) // 16, (H + 15) // 16
    hp, wp = gy * 16, gx * 16
    dcol3 = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))

    def pad_cots(dcolor):
        dC = jnp.zeros((3, hp, wp), jnp.float32).at[:, :H, :W].set(dcolor)
        return dC

    timeit("cotangent pad", pad_cots, dcol3)


if __name__ == "__main__":
    main()


def profile_reduce_variants():
    """Compare the 11-op-sort vs 2-op-sort+row-gather reductions."""
    from guidedvd3dgs_tpu.ops import raster_tiles as rt
    from bench import make_camera, make_inputs

    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()
    proc = jax.jit(lambda *a: preprocess_gaussians(*a, cam, sh_degree=3))(
        means, scales, rots, opac, shs
    )
    b = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)
    m_pad = b.inst_gauss.shape[0]
    rng = np.random.default_rng(0)
    gi = jnp.asarray(rng.normal(size=(NUM_FIELDS, m_pad)).astype(np.float32))

    timeit("reduce (11-op sort + blocked cumsum)", rt._reduce_per_gaussian, gi, b)


if __name__ == "__main__" and os.environ.get("REDUCE_VARIANTS"):
    profile_reduce_variants()
