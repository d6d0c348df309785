#!/usr/bin/env python
"""Stage-by-stage timing of the tile raster pipeline at bench scale.

Hoist-proof: every stage folds the scan carry into its inputs so XLA cannot
move work out of the timing loop (loop-invariant args would otherwise be
computed once and make stages look ITERS x cheaper).
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
M = 1024 * (-(-4 * N // 1024))  # lcm of expand.BLK and segsum.BBLK


def timeit(name, fn, *args):
    """fn(eps, *args) with eps a traced ~0.0 scalar the fn must fold in."""

    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(carry * 0.0, *a)
            leaves = [
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree.leaves(out)
                if hasattr(x, "astype")
            ]
            s = jnp.stack(leaves).sum()
            return s * 1e-30, s

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

    def preproc(eps, m, s, r, o, sh):
        return preprocess_gaussians(m + eps, s, r, o, sh, cam, sh_degree=3)

    proc = jax.jit(lambda m, s, r, o, sh: preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3))(
        means, scales, rots, opac, shs
    )
    timeit("preprocess fwd", preproc, means, scales, rots, opac, shs)

    def preproc_vjp(eps, m, s, r, o, sh):
        def f(m, s, r, o, sh):
            p = preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)

        out, vjp_fn = jax.vjp(f, m + eps, s, r, o, sh)
        cots = tuple(jnp.ones_like(x) for x in out)
        return vjp_fn(cots)

    timeit("preprocess fwd+vjp", preproc_vjp, means, scales, rots, opac, shs)

    def binn(eps, p):
        p = p._replace(means2d=p.means2d + eps)
        b = tiling.bin_gaussians(p, W, H, M)
        return (b.inst_data, b.tile_start, b.tile_count, b.overflow)

    b = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)
    print(f"{'':34s} overflow={int(b.overflow)} demand={int(b.num_instances)}", flush=True)
    timeit("binning", binn, proc)

    def fwdk(eps, i, ts, tc):
        return rt._run_fwd(i + eps, ts, tc, bg, GX, GY)

    C, D, A = jax.jit(lambda i, ts, tc: rt._run_fwd(i, ts, tc, bg, GX, GY))(
        b.inst_data, b.tile_start, b.tile_count
    )
    timeit("fwd kernel only", fwdk, b.inst_data, b.tile_start, b.tile_count)

    dC, dD, dA = jnp.ones_like(C), jnp.ones_like(D) * 0.1, jnp.ones_like(A) * 0.1

    def bwdk(eps, i, ts, tc, c, d, a):
        return rt._run_bwd(i, ts, tc, c + eps, d, a, dC, dD, dA, GX, GY)

    timeit("bwd kernel only", bwdk, b.inst_data, b.tile_start, b.tile_count, C, D, A)

    def full_fwd(eps, m, s, r, o, sh):
        out = rt.rasterize_tiles(m + eps, s, r, o, sh, cam, bg, sh_degree=3)
        return out.color.sum() + 0.1 * out.depth.sum() + 0.1 * out.alpha.sum()

    timeit("full fwd", full_fwd, means, scales, rots, opac, shs)

    def full_fwd_bwd(eps, m, s, r, o, sh):
        vg = jax.value_and_grad(
            lambda m, s, r, o, sh: rt.rasterize_tiles(
                m, s, r, o, sh, cam, bg, sh_degree=3
            ).color.sum(),
            argnums=(0, 1, 2, 3, 4),
        )
        return vg(m + eps, s, r, o, sh)

    timeit("full fwd+bwd", full_fwd_bwd, means, scales, rots, opac, shs)


if __name__ == "__main__":
    main()
