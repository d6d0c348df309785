#!/usr/bin/env python
"""Hoist-proof micro-profile of bin_gaussians internals."""
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

ITERS = 8
M = rt.CHUNK * (-(-4 * N // rt.CHUNK))


def timeit(name, fn, *args):
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
    print(f"{name:46s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()
    proc = jax.jit(
        lambda m, s, r, o, sh: preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
    )(means, scales, rots, opac, shs)

    rmx, rmy, rw, rh, count, gx, gy = jax.jit(lambda p: tiling.tile_rects(p, W, H))(proc)
    cum = jnp.cumsum(count)
    offsets = cum - count
    ids_n = jnp.arange(N, dtype=jnp.int32)
    j = jnp.arange(M, dtype=jnp.int32)

    def owner(eps, count, offsets):
        start_marks = jnp.zeros((M,), jnp.int32).at[
            jnp.where(count + (eps > 1e9).astype(jnp.int32) > 0, offsets, M)
        ].max(ids_n + 1, mode="drop")
        return jax.lax.cummax(start_marks) - 1

    timeit("owner scatter-max+cummax", owner, count, offsets)
    g = jax.jit(lambda c, o: owner(jnp.float32(0), c, o))(count, offsets)
    gs = jnp.maximum(g, 0)

    keytab = jnp.stack([rmx, rmy, jnp.maximum(rw, 1), jnp.zeros_like(rmx), offsets,
                        jnp.zeros_like(rmx), jnp.zeros_like(rmx), jnp.zeros_like(rmx)], 1)

    def keygather(eps, keytab, gs):
        kt = keytab[gs + (eps > 1e9).astype(jnp.int32)]
        s = j - kt[:, 4]
        tile_id = (kt[:, 1] + s // kt[:, 2]) * gx + kt[:, 0] + s % kt[:, 2]
        return (tile_id << 21) | kt[:, 3]

    timeit("keytab (M,8) row gather + key math", keygather, keytab, gs)
    keys = jax.jit(lambda kt, gs: keygather(jnp.float32(0), kt, gs))(keytab, gs)

    def sort2(eps, keys, gs):
        return jax.lax.sort((keys + (eps > 1e9).astype(jnp.int32), gs), num_keys=1, is_stable=True)

    timeit("sort (key+payload)", sort2, keys, gs)
    skeys, sgs = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1, is_stable=True))(keys, gs)

    ftab = jnp.concatenate(
        [jnp.stack([proc.means2d[:, 0], proc.means2d[:, 1], proc.conics[:, 0],
                    proc.conics[:, 1], proc.conics[:, 2], proc.opacities,
                    proc.colors[:, 0], proc.colors[:, 1], proc.colors[:, 2],
                    proc.depths] + [jnp.zeros((N,), jnp.float32)] * 6, axis=1),
         jnp.zeros((1, 16), jnp.float32)], axis=0)

    def fgather(eps, ftab, sgs):
        return ftab[jnp.minimum(sgs, N) + (eps > 1e9).astype(jnp.int32)]

    timeit("ftab (M,16) row gather (no T)", fgather, ftab, sgs)

    def fgatherT(eps, ftab, sgs):
        return ftab[jnp.minimum(sgs, N) + (eps > 1e9).astype(jnp.int32)].T

    timeit("ftab row gather + transpose", fgatherT, ftab, sgs)

    def fgather_presort(eps, ftab, gs):
        # monotonic indices (pre-sort owner) — locality probe
        return ftab[jnp.minimum(gs, N) + (eps > 1e9).astype(jnp.int32)]

    timeit("ftab gather MONOTONIC ids (probe)", fgather_presort, ftab, gs)

    def ranges(eps, skeys):
        tile_bounds = (jnp.arange(gx * gy + 1, dtype=jnp.int32) << 21)
        return jnp.searchsorted(skeys + (eps > 1e9).astype(jnp.int32), tile_bounds, side="left")

    timeit("tile ranges searchsorted", ranges, skeys)

    def rects_fn(eps, p):
        p = p._replace(means2d=p.means2d + eps)
        rmx, rmy, rw, rh, count, gx_, gy_ = tiling.tile_rects(p, W, H)
        return rmx, rmy, rw, count, jnp.cumsum(count)

    timeit("rects + cumsum", rects_fn, proc)


if __name__ == "__main__":
    main()
