#!/usr/bin/env python
"""Micro-profile of bin_gaussians internals: rects+cumsum, searchsorted,
key build, sort, tile ranges, field gather — plus alternatives."""
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
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians

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
    print(f"{name:44s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()
    proc = jax.jit(
        lambda m, s, r, o, sh: preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
    )(means, scales, rots, opac, shs)

    rmx, rmy, rw, rh, count, gx, gy = jax.jit(
        lambda p: tiling.tile_rects(p, W, H)
    )(proc)
    cum = jnp.cumsum(count)

    def rects(p):
        rmx, rmy, rw, rh, count, *_ = tiling.tile_rects(p, W, H)
        return rmx, rmy, rw, count

    timeit("tile rects + cumsum", lambda p: (rects(p), jnp.cumsum(rects(p)[3])), proc)

    j = jnp.arange(M, dtype=jnp.int32)

    def ss_default(cum):
        return jnp.searchsorted(cum, j, side="right")

    timeit("searchsorted scan (default)", ss_default, cum)

    def ss_sort(cum):
        return jnp.searchsorted(cum, j, side="right", method="sort")

    timeit("searchsorted method=sort", ss_sort, cum)

    def ss_scatter(cum, count):
        offsets = cum - count
        ids = jnp.arange(count.shape[0], dtype=jnp.int32)
        starts = jnp.zeros((M,), jnp.int32)
        starts = starts.at[jnp.where(count > 0, offsets, M)].max(
            ids + 1, mode="drop"
        )
        return jax.lax.associative_scan(jnp.maximum, starts) - 1

    timeit("scatter-max + cummax owner", ss_scatter, cum, count)

    g = jax.jit(ss_default)(cum).astype(jnp.int32)

    depth_bits = 21
    dq = jnp.clip(proc.depths, 0, 1)
    dq = (dq * 100).astype(jnp.int32) % (1 << depth_bits)

    def build_keys(g, rmx, rmy, rw, cum, dq):
        offsets = cum - jnp.diff(jnp.concatenate([jnp.zeros(1, cum.dtype), cum]))
        gs = jnp.minimum(g, N - 1)
        s = j - (cum[gs] - jnp.take(cum, gs))  # placeholder math, cost-equivalent
        w_safe = jnp.maximum(rw[gs], 1)
        tile_id = (rmy[gs] + s // w_safe) * gx + rmx[gs] + s % w_safe
        key = (tile_id << depth_bits) | dq[gs]
        return key

    timeit("key build (gathers)", build_keys, g, rmx, rmy, rw, cum, dq)

    keys = jax.jit(build_keys)(g, rmx, rmy, rw, cum, dq)
    gs32 = jnp.minimum(g, N - 1).astype(jnp.int32)

    def sort2(keys, gs):
        return jax.lax.sort((keys, gs), num_keys=1, is_stable=True)

    timeit("lax.sort (key + payload) stable", sort2, keys, gs32)

    def sort2u(keys, gs):
        return jax.lax.sort((keys, gs), num_keys=1, is_stable=False)

    timeit("lax.sort (key + payload) unstable", sort2u, keys, gs32)

    def sort1(keys):
        return jax.lax.sort((keys,), num_keys=1, is_stable=False)

    timeit("lax.sort key only", sort1, keys)

    # field gather
    def gather_fields(gs):
        cols = [
            proc.means2d[gs, 0], proc.means2d[gs, 1],
            proc.conics[gs, 0], proc.conics[gs, 1], proc.conics[gs, 2],
            proc.opacities[gs],
            proc.colors[gs, 0], proc.colors[gs, 1], proc.colors[gs, 2],
            proc.depths[gs],
        ]
        cols += [jnp.zeros((M,), jnp.float32)] * 6
        return jnp.stack(cols, 0)

    timeit("field gather+stack (16, M)", gather_fields, gs32)

    num_tiles = gx * gy
    tile_bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits

    def ranges(keys):
        starts = jnp.searchsorted(keys, tile_bounds, side="left")
        return starts

    timeit("tile ranges searchsorted", ranges, keys)


if __name__ == "__main__":
    main()
