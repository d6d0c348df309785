#!/usr/bin/env python
"""Calibrated stage-by-stage profile of the production raster pipeline at
bench scale (1M splats, 320x448). Uses the readback-based harness from
tools/profile_prims.py (block_until_ready lies through the axon tunnel)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import H, W, make_camera, make_inputs
from tools.profile_prims import calibrate, timeit
from guidedvd3dgs_tpu.ops import expand, raster_tiles as rt, tiling
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
from guidedvd3dgs_tpu.ops.tiling import CHUNK, TILE

GX, GY = (W + TILE - 1) // TILE, (H + TILE - 1) // TILE
M = -(-2_507_008 // 1024) * 1024


def main():
    calibrate()
    cam = make_camera()
    bg = jnp.zeros((3,), jnp.float32)
    means, scales, rots, opac, shs = make_inputs()
    n = means.shape[0]

    def preproc(eps, m_, s_, r_, o_, sh_):
        return preprocess_gaussians(m_ + eps, s_, r_, o_, sh_, cam, sh_degree=3)

    timeit("preprocess fwd", preproc, means, scales, rots, opac, shs)
    proc = jax.jit(lambda *a: preprocess_gaussians(*a, cam, sh_degree=3))(
        means, scales, rots, opac, shs
    )

    def binfull(eps, p):
        p = p._replace(means2d=p.means2d + eps)
        return tiling.bin_gaussians(p, W, H, M)

    timeit("bin_gaussians (full)", binfull, proc)
    b = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)

    def fwdk(eps, inst, ts, tc):
        return rt._run_fwd(inst + eps, ts, tc, bg, GX, GY)

    timeit("fwd kernel (+planes)", fwdk, b.inst_data, b.tile_start, b.tile_count)
    C, D, A = jax.jit(lambda i, ts, tc: rt._run_fwd(i, ts, tc, bg, GX, GY))(
        b.inst_data, b.tile_start, b.tile_count
    )
    dC, dD, dA = jnp.ones_like(C), jnp.ones_like(D) * 0.1, jnp.ones_like(A) * 0.1

    def bwdk(eps, inst, ts, tc, c, d, a):
        return rt._run_bwd(inst + eps, ts, tc, c, d, a, dC, dD, dA, GX, GY)

    kargs = (b.inst_data, b.tile_start, b.tile_count, C, D, A)
    timeit("bwd kernel", bwdk, *kargs)
    gi = jax.jit(lambda *a: rt._run_bwd(*a, dC, dD, dA, GX, GY))(*kargs)

    def reduce(eps, g, ids, cum):
        bb = b._replace(inst_gauss=ids, gauss_cum=cum)
        return rt._reduce_per_gaussian(g + eps, bb)

    timeit("reduce (sort11+cumsum+boundary)", reduce, gi, b.inst_gauss, b.gauss_cum)
    acc = jax.jit(lambda g: rt._reduce_per_gaussian(g, b))(gi)

    def vjp_stage(eps, md, sc, rot, op, sh, a):
        def pre_only(md, sc, rot, op, sh):
            out, _ = rt._preproc_screen(
                md, sc, rot, op, sh, None, None, None, cam, 3, 1.0, None
            )
            return out

        _, f = jax.vjp(pre_only, md + eps, sc, rot, op, sh)
        return f((a[0:2].T, a[rt.F_D], a[2:5].T, a[rt.F_R : rt.F_R + 3].T, a[rt.F_OP]))

    timeit("preprocess vjp (incl re-fwd)", vjp_stage, means, scales, rots, opac, shs, acc)

    # reduce internals
    def sort11(eps, g, ids):
        ops = (ids,) + tuple(g[i] + eps for i in range(10))
        return jax.lax.sort(ops, num_keys=1, is_stable=True)

    timeit("reduce: 11-op sort", sort11, gi, b.inst_gauss)

    def segs(eps, g, ids):
        from guidedvd3dgs_tpu.ops import segsum
        sorted_ops = jax.lax.sort(
            (ids,) + tuple(g[i] for i in range(10)), num_keys=1, is_stable=True
        )
        return segsum.segment_sum_sorted(
            sorted_ops[0], tuple(o + eps for o in sorted_ops[1:]), n
        )

    timeit("reduce: sort11+segsum kernel", segs, gi, b.inst_gauss)

    # binning internals
    num_tiles = GX * GY

    def expand_only(eps, p):
        p = p._replace(means2d=p.means2d + eps)
        rmx, rmy, rw, rh, count, gx, gy = tiling.tile_rects(p, W, H)
        count_p = jnp.maximum(count, 1)
        cum = jnp.cumsum(count_p).astype(jnp.int32)
        offsets = cum - count_p
        depth_bits = 21
        body = jnp.stack(
            [p.means2d[:, 0], p.means2d[:, 1], p.conics[:, 0], p.conics[:, 1],
             p.conics[:, 2], p.opacities, p.colors[:, 0], p.colors[:, 1],
             p.colors[:, 2], p.depths, rmx.astype(jnp.float32),
             rmy.astype(jnp.float32), jnp.maximum(rw, 1).astype(jnp.float32),
             offsets.astype(jnp.float32), jnp.zeros((n,), jnp.float32),
             cum.astype(jnp.float32)], axis=0)
        npad = -(-n // 128) * 128 + expand.WIN
        padw = npad - n
        pad_block = jnp.zeros((16, padw), jnp.float32).at[12].set(1.0).at[15].set(1e30)
        tab = jnp.concatenate([body, pad_block], axis=1)
        return expand.expand_instances(
            tab, cum, M, n, gx, num_tiles, depth_bits, num_tiles << depth_bits
        )

    timeit("binning: rects+table+expand kernel", expand_only, proc)

    fields, keys, gs, tc_ = jax.jit(lambda p: expand_only(jnp.float32(0), p))(proc)

    def sort12(eps, keys, gs, fields):
        pad_cap = num_tiles * CHUNK
        zcol = jnp.zeros((pad_cap,), jnp.float32)
        ops = (
            jnp.concatenate([keys + (eps > 1e9).astype(jnp.int32), jnp.zeros((pad_cap,), jnp.int32)]),
            jnp.concatenate([gs, jnp.full((pad_cap,), n, jnp.int32)]),
        ) + tuple(jnp.concatenate([fields[i], zcol]) for i in range(10))
        return jax.lax.sort(ops, num_keys=1, is_stable=True)

    timeit("binning: tails+12-op sort", sort12, keys, gs, fields)

    sorted_ops = jax.jit(lambda k, g, f: sort12(jnp.float32(0), k, g, f))(keys, gs, fields)

    def stack(eps, ops):
        m_pad = ops[0].shape[0]
        return jnp.concatenate(
            [jnp.stack([o + eps for o in ops[2:]], axis=0),
             jnp.zeros((6, m_pad), jnp.float32)], axis=0)

    timeit("binning: stack to (16,m_pad)", stack, tuple(sorted_ops))


if __name__ == "__main__":
    main()
