#!/usr/bin/env python
"""Round-2 stage profiler at the BENCH configuration (M = demand*1.3).

Times each sub-stage of the production pipeline separately:
  preprocess fwd / vjp, table build, expand kernel, binning sort,
  post-sort assembly, fwd blend kernel, bwd blend kernel, reduce sort,
  segsum — plus the composed fwd and fwd+bwd for cross-checking.
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
from guidedvd3dgs_tpu.ops import expand, segsum, tiling
from guidedvd3dgs_tpu.ops import raster_tiles as rt
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians

ITERS = 8
GX, GY = (W + 15) // 16, (H + 15) // 16
NUM_TILES = GX * GY


def timeit(name, fn, *args):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(carry * 0.0, *a)
            leaves = [
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
                if hasattr(x, "astype")
            ]
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
    ms = best / ITERS * 1000.0
    print(f"{name:40s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()
    bg = jnp.zeros((3,), jnp.float32)

    proc = jax.jit(
        lambda m, s, r, o, sh: preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
    )(means, scales, rots, opac, shs)
    demand = int(jnp.sum(jnp.where(proc.radii > 0, tiling.tile_rects(proc, W, H)[4], 0)))
    M = -(-int(demand * 1.3) // 1024) * 1024
    print(f"demand={demand} M={M}")

    # --- preprocess ---
    timeit("preprocess fwd", lambda e, m, s, r, o, sh: preprocess_gaussians(
        m + e, s, r, o, sh, cam, sh_degree=3), means, scales, rots, opac, shs)

    def pre_vjp_apply(e, m, s, r, o, sh):
        def f(m2, s2, r2, o2, sh2):
            p = preprocess_gaussians(m2, s2, r2, o2, sh2, cam, sh_degree=3)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)
        out, vjp = jax.vjp(f, m + e, s, r, o, sh)
        cts = tuple(jnp.ones_like(x) for x in out)
        return vjp(cts)

    timeit("preprocess fwd+vjp(apply)", pre_vjp_apply, means, scales, rots, opac, shs)

    # --- fused Pallas preprocess (the round-3 production path) ---
    from guidedvd3dgs_tpu.ops import preprocess_pallas as pf

    timeit("preprocess FUSED fwd", lambda e, m, s, r, o, sh: pf.preprocess_fused_fwd(
        m + e, s, r, o, sh, cam, 3, 1.0), means, scales, rots, opac, shs)

    cot10 = jnp.ones((10, N), jnp.float32)
    timeit("preprocess FUSED bwd", lambda e, m, s, r, o, sh: pf.preprocess_fused_bwd(
        m + e, s, r, o, sh, cam, 3, 1.0, cot10), means, scales, rots, opac, shs)

    # --- binning stages ---
    def full_binning(e, p):
        p = p._replace(means2d=p.means2d + e)
        return tiling.bin_gaussians(p, W, H, M)

    binning = jax.jit(lambda p: tiling.bin_gaussians(p, W, H, M))(proc)
    timeit("binning TOTAL", full_binning, proc)

    # table build only (everything before expand_instances)
    def table_build(e, p):
        p = p._replace(means2d=p.means2d + e)
        n = p.means2d.shape[0]
        rmx, rmy, rw, rh, count, gx, gy = tiling.tile_rects(p, W, H)
        from guidedvd3dgs_tpu.ops import cumsum
        count_p = jnp.maximum(count, 1)
        cum = cumsum.cumsum_i32(count_p)
        offsets = cum - count_p
        depth_bits = 21
        dscale = jnp.float32((1 << depth_bits) - 1)
        vis_depth = jnp.where(p.visible, p.depths, jnp.inf)
        dmin = jnp.min(vis_depth)
        dmax = jnp.max(jnp.where(p.visible, p.depths, -jnp.inf))
        dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
        drange = jnp.maximum(dmax - dmin, 1e-6)
        dqf = jnp.clip((p.depths - dmin) / drange, 0.0, 1.0 - 1e-7)
        dq = (dqf * dscale).astype(jnp.int32)
        dq = jnp.where(count > 0, dq, -1)
        npad = -(-n // 128) * 128 + expand.WIN
        body = jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conics[:, 0], p.conics[:, 1], p.conics[:, 2],
            p.opacities, p.colors[:, 0], p.colors[:, 1], p.colors[:, 2],
            p.depths, rmx.astype(jnp.float32), rmy.astype(jnp.float32),
            jnp.maximum(rw, 1).astype(jnp.float32), offsets.astype(jnp.float32),
            dq.astype(jnp.float32), cum.astype(jnp.float32)], axis=0)
        return body, cum

    timeit("  table build (rects+cumsum+stack)", table_build, proc)

    tab, cum = jax.jit(lambda p: table_build(jnp.float32(0.0), p))(proc)
    tabp = jnp.concatenate([tab, jnp.zeros((16, -(-N // 128) * 128 + expand.WIN - N), jnp.float32)], axis=1)

    def expand_only(e, tab, cum):
        n = N
        depth_bits = 21
        dead_key = NUM_TILES << depth_bits
        return expand.expand_instances(tab + e, cum, M, n, GX, NUM_TILES, depth_bits, dead_key)

    timeit("  expand kernel", expand_only, tabp, cum)

    fields, keys, gs, tile_count = jax.jit(
        lambda t, c: expand_only(jnp.float32(0.0), t, c))(tabp, cum)

    pad_cap = -(-NUM_TILES * 128 // 1024) * 1024
    zcol = jnp.zeros((pad_cap,), jnp.float32)

    def sort_only(e, fields, keys, gs):
        key_op = jnp.concatenate([keys + (e * 0).astype(jnp.int32), jnp.full((pad_cap,), 123, jnp.int32)])
        gs_op = jnp.concatenate([gs, jnp.full((pad_cap,), N, jnp.int32)])
        cat = lambda i: jnp.concatenate([fields[i], zcol])
        p0 = tiling._pack_f16(cat(tiling.F_OP), cat(tiling.F_R))
        p1 = tiling._pack_f16(cat(tiling.F_G), cat(tiling.F_B))
        ops = (key_op, gs_op) + tuple(cat(i) for i in range(tiling.F_OP)) + (p0, p1)
        return jax.lax.sort(ops, num_keys=1, is_stable=True)

    timeit("  binning sort (9 operands)", sort_only, fields, keys, gs)

    def sort2_only(e, keys):
        key_op = jnp.concatenate([keys + (e * 0).astype(jnp.int32), jnp.full((pad_cap,), 123, jnp.int32)])
        idx = jax.lax.broadcasted_iota(jnp.int32, (key_op.shape[0], 1), 0)[:, 0]
        return jax.lax.sort((key_op, idx), num_keys=1, is_stable=True)

    timeit("  [alt] sort (key+idx only)", sort2_only, keys)

    sorted_ops = jax.jit(lambda f, k, g: sort_only(jnp.float32(0.0), f, k, g))(fields, keys, gs)

    def assemble(e, sorted_ops):
        op_row, r_row = tiling._unpack_f16(sorted_ops[7])
        g_row, b_row = tiling._unpack_f16(sorted_ops[8])
        field_rows = list(sorted_ops[2:7]) + [op_row, r_row, g_row, b_row]
        m_pad = M + pad_cap
        dq_sorted = (sorted_ops[0] & jnp.int32((1 << 21) - 1)).astype(jnp.float32)
        depth_row = dq_sorted * 1e-6 + e
        ones_row = jnp.ones((1, m_pad), jnp.float32)
        return jnp.concatenate([
            jnp.stack(field_rows, axis=0), depth_row[None], ones_row,
            jnp.zeros((5, m_pad), jnp.float32)], axis=0)

    timeit("  post-sort assembly", assemble, sorted_ops)

    # --- blend kernels --- (inst_data is int32 in packed mode: perturb by
    # xor-ing a zero so the scan can't hoist, keeping bit patterns intact)
    def jiggle(inst, e):
        return inst ^ (e * 0).astype(jnp.int32)

    # depth_bits is a STATIC field of TileBinning, but `binning` came out of
    # a jitted call, which turned it into a traced scalar — rebuild the
    # static value (21 bits at this tile count, tiling.bin_gaussians)
    dp = dict(depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
              depth_bits=21)

    def fwd_kernel_only(e, b_inst, b_start, b_count):
        return rt._run_fwd(jiggle(b_inst, e), b_start, b_count, bg, GX, GY, **dp)

    timeit("fwd blend kernel", fwd_kernel_only, binning.inst_data,
           binning.tile_start, binning.tile_count)

    C, D, A = jax.jit(lambda i, s, c: rt._run_fwd(i, s, c, bg, GX, GY, **dp))(
        binning.inst_data, binning.tile_start, binning.tile_count)
    dC, dD, dA = jnp.ones_like(C), jnp.ones_like(D), jnp.ones_like(A)

    def bwd_kernel_only(e, inst, start, count, C, D, A):
        return rt._run_bwd(jiggle(inst, e), start, count, C, D, A, dC, dD, dA,
                           GX, GY, **dp)

    timeit("bwd blend kernel", bwd_kernel_only, binning.inst_data,
           binning.tile_start, binning.tile_count, C, D, A)

    grad_inst = jax.jit(
        lambda i, s, c, C, D, A: rt._run_bwd(i, s, c, C, D, A, dC, dD, dA,
                                             GX, GY, **dp)
    )(binning.inst_data, binning.tile_start, binning.tile_count, C, D, A)

    def reduce_sort_only(e, grad_inst, inst_gauss):
        packed = tuple(jiggle(grad_inst[i], e) for i in range(5))
        return jax.lax.sort((inst_gauss,) + packed, num_keys=1, is_stable=True)

    timeit("reduce sort (6 operands)", reduce_sort_only, grad_inst, binning.inst_gauss)

    sorted_r = jax.jit(lambda g, ig: reduce_sort_only(jnp.float32(0.0), g, ig))(
        grad_inst, binning.inst_gauss)

    def segsum_only(e, sorted_r):
        rows = []
        for i in range(5):
            a, b = tiling._unpack_bf16(sorted_r[1 + i])
            rows.extend((a + e, b))
        return segsum.segment_sum_sorted(
            sorted_r[0], tuple(rows), N, precision=jax.lax.Precision.DEFAULT)

    timeit("segsum", segsum_only, sorted_r)

    # --- composed ---
    def loss(m, s, r, o, sh):
        out = rt.rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3, max_instances=M)
        return out.color.sum() + 0.1 * out.depth.sum() + 0.1 * out.alpha.sum()

    timeit("FULL fwd", lambda e, m, s, r, o, sh: loss(m + e, s, r, o, sh),
           means, scales, rots, opac, shs)
    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
    timeit("FULL fwd+bwd", lambda e, m, s, r, o, sh: vg(m + e, s, r, o, sh),
           means, scales, rots, opac, shs)


if __name__ == "__main__":
    main()
