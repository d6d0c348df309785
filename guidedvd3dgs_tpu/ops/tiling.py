"""Tile binning for the Pallas rasterizer (L1).

Replaces the reference's CUDA duplicate-and-radix-sort binning
(reference: cuda_rasterizer/rasterizer_impl.cu:278-321) with a
streaming-only TPU pipeline. Random-access row primitives (gather/scatter)
cost 30-250 ms at instance scale on TPU while k-operand sorts cost
4.3 + ~1.2/operand ms (tools/profile_prims.py), so per-instance data is
never gathered:

  1. per-Gaussian tile rects (getRect semantics, reference auxiliary.h)
     with count' = max(count, 1) so EVERY Gaussian owns >= 1 expansion
     slot (invisible ones get a dead slot that sorts to the unused tail);
     this bounds the owner-id span of any slot block and enables the
     streaming expansion kernel (ops/expand.py)
  2. expansion kernel: one pass producing per-instance render fields,
     sort keys (tile_id << depth_bits | quantized depth; the CUDA
     reference packs tile<<32|depth into 64-bit keys) and owner ids
  3. per-tile counts from the expansion kernel's fused one-hot histogram
     -> CHUNK-aligned segment starts; alignment pad instances are
     synthesized with per-tile keys that sort after every real instance
     of their tile
  4. one 11-operand stable sort carries key + owner + 9 render fields
     into tile-major depth order AND aligned layout in one shot; the
     depth field is reconstructed from the sorted key's quantized-depth
     bits rather than carried as a payload (sorts cost ~1.2 ms/operand
     at M=2.5M).

Every CHUNK-sized block of the final instance buffer belongs to exactly
one tile, so the backward kernel writes per-instance gradients as pure
DMA stores (no atomics, no read-modify-write; reference backward.cu uses
atomicAdd).

Capacity: the fixed instance buffer M (`max_instances`, multiple of
expand.BLK). When total demand exceeds M the overflow count is reported
in `TileBinning.overflow` (threaded through the render API so trainers
regrow + recompile); the reference sizes its buffer exactly and never
drops (rasterizer_impl.cu:278-309).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.ops import cumsum, expand, segsum
from guidedvd3dgs_tpu.ops.projection import ProcessedGaussians

import math as _math
import os as _os

TILE = 16  # matches reference BLOCK_X/BLOCK_Y (config.h:16-17)
# kernel streaming granularity; tile segments are CHUNK-aligned.
# Env override for on-chip tuning sweeps.
CHUNK = int(_os.environ.get("GVD_RASTER_CHUNK", "128"))
# Capacity / padding quantum: buffer sizes must be simultaneously block
# multiples of the expand grid, the segsum grid, and the raster chunk.
# Derived (not the historic literal 1024) so the GVD_* env overrides cannot
# silently mis-size the kernel grids (ADVICE r2 #3).
QUANTUM = _math.lcm(expand.BLK, segsum.BBLK, CHUNK, 128)
# Carry opacity+RGB through the binning sort as two f16-packed int32
# payloads instead of four f32 operands (sort payloads cost ~2.2 ms each at
# M=2.5M). f16 keeps ~2^-11 relative on values in [0, ~4] — far below the
# 8-bit render targets. Parity tests against the exact dense oracle switch
# this off via set_pack_fields.
_PACK_FIELDS = [True]
# E1 binning sort: payload-free (key, iota) sort + one packed row gather
# instead of dragging 7 payload operands through every bitonic pass.
# Bit-exact vs the 9-operand sort (stable ties == iota order; on-chip
# parity 0 mismatches, E1_SORT_STUDY.json) and ON by default: controlled
# interleaved A/B on the full fwd+bwd bench reads 67.5/67.6 (on) vs
# 69.6/69.6 (off) — a consistent ~2.1 ms win, matching the isolated
# study's +1.5 ms. (A single earlier on-reading of 72.3 ms did not
# reproduce under interleaving — chip-state drift, see PERF_NOTES bench
# variance addendum.) Disable with GVD_E1_SORT=0.
_E1_SORT = [_os.environ.get("GVD_E1_SORT", "1") != "0"]


def set_pack_fields(flag: bool) -> None:
    _PACK_FIELDS[0] = flag


_F16_MAX = 65504.0  # largest finite f16


def _pack_f16(a: "jnp.ndarray", b: "jnp.ndarray") -> "jnp.ndarray":
    """Two f32 rows -> one int32 row of (f16(a) << 16) | f16(b). Inputs are
    clamped to the finite f16 range first: astype(float16) saturates |x| >
    65504 to inf, and the in-kernel integer decode (raster_tiles.
    _f16_bits_to_f32) maps e==31 bit patterns to large FINITE values — an
    exploding color/opacity must propagate as a huge finite value (still
    trips the NaN/Inf guard-rails downstream via the loss), never as a
    silently-wrong small one."""
    a = jnp.clip(a, -_F16_MAX, _F16_MAX)
    b = jnp.clip(b, -_F16_MAX, _F16_MAX)
    ah = jax.lax.bitcast_convert_type(a.astype(jnp.float16), jnp.uint16)
    bh = jax.lax.bitcast_convert_type(b.astype(jnp.float16), jnp.uint16)
    return (ah.astype(jnp.int32) << 16) | bh.astype(jnp.int32)


def _unpack_f16(p: "jnp.ndarray"):
    au = jnp.right_shift(p, 16).astype(jnp.uint16)
    bu = (p & 0xFFFF).astype(jnp.uint16)
    a = jax.lax.bitcast_convert_type(au, jnp.float16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(bu, jnp.float16).astype(jnp.float32)
    return a, b


def _pack_bf16(a: "jnp.ndarray", b: "jnp.ndarray") -> "jnp.ndarray":
    """Two f32 rows -> one int32 row of (bf16(a) << 16) | bf16(b); bf16
    keeps the full f32 exponent range (gradients span many decades)."""
    ah = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    bh = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    return (ah.astype(jnp.int32) << 16) | bh.astype(jnp.int32)


def _unpack_bf16(p: "jnp.ndarray"):
    au = jnp.right_shift(p, 16).astype(jnp.uint16)
    bu = (p & 0xFFFF).astype(jnp.uint16)
    a = jax.lax.bitcast_convert_type(au, jnp.bfloat16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(bu, jnp.bfloat16).astype(jnp.float32)
    return a, b


NUM_FIELDS = 16  # exact-mode per-instance rows (11 used, padded for tiling)
# field row indices in the exact-mode instance array; F_ONE is a constant-1
# row so the blend kernels can fuse [colors, depth, 1] x w accumulations
# into a single MXU matmul (alpha accumulation rides the ones row)
F_MX, F_MY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_D, F_ONE = range(11)
# packed-mode rows (all int32): bitcast f32 geometry + two f16 pairs + key
NP_FIELDS = 8
P_MX, P_MY, P_CA, P_CB, P_CC, P_OPR, P_GB, P_KEY = range(8)


class TileBinning(NamedTuple):
    # packed mode (_PACK_FIELDS): (NP_FIELDS, M_pad) int32 — rows 0-4 are
    # bitcast f32 mx/my/ca/cb/cc, row 5 = f16(op)|f16(r), row 6 =
    # f16(g)|f16(b), row 7 = sort key (depth in low bits); the blend
    # kernels unpack in-register, so the post-sort assembly is one stack
    # of sort outputs with no unpack/repack pass and the kernel DMA
    # stream is half the 16-row layout.
    # exact mode: (NUM_FIELDS, M_pad) float32 unpacked render fields.
    inst_data: jnp.ndarray
    inst_gauss: jnp.ndarray  # (M_pad,) int32 gaussian index (N => padding)
    tile_start: jnp.ndarray  # (num_tiles,) int32, CHUNK-aligned
    tile_count: jnp.ndarray  # (num_tiles,) int32
    num_instances: jnp.ndarray  # () int32 total slots incl. dead (demand)
    overflow: jnp.ndarray  # () int32 instances dropped by capacity
    gauss_offset: jnp.ndarray  # (N,) int32 exclusive per-Gaussian slot cumsum
    gauss_cum: jnp.ndarray  # (N,) int32 inclusive per-Gaussian slot cumsum
    grid_x: int
    grid_y: int
    # depth dequantization for packed mode: depth = dmin + (dq + 0.5) * dstep
    depth_dmin: Optional[jnp.ndarray] = None  # () f32
    depth_dstep: Optional[jnp.ndarray] = None  # () f32
    depth_bits: int = 0  # static; 0 => exact (unpacked) layout


def tile_rects(proc: ProcessedGaussians, width: int, height: int, n_cams: int = 1):
    """Per-Gaussian tile rectangle (reference: auxiliary.h getRect), using
    the tight per-axis alpha-level-set extents (ProcessedGaussians.ext_x)
    instead of the reference's square 3-sigma radius. Output-identical:
    every pixel cut by the tighter rect has alpha < 1/255 and is dropped by
    the blend threshold anyway; instance demand shrinks ~25-45%.

    Multi-camera mode (n_cams > 1): proc holds n_cams cameras' preprocess
    outputs concatenated along N, each camera's means2d.y offset by
    c * gy_cam * TILE — one virtual framebuffer of vertically stacked
    camera bands, so ONE expand/sort/blend chain serves every camera.
    The y-rect is clamped to the owning camera's tile-row band so a
    Gaussian at a band edge never bleeds into the next camera's tiles."""
    gx = (width + TILE - 1) // TILE
    gy_cam = (height + TILE - 1) // TILE
    gy = gy_cam * n_cams
    ex, ey = proc.ext_x, proc.ext_y
    x, y = proc.means2d[:, 0], proc.means2d[:, 1]
    if n_cams > 1:
        npc = x.shape[0] // n_cams
        lo_y = (jnp.arange(x.shape[0], dtype=jnp.int32) // npc) * gy_cam
        hi_y = lo_y + gy_cam
    else:
        lo_y = 0
        hi_y = gy
    # Tight rect = floor/floor+1 tile bounds of the level-set bbox (the
    # reference's `(v + TILE - 1) / TILE` idiom is a ceil only for integer
    # radii; with float extents v = 0.55 must still cover tile 0), then
    # intersected with the reference getRect so binning is a strict subset
    # of the reference's work: any contributing pixel the intersection drops
    # is one the reference also drops (exact output parity).
    rect_min_x = jnp.clip(jnp.floor((x - ex) / TILE).astype(jnp.int32), 0, gx)
    rect_min_y = jnp.clip(jnp.floor((y - ey) / TILE).astype(jnp.int32), lo_y, hi_y)
    rect_max_x = jnp.clip(jnp.floor((x + ex) / TILE).astype(jnp.int32) + 1, 0, gx)
    rect_max_y = jnp.clip(jnp.floor((y + ey) / TILE).astype(jnp.int32) + 1, lo_y, hi_y)
    r = proc.radii.astype(jnp.float32)
    rect_min_x = jnp.maximum(rect_min_x, jnp.clip(((x - r) / TILE).astype(jnp.int32), 0, gx))
    rect_min_y = jnp.maximum(rect_min_y, jnp.clip(((y - r) / TILE).astype(jnp.int32), lo_y, hi_y))
    rect_max_x = jnp.minimum(rect_max_x, jnp.clip(((x + r + TILE - 1) / TILE).astype(jnp.int32), 0, gx))
    rect_max_y = jnp.minimum(rect_max_y, jnp.clip(((y + r + TILE - 1) / TILE).astype(jnp.int32), lo_y, hi_y))
    w = jnp.maximum(rect_max_x - rect_min_x, 0)
    h = jnp.maximum(rect_max_y - rect_min_y, 0)
    count = jnp.where(proc.radii > 0, w * h, 0)
    return rect_min_x, rect_min_y, w, h, count, gx, gy


def binning_presort(
    proc: ProcessedGaussians,
    width: int,
    height: int,
    max_instances: int,
    n_cams: int = 1,
):
    """Everything bin_gaussians does BEFORE the instance sort: expansion,
    histogram, alignment-pad key synthesis. Returns a dict of the sort
    operands + metadata; factored out so tools/e1_sort_gather_study.py can
    measure alternative sort/permute formulations on the REAL operand
    distribution (PERF_NOTES experiment E1)."""
    n = proc.means2d.shape[0]
    rmx, rmy, rw, rh, count, gx, gy = tile_rects(proc, width, height, n_cams)
    num_tiles = gx * gy
    m = max_instances
    assert m % QUANTUM == 0, (m, QUANTUM)
    # rounded up so m_pad stays a segsum-block multiple; the excess slots
    # fall past every tile's pad quota and get the dead key
    pad_cap = -(-num_tiles * CHUNK // QUANTUM) * QUANTUM
    # integer-valued table rows ride f32 lanes through the expansion kernel
    # and instance positions ride f32 cumsum exactness in the reduce
    assert m + pad_cap < (1 << 24), "instance capacity exceeds f32 exactness"

    # every Gaussian owns >= 1 slot (see module docstring, point 1)
    count_p = jnp.maximum(count, 1)
    cum = cumsum.cumsum_i32(count_p)  # inclusive; exact (total < 2^24)
    offsets = cum - count_p  # exclusive
    total = cum[-1]

    # depth quantization for the sort key (reference packs the full f32
    # depth; (num_tiles+1) << depth_bits must stay below 2^31)
    depth_bits = min(31 - max(int(np.ceil(np.log2(num_tiles + 1))), 1), 22)
    dscale = jnp.float32((1 << depth_bits) - 1)
    vis_depth = jnp.where(proc.visible, proc.depths, jnp.inf)
    dmin = jnp.min(vis_depth)
    dmax = jnp.max(jnp.where(proc.visible, proc.depths, -jnp.inf))
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
    drange = jnp.maximum(dmax - dmin, 1e-6)
    dqf = jnp.clip((proc.depths - dmin) / drange, 0.0, 1.0 - 1e-7)
    dq = (dqf * dscale).astype(jnp.int32)  # <= dscale - 1 < pad-instance key
    dq = jnp.where(count > 0, dq, -1)  # -1 marks dead (invisible) slots
    dead_key = num_tiles << depth_bits

    # per-Gaussian table (16, npad): rows 0-9 render fields, 10-15 rect /
    # offsets / depth-key / cum (ops/expand.py module doc)
    npad = -(-n // 128) * 128 + expand.WIN
    body = jnp.stack(
        [
            proc.means2d[:, 0], proc.means2d[:, 1],
            proc.conics[:, 0], proc.conics[:, 1], proc.conics[:, 2],
            proc.opacities,
            proc.colors[:, 0], proc.colors[:, 1], proc.colors[:, 2],
            proc.depths,
            rmx.astype(jnp.float32),
            rmy.astype(jnp.float32),
            jnp.maximum(rw, 1).astype(jnp.float32),
            offsets.astype(jnp.float32),
            dq.astype(jnp.float32),
            cum.astype(jnp.float32),
        ],
        axis=0,
    )  # (16, n)
    padw = npad - n
    pad_block = jnp.zeros((16, padw), jnp.float32)
    pad_block = pad_block.at[12].set(1.0)  # rw pad = 1: keep the div finite
    pad_block = pad_block.at[15].set(1e30)  # cum pad: never selected as owner
    tab = jnp.concatenate([body, pad_block], axis=1)

    fields, keys, gs, tile_count = expand.expand_instances(
        tab, cum, m, n, gx, num_tiles, depth_bits, dead_key
    )

    # per-tile counts come from the kernel's fused histogram -> aligned starts
    aligned = ((tile_count + CHUNK - 1) // CHUNK) * CHUNK
    tile_start = jnp.cumsum(aligned) - aligned  # exclusive, CHUNK-aligned

    # synthesize alignment pads: pad p belongs to the first tile whose
    # cumulative pad need exceeds p; its key (tile << db | dscale) sorts
    # after every real instance of that tile (real dq <= dscale - 1)
    pad_need = aligned - tile_count
    pcum = jnp.cumsum(pad_need)
    p = jnp.arange(pad_cap, dtype=jnp.int32)
    tile_p = jnp.searchsorted(pcum, p, side="right").astype(jnp.int32)
    tail_key = jnp.where(
        tile_p < num_tiles,
        (tile_p << depth_bits) | jnp.int32((1 << depth_bits) - 1),
        dead_key,
    )

    zcol = jnp.zeros((pad_cap,), jnp.float32)
    # depth is NOT carried through the sort: the sort key already encodes the
    # quantized depth in its low bits, so the F_D row is reconstructed from
    # the sorted keys below (saves one payload operand; sorts cost
    # ~2.2 ms/operand at M=2.5M, tools/profile_raster2.py). Dequantization
    # error <= drange * 2^-depth_bits (~1e-7 relative at 21 bits).
    def cat(i):
        return jnp.concatenate([fields[i], zcol])

    key_op = jnp.concatenate([keys, tail_key])
    gs_op = jnp.concatenate([gs, jnp.full((pad_cap,), n, jnp.int32)])
    m_pad = m + pad_cap
    dstep = drange / dscale
    return dict(
        cat=cat, key_op=key_op, gs_op=gs_op, m_pad=m_pad, n=n, m=m,
        total=total, offsets=offsets, cum=cum, tile_start=tile_start,
        tile_count=tile_count, gx=gx, gy=gy,
        dmin=dmin, dstep=dstep, depth_bits=depth_bits,
    )


def bin_gaussians(
    proc: ProcessedGaussians,
    width: int,
    height: int,
    max_instances: int,
    n_cams: int = 1,
) -> TileBinning:
    """n_cams > 1: proc is the per-camera preprocess outputs concatenated
    along N with banded means2d (see tile_rects); the returned binning's
    grid is (grid_x, n_cams * grid_y_cam) and the blend kernels render all
    cameras in one virtual framebuffer of vertically stacked bands."""
    ps = binning_presort(proc, width, height, max_instances, n_cams)
    cat, key_op, gs_op = ps["cat"], ps["key_op"], ps["gs_op"]
    m_pad, n, m, total = ps["m_pad"], ps["n"], ps["m"], ps["total"]
    offsets, cum = ps["offsets"], ps["cum"]
    tile_start, tile_count = ps["tile_start"], ps["tile_count"]
    gx, gy = ps["gx"], ps["gy"]
    dmin, dstep, depth_bits = ps["dmin"], ps["dstep"], ps["depth_bits"]
    if _PACK_FIELDS[0]:
        # opacity + RGB ride two f16-packed int32 payloads (9 -> 7 payload
        # operands): f16 keeps ~2^-11 relative — invisible against the 8-bit
        # render targets — while means/conics stay exact f32. The sorted
        # operands become the instance buffer AS-IS (geometry rows bitcast
        # to i32, key row carried for in-kernel depth dequantization): no
        # unpack/repack pass, and the blend kernels stream 8 rows not 16.
        p0 = _pack_f16(cat(F_OP), cat(F_R))
        p1 = _pack_f16(cat(F_G), cat(F_B))
        if _E1_SORT[0]:
            # Experiment E1 (E1_SORT_STUDY.json, v5e @1M real keys): carry
            # NO payload through the bitonic sort — a 2-operand (key, iota)
            # sort + ONE (m_pad, 8) row gather, the densify trick
            # (models/gaussians.py _sort_carried). Bit-exact vs the
            # 9-operand form (stable sort ties == iota order; on-chip
            # parity 0 mismatches) and 1.5 ms faster net (20.7 vs 22.25).
            # The reduce-side twin LOSES (16.2 vs 10.3) and keeps payload.
            payload = jnp.stack(
                [gs_op]
                + [
                    jax.lax.bitcast_convert_type(cat(i), jnp.int32)
                    for i in range(F_OP)
                ]
                + [p0, p1],
                axis=1,
            )  # (m_pad, 8) int32
            iota = jnp.arange(m_pad, dtype=jnp.int32)
            sk, perm = jax.lax.sort((key_op, iota), num_keys=1, is_stable=True)
            gt = jnp.take(payload, perm, axis=0).T  # (8, m_pad)
            inst_gauss = gt[0]
            inst_data = jnp.stack(
                [gt[1], gt[2], gt[3], gt[4], gt[5], gt[6], gt[7], sk], axis=0
            )  # (NP_FIELDS, m_pad) int32
        else:
            ops = (key_op, gs_op) + tuple(cat(i) for i in range(F_OP)) + (p0, p1)
            sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
            inst_gauss = sorted_ops[1]
            geom = [
                jax.lax.bitcast_convert_type(sorted_ops[2 + i], jnp.int32)
                for i in range(5)
            ]
            inst_data = jnp.stack(
                geom + [sorted_ops[7], sorted_ops[8], sorted_ops[0]], axis=0
            )  # (NP_FIELDS, m_pad) int32
        return TileBinning(
            inst_data=inst_data,
            inst_gauss=inst_gauss,
            tile_start=tile_start,
            tile_count=tile_count,
            num_instances=total,
            overflow=jnp.maximum(total - m, 0).astype(jnp.int32),
            gauss_offset=offsets,
            gauss_cum=cum,
            grid_x=gx,
            grid_y=gy,
            depth_dmin=dmin,
            depth_dstep=dstep,
            depth_bits=depth_bits,
        )
    ops = (key_op, gs_op) + tuple(cat(i) for i in range(F_D))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    field_rows = list(sorted_ops[2:])
    inst_gauss = sorted_ops[1]
    dq_sorted = (sorted_ops[0] & jnp.int32((1 << depth_bits) - 1)).astype(
        jnp.float32
    )
    depth_row = dmin + (dq_sorted + 0.5) * dstep
    ones_row = jnp.ones((1, m_pad), jnp.float32)  # F_ONE: fused-accumulate row
    inst_data = jnp.concatenate(
        [
            jnp.stack(field_rows, axis=0),
            depth_row[None],
            ones_row,
            jnp.zeros((5, m_pad), jnp.float32),
        ],
        axis=0,
    )  # (NUM_FIELDS, m_pad); HBM lane dim = m_pad for 128-aligned kernel DMAs

    return TileBinning(
        inst_data=inst_data,
        inst_gauss=inst_gauss,
        tile_start=tile_start,
        tile_count=tile_count,
        num_instances=total,
        overflow=jnp.maximum(total - m, 0).astype(jnp.int32),
        gauss_offset=offsets,
        gauss_cum=cum,
        grid_x=gx,
        grid_y=gy,
    )
