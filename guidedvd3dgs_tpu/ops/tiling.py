"""Tile binning for the Pallas rasterizer (L1).

Replaces the reference's CUDA duplicate-and-radix-sort binning
(reference: cuda_rasterizer/rasterizer_impl.cu:278-321) with static-shape XLA
primitives: per-Gaussian tile rects (getRect semantics, reference:
auxiliary.h getRect), instance expansion by a searchsorted gather (each of
the M fixed instance slots binary-searches the cumulative tile-count array
for its owning Gaussian — no per-Gaussian tile cap, matching the reference's
uncapped duplication), a packed single-key `lax.sort` by (tile_id, depth),
searchsorted tile ranges, and a gather of per-instance render fields into a
field-major (NUM_FIELDS, M) array whose layout feeds the Pallas blend kernel
with aligned lane-dim DMAs.

Capacity: the only remaining cap is the fixed instance buffer M
(`max_instances`). When the true instance count exceeds M the overflow count
is reported in `TileBinning.overflow` (threaded out through the render API so
trainers can regrow + recompile); the reference sizes its buffer exactly and
never drops (rasterizer_impl.cu:278-309).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.ops.projection import ProcessedGaussians

TILE = 16  # matches reference BLOCK_X/BLOCK_Y (config.h:16-17)
CHUNK = 128  # kernel streaming granularity; tile segments are CHUNK-aligned
NUM_FIELDS = 16  # packed per-instance rows (10 used, padded for tiling)
# field row indices in the packed instance array
F_MX, F_MY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B, F_D = range(10)


class TileBinning(NamedTuple):
    inst_data: jnp.ndarray  # (NUM_FIELDS, M) float32, packed render fields
    inst_gauss: jnp.ndarray  # (M,) int32 gaussian index (N => padding)
    tile_start: jnp.ndarray  # (num_tiles,) int32
    tile_count: jnp.ndarray  # (num_tiles,) int32
    num_instances: jnp.ndarray  # () int32 total real instances (pre-drop)
    overflow: jnp.ndarray  # () int32 instances dropped by capacity
    gauss_offset: jnp.ndarray  # (N,) int32 exclusive per-Gaussian instance cumsum
    gauss_cum: jnp.ndarray  # (N,) int32 inclusive per-Gaussian instance cumsum
    grid_x: int
    grid_y: int


def tile_rects(proc: ProcessedGaussians, width: int, height: int):
    """Per-Gaussian tile rectangle (reference: auxiliary.h getRect)."""
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    r = proc.radii.astype(jnp.float32)
    x, y = proc.means2d[:, 0], proc.means2d[:, 1]
    rect_min_x = jnp.clip(((x - r) / TILE).astype(jnp.int32), 0, gx)
    rect_min_y = jnp.clip(((y - r) / TILE).astype(jnp.int32), 0, gy)
    rect_max_x = jnp.clip(((x + r + TILE - 1) / TILE).astype(jnp.int32), 0, gx)
    rect_max_y = jnp.clip(((y + r + TILE - 1) / TILE).astype(jnp.int32), 0, gy)
    w = jnp.maximum(rect_max_x - rect_min_x, 0)
    h = jnp.maximum(rect_max_y - rect_min_y, 0)
    count = jnp.where(proc.radii > 0, w * h, 0)
    return rect_min_x, rect_min_y, w, h, count, gx, gy


def bin_gaussians(
    proc: ProcessedGaussians,
    width: int,
    height: int,
    max_instances: int,
) -> TileBinning:
    n = proc.means2d.shape[0]
    rmx, rmy, rw, rh, count, gx, gy = tile_rects(proc, width, height)
    cum = jnp.cumsum(count)  # inclusive
    offsets = cum - count  # exclusive
    total = cum[-1]
    num_tiles = gx * gy

    # single int32 sort key: tile_id in the high bits, depth quantized into
    # the rest (the CUDA reference packs tile<<32|depth into 64-bit keys,
    # rasterizer_impl.cu:290-309; 32-bit lanes are what the TPU sorts fast)
    depth_bits = min(31 - max(int(np.ceil(np.log2(num_tiles + 1))), 1), 22)
    dscale = jnp.float32((1 << depth_bits) - 1)
    vis_depth = jnp.where(proc.visible, proc.depths, jnp.inf)
    dmin = jnp.min(vis_depth)
    dmax = jnp.max(jnp.where(proc.visible, proc.depths, -jnp.inf))
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
    drange = jnp.maximum(dmax - dmin, 1e-6)
    dq = jnp.clip((proc.depths - dmin) / drange, 0.0, 1.0 - 1e-7)
    dq = (dq * dscale).astype(jnp.int32)

    m = max_instances
    pad_key = jnp.int32(num_tiles << depth_bits)

    # Instance expansion: slot j belongs to the Gaussian g whose cumulative-
    # count interval contains j (no per-Gaussian tile cap — the reference
    # duplicates uncapped, rasterizer_impl.cu:278-309). Owner lookup via
    # scatter-max of Gaussian ids at range starts + an inclusive cummax —
    # measured ~5 ms at 4M slots vs ~70 ms for a binary-search
    # searchsorted (random gathers are the expensive primitive on TPU).
    j = jnp.arange(m, dtype=jnp.int32)
    ids_n = jnp.arange(n, dtype=jnp.int32)
    start_marks = jnp.zeros((m,), jnp.int32).at[
        jnp.where(count > 0, offsets, m)
    ].max(ids_n + 1, mode="drop")
    g = jax.lax.cummax(start_marks) - 1  # owner id per slot, -1 before first range
    real = (j < jnp.minimum(total, m)) & (g >= 0)
    gs = jnp.where(real, g, 0)

    # ONE row gather of the per-Gaussian key ingredients (a single wide row
    # gather is ~4x cheaper than independent 1D gathers). The rect is packed
    # into one int32 (10 bits each — grids up to 1024 tiles/side), so a row
    # is 16 bytes: [packed rect, depth key, instance offset, pad].
    rect_packed = (rmx << 20) | (rmy << 10) | jnp.maximum(rw, 1)
    keytab = jnp.stack(
        [rect_packed, dq, offsets, jnp.zeros_like(rmx)], axis=1
    )  # (N, 4) int32
    kt = keytab[gs]
    k_rmx = kt[:, 0] >> 20
    k_rmy = (kt[:, 0] >> 10) & 0x3FF
    k_rw = kt[:, 0] & 0x3FF
    s = j - kt[:, 2]  # row-major rect position within the Gaussian's rect
    # s // rw and s % rw via exact float math: the VPU has no integer
    # divide (vector int div lowers to a slow expansion, measured ~35 ms at
    # 4M lanes). (s + 0.5) / rw floors exactly for 0 <= s < 2^22, rw >= 1.
    q = jnp.floor((s.astype(jnp.float32) + 0.5) / k_rw.astype(jnp.float32)).astype(jnp.int32)
    rem = s - q * k_rw
    tile_id = (k_rmy + q) * gx + k_rmx + rem
    key = (tile_id << depth_bits) | kt[:, 1]
    keys = jnp.where(real, key, pad_key)
    inst_gauss = jnp.where(real, gs, n)

    keys, inst_gauss = jax.lax.sort((keys, inst_gauss), num_keys=1, is_stable=True)

    tile_bounds = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits)
    starts = jnp.searchsorted(keys, tile_bounds, side="left").astype(jnp.int32)
    sort_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    # Re-scatter each tile's (sorted) segment to a CHUNK-aligned start so
    # every CHUNK-sized block of the instance buffer belongs to exactly one
    # tile. The blend kernels then stream whole chunks with no inter-tile
    # seams: the backward writes its per-instance gradients as pure DMA
    # stores (no read-modify-write at chunk boundaries). Padding slots point
    # at gaussian id n (zero fields -> alpha 0 -> no contribution).
    m_pad = m + num_tiles * CHUNK
    aligned = ((tile_count + CHUNK - 1) // CHUNK) * CHUNK
    tile_start = jnp.cumsum(aligned) - aligned  # exclusive, CHUNK-aligned
    # Each instance moves right by the total padding inserted before its
    # tile: pad_before = tile_start - sort_start, non-decreasing over tiles.
    # Broadcast it per-instance WITHOUT a per-lane table gather (random
    # gathers at M lanes cost ~10+ ms): scatter pad_before at each tile's
    # first sorted slot, then a running max over the tile-sorted slots.
    # Empty tiles share a start slot; max keeps the latest (largest) delta,
    # which is the one the instance actually belongs to.
    pad_before = tile_start - sort_start
    delta = jnp.zeros((m,), jnp.int32).at[sort_start].max(pad_before, mode="drop")
    delta = jax.lax.cummax(delta)
    num_real = starts[num_tiles]  # pads sort after every real key
    newpos = jnp.where(j < num_real, j + delta, m_pad)
    inst_gauss = jnp.full((m_pad,), n, jnp.int32).at[newpos].set(
        inst_gauss, mode="drop"
    )

    # ONE row gather of the packed render fields from an (N+1, NUM_FIELDS)
    # table (row n = zeros, read by padding slots), then relayout to
    # field-major (NUM_FIELDS, M): HBM lane dim = M so per-chunk kernel DMAs
    # are 128-aligned (16, CHUNK) blocks (Mosaic cannot slice a 16-lane-wide
    # (M, 16) buffer)
    zcol = jnp.zeros((n,), jnp.float32)
    ftab = jnp.stack(
        [
            proc.means2d[:, 0], proc.means2d[:, 1],
            proc.conics[:, 0], proc.conics[:, 1], proc.conics[:, 2],
            proc.opacities,
            proc.colors[:, 0], proc.colors[:, 1], proc.colors[:, 2],
            proc.depths,
        ]
        + [zcol] * (NUM_FIELDS - 10),
        axis=1,
    )  # (N, NUM_FIELDS), column order == F_* indices
    ftab = jnp.concatenate([ftab, jnp.zeros((1, NUM_FIELDS), jnp.float32)], axis=0)
    fields = ftab[inst_gauss].T  # (NUM_FIELDS, M)

    return TileBinning(
        inst_data=fields,
        inst_gauss=inst_gauss,
        tile_start=tile_start,
        tile_count=tile_count,
        num_instances=total.astype(jnp.int32),
        overflow=jnp.maximum(total - m, 0).astype(jnp.int32),
        gauss_offset=offsets,
        gauss_cum=cum,
        grid_x=gx,
        grid_y=gy,
    )
