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

    # instance expansion by gather: slot j belongs to the Gaussian g whose
    # cumulative-count interval contains j (no per-Gaussian tile cap — the
    # reference duplicates uncapped, rasterizer_impl.cu:278-309)
    j = jnp.arange(m, dtype=jnp.int32)
    g = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)  # in [0, n]
    real = j < jnp.minimum(total, m)
    gs = jnp.minimum(g, n - 1)
    s = j - offsets[gs]  # row-major rect position within the Gaussian's rect
    w_safe = jnp.maximum(rw[gs], 1)
    tile_id = (rmy[gs] + s // w_safe) * gx + rmx[gs] + s % w_safe
    key = (tile_id << depth_bits) | dq[gs]
    keys = jnp.where(real, key, pad_key)
    inst_gauss = jnp.where(real, gs, n)

    keys, inst_gauss = jax.lax.sort((keys, inst_gauss), num_keys=1, is_stable=True)

    tile_bounds = (jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits)
    starts = jnp.searchsorted(keys, tile_bounds, side="left").astype(jnp.int32)
    tile_start = starts[:-1]
    tile_count = starts[1:] - starts[:-1]

    # gather packed render fields; padding rows (gauss == n) read index n-1
    # but are masked in-kernel via inst validity (tile ranges never reach them)
    safe = jnp.minimum(inst_gauss, n - 1)
    cols = [
        proc.means2d[safe, 0],
        proc.means2d[safe, 1],
        proc.conics[safe, 0],
        proc.conics[safe, 1],
        proc.conics[safe, 2],
        jnp.where(inst_gauss < n, proc.opacities[safe], 0.0),
        proc.colors[safe, 0],
        proc.colors[safe, 1],
        proc.colors[safe, 2],
        proc.depths[safe],
    ]
    cols += [jnp.zeros((m,), jnp.float32)] * (NUM_FIELDS - len(cols))
    # field-major (NUM_FIELDS, M): HBM lane dim = M so per-chunk DMA slices
    # are 128-aligned (16, CHUNK) blocks (Mosaic cannot slice a 16-lane-wide
    # (M, 16) buffer)
    fields = jnp.stack(cols, axis=0).astype(jnp.float32)  # (NUM_FIELDS, M)

    return TileBinning(
        inst_data=fields,
        inst_gauss=inst_gauss,
        tile_start=tile_start,
        tile_count=tile_count,
        num_instances=total.astype(jnp.int32),
        overflow=jnp.maximum(total - m, 0).astype(jnp.int32),
        grid_x=gx,
        grid_y=gy,
    )
