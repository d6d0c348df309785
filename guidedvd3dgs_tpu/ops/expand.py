"""Pallas monotonic-expansion kernel for tile binning (L1).

Replaces the gather/scatter-heavy instance expansion of the tile binner
(reference semantics: cuda_rasterizer/rasterizer_impl.cu:278-309
duplicateWithKeys) with one streaming TPU kernel. Motivation, measured on
TPU v5e at M=2.5M instances (tools/profile_prims.py):

  - (M,16) random row gather: 33-72 ms; (M,16) row scatter: 255 ms
  - k-operand lax.sort: 4.3 + ~1.2*(k-1) ms

i.e. random-access row primitives are 10-60x more expensive than streaming
ones, and sorts are cheap per payload operand. So the binner must never
materialize per-instance data through a gather. The trick used here:

  Every Gaussian (visible or not) gets at least one expansion slot
  (count' = max(count, 1)), so the owner id of consecutive slots advances
  by AT MOST one per slot. A block of BLK consecutive slots therefore
  draws from a bounded window of BLK+128 consecutive table rows, which is
  one streaming DMA. Within the block, "expand" is a one-hot matrix
  product on the MXU:

    ind[c, r]   = (cum_win[r] <= j_c)            (BLK, WIN) step matrix
    onehot[c,r] = ind[c, r-1] - ind[c, r]        1 exactly at owner r
    out         = tab_win (16, WIN) . onehot^T   -> (16, BLK) on the MXU
    owner       = a0 + sum_r ind[c, r]

  The per-instance sort key (tile id from the row-major rect walk +
  quantized depth, reference rasterizer_impl.cu:290-309) is computed
  in-kernel from the expanded rect columns.

Table layout (16, NPAD) f32, rows:
  0-9   render fields (F_* order of ops/tiling.py)
  10-12 rect_min_x, rect_min_y, max(rect_w, 1)
  13    expansion-order exclusive cumsum of count' (offsets')
  14    quantized depth key; -1 marks count==0 (dead slot -> DEAD key)
  15    inclusive cumsum of count' (cum'), pad columns = 1e30

All integer-valued rows are exact in f32 (values < 2^24; enforced by the
instance-capacity assert in ops/tiling.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Expansion slots per grid step. The per-block VPU cost is dominated by
# (BLK, WIN)-shaped mask ops with WIN = BLK + 128, so TOTAL work scales as
# M * (BLK + 128) / BLK — smaller blocks do strictly less arithmetic until
# per-step fixed costs dominate (BLK=256 measured ~1.5x faster than 512 at
# M=2.5M on v5e). Env override for on-chip tuning sweeps.
import os as _os

BLK = int(_os.environ.get("GVD_EXPAND_BLK", "256"))
WIN = BLK + 128  # table window per block (owner span bound + alignment slack)

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = flag


def _expand_kernel(
    # scalar prefetch
    g0s_ref,  # (nblk,) i32: owner id of each block's first slot
    tot_ref,  # (2,) i32: [total real slots, n (gaussian count)]
    # input
    tab_ref,  # (16, NPAD) f32 in ANY
    # outputs (VMEM blocks, pipelined)
    fields_ref,  # (16, BLK)
    keys_ref,  # (1, BLK) i32
    gs_ref,  # (1, BLK) i32
    hist_ref,  # (1, T_PAD) f32: per-tile instance histogram (revisited block)
    # scratch
    win_vmem,  # (2, 16, WIN) window double buffer
    sem,  # DMA sems (2,)
    *,
    gx: int,
    depth_bits: int,
    dead_key: int,
    t_pad: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    total = tot_ref[0]
    n = tot_ref[1]
    # blocks at or past ceil(total / BLK) contain only dead slots (capacity
    # headroom): skip their window DMA and all expansion math — the buffer
    # is sized with ~30% headroom by the trainers, so this skips ~25% of
    # the grid in steady state
    nliveb = jnp.maximum(pl.cdiv(total, BLK), 1)
    live = b < nliveb

    def copy_win(bb, slot):
        a = (g0s_ref[bb] // 128) * 128  # provably lane-tiling-divisible
        return pltpu.make_async_copy(
            tab_ref.at[:, pl.ds(a, WIN)], win_vmem.at[slot], sem.at[slot]
        )

    @pl.when(b == 0)
    def _():
        copy_win(0, 0).start()  # block 0 is always live (total >= 1)

    slot = jax.lax.rem(b, 2)

    @pl.when(~live)
    def _():
        keys_ref[...] = jnp.full((1, BLK), dead_key, jnp.int32)
        gs_ref[...] = jnp.full((1, BLK), n, jnp.int32)
        fields_ref[...] = jnp.zeros((16, BLK), jnp.float32)

    @pl.when(live)
    def _live_body():
        _expand_live(
            b, nb, nliveb, total, n, slot, copy_win, g0s_ref, tab_ref,
            fields_ref, keys_ref, gs_ref, hist_ref, win_vmem,
            gx=gx, depth_bits=depth_bits, dead_key=dead_key, t_pad=t_pad,
        )


def _expand_live(
    b, nb, nliveb, total, n, slot, copy_win, g0s_ref, tab_ref,
    fields_ref, keys_ref, gs_ref, hist_ref, win_vmem,
    *, gx, depth_bits, dead_key, t_pad,
):
    copy_win(b, slot).wait()

    @pl.when((b + 1 < nb) & (b + 1 < nliveb))
    def _():
        copy_win(b + 1, 1 - slot).start()

    a0 = (g0s_ref[b] // 128) * 128
    tabwin = win_vmem[slot]  # (16, WIN)

    jcol = (b * BLK + jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)).astype(
        jnp.float32
    )
    cumwin = tabwin[15:16, :]  # (1, WIN)
    ind = (cumwin <= jcol).astype(jnp.float32)  # (BLK, WIN)
    prev = jnp.concatenate([jnp.ones((BLK, 1), jnp.float32), ind[:, :-1]], axis=1)
    onehot = prev - ind  # (BLK, WIN), one 1 per row at the owner column

    # (16, WIN) . (BLK, WIN)^T -> (16, BLK): contract the lane dims (NT
    # matmul). The TPU default matmul precision rounds f32 operands to bf16,
    # silently corrupting the integer-valued table rows (offsets up to 2^20
    # -> errors of hundreds) and the means (+-2 px), so the table side is
    # decomposed into 3 lossless bf16 terms (8 mantissa bits each, 24 total)
    # — exact f32 in 3 MXU passes where HIGHEST spends 6 splitting the
    # already-bf16-exact one-hot side too. Interpret mode computes exact f32
    # either way.
    def nt(a):
        return jax.lax.dot_general(
            a, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t_h = tabwin.astype(jnp.bfloat16).astype(jnp.float32)
    t_r = tabwin - t_h
    t_m = t_r.astype(jnp.bfloat16).astype(jnp.float32)
    t_l = t_r - t_m  # <= 8 significant bits left: bf16-representable
    out = nt(t_h) + nt(t_m) + nt(t_l)
    S = jax.lax.dot_general(
        jnp.ones((1, WIN), jnp.float32), ind, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, BLK) count of cum' <= j == owner - a0

    jrow = b * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    rmx = out[10:11].astype(jnp.int32)
    rmy = out[11:12].astype(jnp.int32)
    rw = out[12:13]  # f32, >= 1
    offs = out[13:14].astype(jnp.int32)
    dq = out[14:15].astype(jnp.int32)

    s = jrow - offs
    q = jnp.floor((s.astype(jnp.float32) + 0.5) / rw).astype(jnp.int32)
    rem = s - q * rw.astype(jnp.int32)
    tile = (rmy + q) * gx + rmx + rem
    key = (tile << depth_bits) | jnp.maximum(dq, 0)

    # Exact conservative tile-level cull (output-identical): the blend
    # kernels ignore any instance-pixel with alpha < 1/255 (ALPHA_EPS), so
    # an instance whose MAXIMUM alpha over its tile's pixel rect is below
    # that threshold can be dropped here — its chunks then never reach the
    # blend kernels. The continuous minimum of the PSD conic quadratic
    # q(d) = 0.5*(ca*dx^2 + cc*dy^2) + cb*dx*dy over the rect lower-bounds
    # the discrete pixel minimum (interior min is the mean itself; boundary
    # minima are the clamped per-edge stationary points), so the test only
    # culls instances that provably contribute nothing. The CUDA reference
    # walks the full rect (rasterizer_impl.cu duplicateWithKeys) and pays
    # for these corner tiles in the blend instead.
    mx = out[0:1]
    my = out[1:2]
    ca = out[2:3]
    cb = out[3:4]
    cc = out[4:5]
    op = out[5:6]
    tcx = (rmx + rem).astype(jnp.float32)
    tcy = (rmy + q).astype(jnp.float32)
    ex0 = tcx * 16.0 - mx
    ex1 = ex0 + 15.0
    ey0 = tcy * 16.0 - my
    ey1 = ey0 + 15.0
    inside = (ex0 <= 0.0) & (0.0 <= ex1) & (ey0 <= 0.0) & (0.0 <= ey1)
    caf = jnp.maximum(ca, 1e-12)
    ccf = jnp.maximum(cc, 1e-12)

    def qv(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    qe0 = qv(ex0, jnp.clip(-cb * ex0 / ccf, ey0, ey1))
    qe1 = qv(ex1, jnp.clip(-cb * ex1 / ccf, ey0, ey1))
    qe2 = qv(jnp.clip(-cb * ey0 / caf, ex0, ex1), ey0)
    qe3 = qv(jnp.clip(-cb * ey1 / caf, ex0, ex1), ey1)
    minq = jnp.minimum(jnp.minimum(qe0, qe1), jnp.minimum(qe2, qe3))
    minq = jnp.where(inside, 0.0, minq)
    cull = minq > jnp.log(jnp.maximum(op, 1e-12) * 255.0)

    dead = (dq < 0) | (jrow >= total) | cull
    keys_ref[...] = jnp.where(dead, dead_key, key)
    owner = a0 + S.astype(jnp.int32)
    gs_ref[...] = jnp.where(jrow >= total, n, owner)
    fields_ref[...] = out

    # per-tile instance histogram, accumulated across the (sequential) grid
    # into one revisited output block: replaces a 1-operand key sort +
    # searchsorted on the host graph (~4.3 ms at M=2.5M). Dead slots are
    # pushed to a sentinel column outside [0, num_tiles).
    tile_h = jnp.where(dead, t_pad - 1, tile)  # (1, BLK)
    cmp = (
        jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0) == tile_h
    ).astype(jnp.float32)  # (T_PAD, BLK)
    add = jax.lax.dot_general(
        jnp.ones((1, BLK), jnp.float32), cmp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, T_PAD)

    @pl.when(b == 0)
    def _():
        hist_ref[...] = jnp.zeros((1, t_pad), jnp.float32)

    hist_ref[...] += add


def expand_instances(
    tab: jnp.ndarray,  # (16, NPAD) f32 per-Gaussian table (see module doc)
    cum: jnp.ndarray,  # (N,) i32 inclusive cumsum of count'
    m: int,  # instance capacity (multiple of BLK)
    n: int,
    gx: int,
    num_tiles: int,
    depth_bits: int,
    dead_key: int,
):
    """Returns (fields (16, m) f32, keys (m,) i32, gs (m,) i32,
    tile_count (num_tiles,) i32)."""
    assert m % BLK == 0, m
    nblk = m // BLK
    t_pad = -(-(num_tiles + 1) // 128) * 128
    g0s = jnp.searchsorted(
        cum, jnp.arange(nblk, dtype=jnp.int32) * BLK, side="right"
    ).astype(jnp.int32)
    tot = jnp.stack([cum[-1], jnp.int32(n)]).astype(jnp.int32)

    kernel = functools.partial(
        _expand_kernel, gx=gx, depth_bits=depth_bits, dead_key=dead_key,
        t_pad=t_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((16, BLK), lambda b, *_: (0, b)),
            pl.BlockSpec((1, BLK), lambda b, *_: (0, b)),
            pl.BlockSpec((1, BLK), lambda b, *_: (0, b)),
            pl.BlockSpec((1, t_pad), lambda b, *_: (0, 0)),  # revisited
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fields, keys, gs, hist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((16, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, t_pad), jnp.float32),
        ],
        interpret=_INTERPRET[0],
    )(g0s, tot, tab)
    return fields, keys[0], gs[0], hist[0, :num_tiles].astype(jnp.int32)
