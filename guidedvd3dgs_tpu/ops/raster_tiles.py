"""Pallas tile rasterizer (L1) — the production TPU render path.

TPU-native replacement for the reference CUDA tile rasterizer
(reference: cuda_rasterizer/forward.cu:263-381 fwd,
backward.cu:416-601 bwd). Architecture:

  preprocess (pure JAX, ops/projection.py)
    -> tile binning (ops/tiling.py): streaming Pallas expansion kernel
       (ops/expand.py) + key sort + 12-operand field-carrying sort; every
       tile's instance segment starts CHUNK-aligned, so each CHUNK block of
       the instance buffer belongs to exactly one tile
    -> Pallas FWD kernel: one grid step per 16x16 tile; per-instance data
       streamed HBM->VMEM in 128-instance chunks with double-buffered DMA
       (chunk c+1 in flight while c blends); blending vectorized as
       (CHUNK, 256)-shaped VPU math with the sequential front-to-back
       transmittance recurrence rewritten as chunk-local cumulative products
       (lower-triangular MXU matmuls), early-exiting when every pixel
       saturates (T < 1e-4)
    -> Pallas BWD kernel: same streaming structure; per-pixel suffix sums
       S_i = U - prefix_i with U = C*dC + D*dD + A*dA reconstructed from the
       forward outputs, so nothing per-instance is stored between passes.
       Each CHUNK belongs to exactly ONE tile, so per-instance gradients
       are pure double-buffered DMA stores (the CUDA version needs atomics
       here); the gradient buffer is pre-zeroed via input-output aliasing
       so chunks skipped by the early exit stay zero
    -> per-Gaussian reduction: deterministic scatter-add over instance ids
       (replaces CUDA atomicAdd), then the preprocess VJP (plain JAX AD)
       maps screen-space gradients back to Gaussian parameters.

Blending semantics match the dense oracle (ops/raster_dense.py) bit-for-bit
in f32: alpha clamp 0.99 (gradient passes through, as the CUDA backward
does), contribution threshold 1/255, termination at T < 1e-4.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guidedvd3dgs_tpu.ops import expand, preprocess_pallas, segsum, tiling
from guidedvd3dgs_tpu.ops.projection import (
    ProcessedGaussians,
    RasterCamera,
    preprocess_gaussians,
)
from guidedvd3dgs_tpu.ops.raster_dense import RenderOutput
from guidedvd3dgs_tpu.ops.tiling import (
    CHUNK,
    F_CA,
    F_CB,
    F_CC,
    F_D,
    F_MX,
    F_MY,
    F_ONE,
    F_OP,
    F_R,
    NUM_FIELDS,
    TILE,
)
TILE_PIX = TILE * TILE
ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99

_INTERPRET = [False]  # flipped by tests on CPU

# Matmul precision for the real-valued kernel matmuls (log-transmittance
# prefix, accumulators, backward moments). HIGHEST = exact f32 (6 MXU
# passes); HIGH = 3-pass split (~1e-5 relative) — measurably faster, set
# via set_matmul_precision for perf experiments. Tests pin HIGHEST.
_MM_PRECISION = [jax.lax.Precision.HIGHEST]


def set_matmul_precision(prec):
    _MM_PRECISION[0] = prec


def set_interpret(flag: bool):
    _INTERPRET[0] = flag
    expand.set_interpret(flag)
    segsum.set_interpret(flag)
    preprocess_pallas.set_interpret(flag)


# Fused Pallas preprocess (ops/preprocess_pallas.py): streams each Gaussian
# block through VMEM once instead of XLA's fragmented elementwise fusions
# (6.3 ms fwd / +4.2 ms vjp at 1M — docs/PERF_NOTES.md "preprocess mystery"),
# and its VJP twin recomputes in-kernel so no linearization residuals touch
# HBM. Only the SH production path is implemented; precomputed-color /
# precomputed-cov3d calls fall back to the XLA preprocess.
_FUSED_PREPROC = [True]


def set_fused_preproc(flag: bool) -> None:
    _FUSED_PREPROC[0] = flag


def _use_fused(static_cfg) -> bool:
    # the fused decision is SNAPSHOTTED into static_cfg at the
    # rasterize_tiles/rasterize_tiles_multi entry (element 7), so the
    # custom_vjp fwd/bwd pair and every jit cache key on it — toggling
    # set_fused_preproc() mid-session can never make a cached forward
    # disagree with its backward about the residual tuple structure
    has_sh, has_cpre, has_cov = static_cfg[3], static_cfg[4], static_cfg[5]
    fused_snap = static_cfg[7] if len(static_cfg) > 7 else _FUSED_PREPROC[0]
    return fused_snap and has_sh and not has_cpre and not has_cov


def _split3(x):
    """Lossless 3-term bf16 decomposition of f32: x == h + m + l exactly
    (8 mantissa bits per term, 24 total). Each term passes through the
    MXU's bf16 operand rounding unchanged."""
    h = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - h
    m = r.astype(jnp.bfloat16).astype(jnp.float32)
    l = r - m  # <= 8 significant bits left: already bf16-representable
    return h, m, l


def _dot_rhs_split(lhs_exact, rhs):
    """lhs @ rhs at HIGHEST-equivalent accuracy in 3 DEFAULT passes (vs 6):
    valid when LHS is bf16-exact (0/1 tril masks, small-integer bases), so
    only the real-valued RHS needs splitting."""
    h, m, l = _split3(rhs)
    d = lambda r: jax.lax.dot(lhs_exact, r, preferred_element_type=jnp.float32)
    return d(h) + d(m) + d(l)


def _dot_lhs_split(lhs, rhs_exact):
    """Mirror of _dot_rhs_split for a bf16-exact RHS."""
    h, m, l = _split3(lhs)
    d = lambda a: jax.lax.dot(a, rhs_exact, preferred_element_type=jnp.float32)
    return d(h) + d(m) + d(l)


def _pixel_coords(t, gx):
    tx = t % gx
    ty = t // gx
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    pixx = (tx * TILE + lin % TILE).astype(jnp.float32)
    pixy = (ty * TILE + lin // TILE).astype(jnp.float32)
    return pixx, pixy


def _f16_bits_to_f32(u):
    """IEEE f16 bit pattern (int32 in [0, 65536)) -> f32 value, via integer
    math + one same-width i32->f32 bitcast. Mosaic rejects 16-bit
    bitcast_vreg casts in some lowerings ("Invalid vector register cast"),
    so the decode never touches 16-bit vector types. Handles normals,
    subnormals, zero and sign; f16 inf/nan cannot occur (the binner packs
    finite in-range values)."""
    s = jnp.right_shift(u, 15) & 1
    e = jnp.right_shift(u, 10) & 0x1F
    m = u & 0x3FF
    # 2^(e-25) = f32 with biased exponent (e - 25 + 127)
    pw = jax.lax.bitcast_convert_type((e + 102) << 23, jnp.float32)
    val = jnp.where(
        e > 0,
        (1024 + m).astype(jnp.float32) * pw,  # (1 + m/1024) * 2^(e-15)
        m.astype(jnp.float32) * jnp.float32(2.0 ** -24),  # subnormal
    )
    return jnp.where(s > 0, -val, val)


def _unpack_f16_rows(p):
    """(1, CHUNK) int32 of (f16 << 16 | f16) -> two (1, CHUNK) f32 rows
    (in-kernel mirror of tiling._unpack_f16, integer-decoded)."""
    a = _f16_bits_to_f32(jnp.right_shift(p, 16) & 0xFFFF)
    b = _f16_bits_to_f32(p & 0xFFFF)
    return a, b


def _pack_bf16_rows(a, b):
    """Two (CHUNK, 1) f32 -> one int32 of (bf16 << 16 | bf16) — in-kernel
    mirror of tiling._pack_bf16. bf16 truncation is done in integer space
    (round-to-nearest-even on the top 16 f32 bits) so no 16-bit vector
    types are involved."""

    def rne16(x):
        u = jax.lax.bitcast_convert_type(x, jnp.int32)
        return jnp.right_shift(u + 0x7FFF + (jnp.right_shift(u, 16) & 1), 16)

    return (rne16(a) << 16) | (rne16(b) & 0xFFFF)


def _unpack_inst_chunk(raw, dmin, dstep, depth_bits):
    """Packed-mode chunk decode. raw: (NP_FIELDS, CHUNK) int32 VMEM values.
    Returns ((CHUNK,1) mx/my/ca/cb/cc/op columns, (5, CHUNK) [r,g,b,d,1]
    fused-accumulate rows, (CHUNK, 5) transpose of the latter).

    Only full (8, CHUNK)-shaped transposes are used (the sublane dim a
    multiple of 8 — the layout Mosaic handles well); narrow slices come
    off the transposed results."""
    ck = raw.shape[1]
    # geometry rows ride as bitcast f32; rows 5-7 transpose along but are
    # never read as f32
    geomT = jax.lax.bitcast_convert_type(raw, jnp.float32).T  # (CHUNK, 8)
    op_row, r_row = _unpack_f16_rows(raw[tiling.P_OPR : tiling.P_OPR + 1])
    g_row, b_row = _unpack_f16_rows(raw[tiling.P_GB : tiling.P_GB + 1])
    dq = (raw[tiling.P_KEY : tiling.P_KEY + 1]
          & jnp.int32((1 << depth_bits) - 1)).astype(jnp.float32)
    d_row = dmin + (dq + 0.5) * dstep
    ones = jnp.ones((1, ck), jnp.float32)
    cd1 = jnp.concatenate([r_row, g_row, b_row, d_row, ones], axis=0)
    # second (8, CHUNK) transpose carries the unpacked rows: col 0 = op,
    # cols 1-5 = [r, g, b, d, 1]
    F = jnp.concatenate(
        [op_row, cd1, jnp.zeros((2, ck), jnp.float32)], axis=0
    ).T  # (CHUNK, 8)
    cols = dict(
        mx=geomT[:, 0:1], my=geomT[:, 1:2], ca=geomT[:, 2:3],
        cb=geomT[:, 3:4], cc=geomT[:, 4:5], op=F[:, 0:1],
    )
    return cols, cd1, F[:, 1:6]


def _chunk_blend_quantities(cols, valid, pixx, pixy, T_in, done_in):
    """Shared fwd/bwd per-chunk math. cols: dict of (CHUNK, 1) VMEM columns
    mx/my/ca/cb/cc/op. Returns per-instance-per-pixel arrays shaped
    (CHUNK, TILE_PIX).

    VPU economy (the chunk loop is VPU-bound; every (CHUNK, TILE_PIX) op
    costs ~32 cycles):
      - one exp: araw = exp(power + log(op)) fuses the op*G product into
        the exponent (log(op) is a narrow (CHUNK, 1) op)
      - include = live & ~(done_in | trig_cum > 0): the inclusive trigger
        prefix already covers both "a previous instance triggered" and
        "this instance triggered" (trig_cum >= trigger)
      - done_out reads the LAST ROW of trig_cum (total trigger count)
        instead of a sublane any-reduction.
    """
    mx = cols["mx"]
    my = cols["my"]
    ca = cols["ca"]
    cb = cols["cb"]
    cc = cols["cc"]
    op = cols["op"]
    logop = jnp.log(jnp.maximum(op, 1e-37))  # narrow (CHUNK, 1)

    dx = mx - pixx  # (CHUNK, TILE_PIX)
    dy = my - pixy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    araw = jnp.exp(power + logop)  # op * exp(power), one transcendental
    alpha = jnp.minimum(ALPHA_MAX, araw)
    live = (power <= 0.0) & (araw >= ALPHA_EPS) & valid
    alpha = jnp.where(live, alpha, 0.0)

    lom = jnp.log1p(-alpha)
    tril = jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32))
    # The TPU default matmul precision rounds f32 operands to bf16
    # (log-transmittance errors ~0.4%), but the 0/1 tril side is bf16-exact,
    # so splitting ONLY the lom side gives exact-f32 accuracy in 3 MXU
    # passes (HIGHEST spends 6 splitting both). In production mode
    # (_PACK_FIELDS on — fields already carry f16 noise of the same order)
    # the split is skipped: bf16 rounding of the lom operand perturbs
    # cum_incl, which feeds T_before and hence EVERY blend weight
    # w = alpha * T_before in the chunk — up to ~|log T| * 2^-9 relative
    # weight error for instances deep in a chunk (~1-2% where T nears the
    # 1e-4 cutoff), not just the termination boundary. The per-chunk T_out
    # carry stays exact VPU f32, so the error does not compound across
    # chunks. tools/check_packed_parity_onchip.py prices this tradeoff
    # against the exact mode on real hardware (the interpret-mode parity
    # tests compute exact f32 dots and never exercise it). The trigger
    # prefix below is 0/1 on both sides and stays at default precision
    # (1 pass) always.
    if tiling._PACK_FIELDS[0]:
        cum_incl = jax.lax.dot(tril, lom, preferred_element_type=jnp.float32)
    else:
        cum_incl = _dot_rhs_split(tril, lom)
    T_before = T_in * jnp.exp(cum_incl - lom)

    trigger = live & (T_before * (1.0 - alpha) < T_EPS)
    trig_cum = jax.lax.dot(tril, trigger.astype(jnp.float32), preferred_element_type=jnp.float32)
    ndone = done_in | (trig_cum > 0.0)
    include = live & (~ndone)

    w = jnp.where(include, alpha * T_before, 0.0)
    T_out = T_in * jnp.exp(jnp.sum(jnp.where(include, lom, 0.0), axis=0, keepdims=True))
    done_out = done_in | (trig_cum[CHUNK - 1 : CHUNK, :] > 0.0)
    return dict(
        alpha=alpha, araw=jnp.where(live, araw, 0.0),
        include=include, w=w,
        T_before=T_before, T_out=T_out, done_out=done_out,
        mx=mx, my=my, op=op, ca=ca, cb=cb, cc=cc,
    )


# ----------------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------------


def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    inst_ref,  # packed: (NP_FIELDS, M) i32; exact: (NUM_FIELDS, M) f32 (ANY)
    bg_ref,  # (8, 1) SMEM f32: rows 0-2 bg, 3 dmin, 4 dstep (packed mode)
    # outputs (VMEM blocks)
    out_ref,  # (1, 8, TILE_PIX): rows 0-2 color, 3 depth, 4 alpha, 5-7 pad
    # scratch
    chunk_vmem,  # (2, R, CHUNK) double buffer (R/dtype per layout)
    state_vmem,  # (8, TILE_PIX): 0 T, 1-3 accC, 4 accD, 5 accA, 6 done, 7 pad
    done_smem,  # (1,) int32
    sem,  # DMA sems, shape (2,)
    *,
    gx: int,
    packed: bool,
    depth_bits: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]  # CHUNK-aligned (tiling.bin_gaussians)
    count = tile_count_ref[t]
    nch = pl.cdiv(count, CHUNK)
    # start is CHUNK-aligned by construction; the //CHUNK*CHUNK form lets
    # Mosaic PROVE the DMA slice index divisible by the lane tiling
    astart = (start // CHUNK) * CHUNK

    pixx, pixy = _pixel_coords(t, gx)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def copy_in(c, slot):
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(astart + c * CHUNK, CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    # Mosaic rejects vector while-loop carries whose layouts differ between
    # the init and body producers (scf.yield legalization), so the per-pixel
    # state lives in VMEM scratch (stores reconcile layouts) and the loop
    # carries only the chunk counter; the early-exit flag is an SMEM scalar.
    row0 = jnp.zeros((1, TILE_PIX), jnp.float32)
    state_vmem[0:1] = 1.0 + row0  # T
    state_vmem[1:8] = jnp.zeros((7, TILE_PIX), jnp.float32)
    done_smem[0] = 0

    @pl.when(nch > 0)
    def _():
        copy_in(0, 0).start()

    def cond(c):
        return (c < nch) & (done_smem[0] == 0)

    def body(c):
        slot = jax.lax.rem(c, 2)
        copy_in(c, slot).wait()

        @pl.when(c + 1 < nch)
        def _():
            copy_in(c + 1, 1 - slot).start()

        off = astart + c * CHUNK
        idx = off + col_idx
        valid = idx < start + count

        # fused accumulate: [R, G, B, D, 1] rows (the constant ones row from
        # the binner or synthesized by the unpack), so color, depth and
        # alpha accumulation is ONE (5, CHUNK) x (CHUNK, TILE_PIX) matmul
        if packed:
            cols, cd1, _ = _unpack_inst_chunk(
                chunk_vmem[slot], bg_ref[3, 0], bg_ref[4, 0], depth_bits
            )
        else:
            data = chunk_vmem[slot].T  # (CHUNK, NUM_FIELDS)
            cols = dict(
                mx=data[:, F_MX : F_MX + 1], my=data[:, F_MY : F_MY + 1],
                ca=data[:, F_CA : F_CA + 1], cb=data[:, F_CB : F_CB + 1],
                cc=data[:, F_CC : F_CC + 1], op=data[:, F_OP : F_OP + 1],
            )
            cd1 = chunk_vmem[slot][F_R : F_ONE + 1, :]  # (5, CHUNK)

        T = state_vmem[0:1]
        done = state_vmem[6:7] > 0.5
        q = _chunk_blend_quantities(cols, valid, pixx, pixy, T, done)
        w = q["w"]
        state_vmem[1:6] = state_vmem[1:6] + jax.lax.dot(
            cd1, w, preferred_element_type=jnp.float32,
            precision=_MM_PRECISION[0],
        )
        state_vmem[0:1] = q["T_out"]
        done_new = q["done_out"]
        state_vmem[6:7] = done_new.astype(jnp.float32)
        done_smem[0] = jnp.all(done_new).astype(jnp.int32)
        return c + 1

    c_exit = jax.lax.while_loop(cond, body, jnp.int32(0))

    # Early exit leaves the prefetched copy for chunk c_exit in flight;
    # drain it so the semaphore is clean for the next grid step.
    @pl.when(c_exit < nch)
    def _():
        copy_in(c_exit, jax.lax.rem(c_exit, 2)).wait()

    T = state_vmem[0:1]
    accC = state_vmem[1:4]
    accD = state_vmem[4:5]
    accA = state_vmem[5:6]
    bg = jnp.stack([bg_ref[0, 0], bg_ref[1, 0], bg_ref[2, 0]]).reshape(3, 1)
    out_ref[0] = jnp.concatenate(
        [accC + T * bg, accD, accA, jnp.zeros((3, TILE_PIX), jnp.float32)], axis=0
    )


def _tiles_to_planes(packed: jnp.ndarray, gx: int, gy: int) -> jnp.ndarray:
    """(num_tiles, R, TILE_PIX) -> (R, gy*TILE, gx*TILE)."""
    r = packed.shape[1]
    x = packed.reshape(gy, gx, r, TILE, TILE)
    return x.transpose(2, 0, 3, 1, 4).reshape(r, gy * TILE, gx * TILE)


def _planes_to_tiles(planes: jnp.ndarray, gx: int, gy: int) -> jnp.ndarray:
    """(R, gy*TILE, gx*TILE) -> (num_tiles, R, TILE_PIX)."""
    r = planes.shape[0]
    x = planes.reshape(r, gy, TILE, gx, TILE)
    return x.transpose(1, 3, 0, 2, 4).reshape(gy * gx, r, TILE_PIX)


def _run_fwd(inst_data, tile_start, tile_count, bg, gx: int, gy: int,
             depth_dmin=None, depth_dstep=None, depth_bits: int = 0):
    num_tiles = gx * gy
    is_packed = inst_data.dtype == jnp.int32
    assert is_packed == (depth_bits > 0), (
        "packed int32 instance buffers require the binning's depth params "
        "(depth_dmin/depth_dstep/depth_bits)"
    )
    nrows = tiling.NP_FIELDS if is_packed else NUM_FIELDS
    dtype = jnp.int32 if is_packed else jnp.float32
    kernel = functools.partial(
        _fwd_kernel, gx=gx, packed=is_packed, depth_bits=depth_bits
    )
    # SMEM scalar block: rows 0-2 bg, 3 dmin, 4 dstep
    zero = jnp.float32(0.0)
    scalars = jnp.stack([
        bg[0], bg[1], bg[2],
        zero if depth_dmin is None else depth_dmin,
        zero if depth_dstep is None else depth_dstep,
        zero, zero, zero,
    ]).reshape(8, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, nrows, CHUNK), dtype),
            pltpu.VMEM((8, TILE_PIX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, TILE_PIX), jnp.float32),
        interpret=_INTERPRET[0],
    )(tile_start, tile_count, inst_data, scalars)
    planes = _tiles_to_planes(out, gx, gy)
    return planes[0:3], planes[3], planes[4]


# ----------------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------------


def _bwd_kernel(
    tile_start_ref,
    tile_count_ref,
    inst_ref,  # packed: (NP_FIELDS, M) i32; exact: (NUM_FIELDS, M) f32 (ANY)
    dparams_ref,  # (8, 1) SMEM f32: 3 dmin, 4 dstep (packed mode)
    fwd_ref,  # (1, 8, TILE_PIX): rows 0-2 C, 3 D, 4 A
    cot_ref,  # (1, 8, TILE_PIX): rows 0-2 dC, 3 dD, 4 dA
    zeros_ref,  # grad-shaped ANY, aliased onto grad_ref (unused)
    grad_ref,  # packed: (NP_FIELDS, M) i32 bf16-pair grads; exact:
    #            (NUM_FIELDS, M) f32 — pre-zeroed via io-aliasing
    chunk_vmem,  # (2, R, CHUNK) input double buffer
    gchunk_vmem,  # (2, R, CHUNK) output double buffer
    state_vmem,  # (8, TILE_PIX): 0 T, 1 prefix, 2 done, 3-7 pad
    done_smem,  # (1,) int32
    sem,  # (2,) input DMA sems
    gsem,  # (2,) output DMA sems
    *,
    gx: int,
    packed: bool,
    depth_bits: int,
    pack_grads: bool,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]  # CHUNK-aligned (tiling.bin_gaussians)
    count = tile_count_ref[t]
    nch = pl.cdiv(count, CHUNK)
    astart = (start // CHUNK) * CHUNK  # provably lane-tiling-divisible

    pixx, pixy = _pixel_coords(t, gx)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def copy_in(c, slot):
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(astart + c * CHUNK, CHUNK)],
            chunk_vmem.at[slot],
            sem.at[slot],
        )

    def copy_out(c, slot):
        return pltpu.make_async_copy(
            gchunk_vmem.at[slot],
            grad_ref.at[:, pl.ds(astart + c * CHUNK, CHUNK)],
            gsem.at[slot],
        )

    dC = cot_ref[0, 0:3, :]
    dD = cot_ref[0, 3:4, :]
    dA = cot_ref[0, 4:5, :]
    C = fwd_ref[0, 0:3, :]
    D = fwd_ref[0, 3:4, :]
    A = fwd_ref[0, 4:5, :]
    # U = sum_incl w_j u_j + T_final * (bg . dC) per pixel — recovered from
    # the forward outputs (see module docstring)
    U = jnp.sum(C * dC, axis=0, keepdims=True) + D * dD + A * dA

    # scratch-resident loop state (see the fwd kernel's layout note)
    state_vmem[0:1] = 1.0 + jnp.zeros((1, TILE_PIX), jnp.float32)  # T
    state_vmem[1:8] = jnp.zeros((7, TILE_PIX), jnp.float32)  # prefix, done, pad
    done_smem[0] = 0

    @pl.when(nch > 0)
    def _():
        copy_in(0, 0).start()

    def cond(c):
        return (c < nch) & (done_smem[0] == 0)

    def body(c):
        slot = jax.lax.rem(c, 2)
        copy_in(c, slot).wait()

        @pl.when(c + 1 < nch)
        def _():
            copy_in(c + 1, 1 - slot).start()

        off = astart + c * CHUNK
        idx = off + col_idx
        valid = idx < start + count

        if packed:
            cols, _, rgbd1 = _unpack_inst_chunk(
                chunk_vmem[slot], dparams_ref[3, 0], dparams_ref[4, 0],
                depth_bits,
            )
        else:
            data = chunk_vmem[slot].T  # (CHUNK, NUM_FIELDS)
            cols = dict(
                mx=data[:, F_MX : F_MX + 1], my=data[:, F_MY : F_MY + 1],
                ca=data[:, F_CA : F_CA + 1], cb=data[:, F_CB : F_CB + 1],
                cc=data[:, F_CC : F_CC + 1], op=data[:, F_OP : F_OP + 1],
            )
            rgbd1 = data[:, F_R : F_ONE + 1]  # (CHUNK, 5)

        T = state_vmem[0:1]
        prefix = state_vmem[1:2]
        done = state_vmem[2:3] > 0.5
        q = _chunk_blend_quantities(cols, valid, pixx, pixy, T, done)
        w, include, alpha = q["w"], q["include"], q["alpha"]

        # u_i per instance-pixel: c_i . dC + d_i * dD + dA — the [R,G,B,D,1]
        # rows against cotangent rows 0..4 [dC(3), dD, dA],
        # so u is ONE (CHUNK, 5) x (5, TILE_PIX) matmul (ones-row fusion)
        # u/prefix/d_colD run at DEFAULT precision when grads are packed:
        # their bf16 operand rounding (~0.4%) enters the gradient additively
        # and is below the packed-grad noise floor; the moments matmul stays
        # exact because the mean-rebinding algebra cancels lx-scaled terms.
        gprec = (jax.lax.Precision.DEFAULT if _PACK_GRADS[0]
                 else _MM_PRECISION[0])
        u = jax.lax.dot(
            rgbd1, cot_ref[0, 0:5, :],
            preferred_element_type=jnp.float32,
            precision=gprec,
        )
        wu = w * u
        tril = jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32))
        if _PACK_GRADS[0]:
            prefix_mm = jax.lax.dot(
                tril, wu, preferred_element_type=jnp.float32,
                precision=gprec,
            )
        else:
            prefix_mm = _dot_rhs_split(tril, wu)  # exact mode, 3 passes
        prefix_i = prefix + prefix_mm
        S = U - prefix_i  # suffix sum AFTER instance i (incl. bg term)

        dalpha = jnp.where(
            include, q["T_before"] * u - S / jnp.maximum(1.0 - alpha, 1e-3), 0.0
        )
        # alpha = op * e^power with the 0.99 clamp passed through, matching
        # the CUDA backward (dL_dG = op * dL_dalpha regardless of clamping)
        g_pow = dalpha * q["araw"]

        # Per-pixel moment reductions on the MXU instead of seven sublane
        # reductions: every screen-space gradient is a linear combination of
        # the g_pow moments against the TILE-LOCAL pixel polynomial basis
        # [1, cx, cy, cx^2, cx*cy, cy^2] (cx, cy in [0, 16) — a compile-time
        # constant, exactly representable at any matmul precision), then
        # narrow (CHUNK, 1) algebra rebinds the moments to the Gaussian mean:
        #   sum_p g dx       = lx*S0 - Sx            (dx = lx - cx)
        #   sum_p g dx^2     = lx^2*S0 - 2 lx Sx + Sxx   etc.
        # Cancellation is benign: |dx| >= |lx| - 15, so the lx-scaled terms
        # never exceed the result by more than ~(lx/(lx-15))^2.
        ppix = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)
        cx = (ppix % TILE).astype(jnp.float32)
        cy = (ppix // TILE).astype(jnp.float32)
        basis = jnp.concatenate(
            [jnp.ones((TILE_PIX, 1), jnp.float32), cx, cy, cx * cx, cx * cy,
             cy * cy], axis=1
        )  # (TILE_PIX, 6)
        # basis entries are integers <= 225: bf16-exact, so only g_pow needs
        # splitting — exact-f32 moments in 3 MXU passes instead of 6
        mom = _dot_lhs_split(g_pow, basis)  # (CHUNK, 6): S0,Sx,Sy,Sxx,Sxy,Syy
        S0 = mom[:, 0:1]
        Sx = mom[:, 1:2]
        Sy = mom[:, 2:3]
        Sxx = mom[:, 3:4]
        Sxy = mom[:, 4:5]
        Syy = mom[:, 5:6]
        tx = jax.lax.rem(t, gx)
        ty = jax.lax.div(t, gx)
        lx = q["mx"] - (tx * TILE).astype(jnp.float32)  # narrow (CHUNK, 1)
        ly = q["my"] - (ty * TILE).astype(jnp.float32)
        Mx = lx * S0 - Sx  # sum_p g_pow * dx
        My = ly * S0 - Sy
        Mxx = lx * lx * S0 - 2.0 * lx * Sx + Sxx
        Mxy = lx * ly * S0 - lx * Sy - ly * Sx + Sxy
        Myy = ly * ly * S0 - 2.0 * ly * Sy + Syy
        ca, cb, cc, op = q["ca"], q["cb"], q["cc"], q["op"]
        d_mx = -(ca * Mx + cb * My)
        d_my = -(cc * My + cb * Mx)
        d_ca = -0.5 * Mxx
        d_cb = -Mxy
        d_cc = -0.5 * Myy
        # d_op = sum dalpha * G = (sum dalpha * araw) / op = S0 / op
        d_op = S0 / jnp.maximum(op, 1e-12)

        # color + depth grads fused: cotangent rows 0..3 are [dC(3), dD]
        d_colD = jax.lax.dot_general(
            w, cot_ref[0, 0:4, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gprec,
        )  # (CHUNK, 4)

        if pack_grads:
            # bf16-pack the 10 grad rows to 5 int32 pair rows IN-KERNEL —
            # the reduce sort consumes them directly (the XLA-side pack
            # pass and half the gradient HBM traffic disappear); bf16
            # keeps the full f32 exponent range (gradients span decades)
            gout = jnp.concatenate(
                [
                    _pack_bf16_rows(d_mx, d_my),
                    _pack_bf16_rows(d_ca, d_cb),
                    _pack_bf16_rows(d_cc, d_op),
                    _pack_bf16_rows(d_colD[:, 0:1], d_colD[:, 1:2]),
                    _pack_bf16_rows(d_colD[:, 2:3], d_colD[:, 3:4]),
                    jnp.zeros((CHUNK, tiling.NP_FIELDS - 5), jnp.int32),
                ],
                axis=1,
            )
        else:
            zeros = jnp.zeros((CHUNK, NUM_FIELDS - 10), jnp.float32)
            gout = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_colD, zeros], axis=1
            )

        # Pure store: the chunk belongs to this tile alone (CHUNK-aligned
        # segments), and skipped chunks stay zero (pre-zeroed aliased
        # output). Wait for the store issued from this buffer two
        # iterations ago before overwriting it.
        @pl.when(c >= 2)
        def _():
            copy_out(c - 2, slot).wait()

        gchunk_vmem[slot] = gout.T
        copy_out(c, slot).start()

        state_vmem[0:1] = q["T_out"]
        state_vmem[1:2] = prefix + jnp.sum(wu, axis=0, keepdims=True)
        done_new = q["done_out"]
        state_vmem[2:3] = done_new.astype(jnp.float32)
        done_smem[0] = jnp.all(done_new).astype(jnp.int32)
        return c + 1

    c_exit = jax.lax.while_loop(cond, body, jnp.int32(0))

    # Drain outstanding DMAs so semaphores are clean for the next grid step:
    # the prefetched input for chunk c_exit (early exit only) and the last
    # one or two gradient stores, in issue order.
    @pl.when(c_exit < nch)
    def _():
        copy_in(c_exit, jax.lax.rem(c_exit, 2)).wait()

    @pl.when(c_exit >= 2)
    def _():
        copy_out(c_exit - 2, jax.lax.rem(c_exit - 2, 2)).wait()

    @pl.when(c_exit >= 1)
    def _():
        copy_out(c_exit - 1, jax.lax.rem(c_exit - 1, 2)).wait()


def _run_bwd(
    inst_data, tile_start, tile_count, C, D, A, dC, dD, dA, gx: int, gy: int,
    depth_dmin=None, depth_dstep=None, depth_bits: int = 0,
):
    num_tiles = gx * gy
    m = inst_data.shape[1]
    is_packed = inst_data.dtype == jnp.int32
    assert is_packed == (depth_bits > 0), (
        "packed int32 instance buffers require the binning's depth params"
    )
    in_rows = tiling.NP_FIELDS if is_packed else NUM_FIELDS
    in_dtype = jnp.int32 if is_packed else jnp.float32
    pack_grads = _PACK_GRADS[0]
    g_rows = tiling.NP_FIELDS if pack_grads else NUM_FIELDS
    g_dtype = jnp.int32 if pack_grads else jnp.float32
    zero_row = jnp.zeros_like(D)[None]
    fwd_packed = _planes_to_tiles(
        jnp.concatenate([C, D[None], A[None], zero_row, zero_row, zero_row], 0), gx, gy
    )
    cot_packed = _planes_to_tiles(
        jnp.concatenate([dC, dD[None], dA[None], zero_row, zero_row, zero_row], 0), gx, gy
    )
    zero = jnp.float32(0.0)
    dparams = jnp.stack([
        zero, zero, zero,
        zero if depth_dmin is None else depth_dmin,
        zero if depth_dstep is None else depth_dstep,
        zero, zero, zero,
    ]).reshape(8, 1)
    kernel = functools.partial(
        _bwd_kernel, gx=gx, packed=is_packed, depth_bits=depth_bits,
        pack_grads=pack_grads,
    )
    bmap = lambda t, *_: (t, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE_PIX), bmap),
            pl.BlockSpec((1, 8, TILE_PIX), bmap),
            pl.BlockSpec(memory_space=pl.ANY),  # zeroed grad buffer (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, in_rows, CHUNK), in_dtype),
            pltpu.VMEM((2, g_rows, CHUNK), g_dtype),
            pltpu.VMEM((8, TILE_PIX), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # The grad output lives in ANY/HBM and the kernel only writes the chunks
    # the early exit visits; alias it to a zeros input so skipped chunks are
    # zero, not uninitialized HBM (input index 6 counts the two
    # scalar-prefetch operands).
    grad_zeros = jnp.zeros((g_rows, m), g_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_rows, m), g_dtype),
        interpret=_INTERPRET[0],
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, inst_data, dparams, fwd_packed, cot_packed,
      grad_zeros)


# ----------------------------------------------------------------------------
# per-Gaussian gradient reduction
# ----------------------------------------------------------------------------

# Pack the 10 per-instance grad rows into 5 bf16-pair int32 payloads for
# the reduce sort (sort payloads cost ~2.2 ms each at M=2.5M; bf16 keeps
# f32 range with ~0.4% relative — far below SGD's minibatch noise). The
# CUDA reference accumulates f32 atomics; exact-f32 reduction stays
# available via set_pack_grads(False) (used by the oracle parity tests).
_PACK_GRADS = [True]


def set_pack_grads(flag: bool) -> None:
    _PACK_GRADS[0] = flag


def _reduce_per_gaussian(grad_inst: jnp.ndarray, binning) -> jnp.ndarray:
    """(NUM_FIELDS, M) per-instance grads -> (10, N) per-Gaussian sums.

    Deterministic replacement for the CUDA atomicAdd reduction (reference
    backward.cu:555-598). One stable sort keyed by gaussian id regroups
    the grads contiguously (sort payload operands are ~20-60x cheaper than
    random row gathers on TPU), then the streaming segmented-sum kernel
    (ops/segsum.py) collapses segments in one pass.
    """
    n = binning.gauss_cum.shape[0]
    if _PACK_GRADS[0]:
        # the bwd kernel already emitted bf16-pair int32 rows (rows 0-4)
        packed = tuple(grad_inst[i] for i in range(5))
        sorted_ops = jax.lax.sort(
            (binning.inst_gauss,) + packed, num_keys=1, is_stable=True
        )
        rows = []
        for i in range(5):
            a, b = tiling._unpack_bf16(sorted_ops[1 + i])
            rows.extend((a, b))
        # DEFAULT matmul precision is exact here: the unpacked values are
        # bf16-representable, so the MXU's bf16 operand rounding is lossless
        return segsum.segment_sum_sorted(
            sorted_ops[0], tuple(rows), n, precision=jax.lax.Precision.DEFAULT
        )
    ops = (binning.inst_gauss,) + tuple(grad_inst[i] for i in range(10))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return segsum.segment_sum_sorted(sorted_ops[0], sorted_ops[1:], n)


# ----------------------------------------------------------------------------
# preprocess wrapper + custom VJP
# ----------------------------------------------------------------------------


def _preproc_screen(
    means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
    means2d_offset, cam, sh_degree, scale_modifier, active_mask,
    active_degree=None,
):
    if (_FUSED_PREPROC[0] and shs is not None and colors_precomp is None
            and cov3d_precomp is None):
        proc = _preproc_fused(
            means3d, scales, rotations, opacities, shs, cam,
            sh_degree, scale_modifier, active_mask, active_degree,
        )
    else:
        proc = preprocess_gaussians(
            means3d, scales, rotations, opacities, shs, cam,
            sh_degree=sh_degree, scale_modifier=scale_modifier,
            colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
            active_mask=active_mask, active_degree=active_degree,
        )
    means2d = proc.means2d
    if means2d_offset is not None:
        off_scale = jnp.array([0.5 * cam.width, 0.5 * cam.height], means2d.dtype)
        means2d = means2d + means2d_offset * off_scale
    return (means2d, proc.depths, proc.conics, proc.colors, proc.opacities), proc


def _preproc_fused(
    means3d, scales, rotations, opacities, shs, cam,
    sh_degree, scale_modifier, active_mask, active_degree,
):
    """ProcessedGaussians view of the fused-kernel (16, N) table. The
    row-stacks below are pure dataflow XLA fuses into the binner's table
    build; nothing preprocess-sized is materialized twice."""
    tab = preprocess_pallas.preprocess_fused_fwd(
        means3d, scales, rotations, opacities, shs, cam,
        sh_degree, scale_modifier, active_degree=active_degree,
    )
    visible = tab[11] > 0.5
    if active_mask is not None:
        visible = visible & active_mask
    radii = jnp.where(visible, tab[10], 0.0).astype(jnp.int32)
    return ProcessedGaussians(
        means2d=jnp.stack([tab[0], tab[1]], axis=-1),
        depths=tab[9],
        conics=jnp.stack([tab[2], tab[3], tab[4]], axis=-1),
        radii=radii,
        colors=jnp.stack([tab[6], tab[7], tab[8]], axis=-1),
        opacities=tab[5],
        visible=visible,
        ext_x=tab[12],
        ext_y=tab[13],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _raster_core(
    static_cfg,  # (sh_degree, scale_modifier, max_instances, has_sh, has_colorpre, has_cov3dpre, has_offset)
    height,
    width,
    means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
    means2d_offset, viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg, active_mask,
    active_degree,
):
    out, _ = _raster_fwd_impl(
        static_cfg, height, width,
        means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
        means2d_offset, viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg, active_mask,
        active_degree,
    )
    return out


def _raster_fwd_impl(
    static_cfg, height, width,
    means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
    means2d_offset, viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg, active_mask,
    active_degree,
):
    sh_degree, scale_modifier, max_instances, *_ = static_cfg
    cam = RasterCamera(viewmatrix, projmatrix, campos, tanfovx, tanfovy, height, width)
    (m2d, depths, conics, colors, opacs), proc = _preproc_screen(
        means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
        means2d_offset, cam, sh_degree, scale_modifier, active_mask, active_degree,
    )
    proc_screen = proc._replace(means2d=m2d)
    binning = tiling.bin_gaussians(proc_screen, width, height, max_instances)
    C, D, A = _run_fwd(
        binning.inst_data, binning.tile_start, binning.tile_count, bg,
        binning.grid_x, binning.grid_y,
        depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
        depth_bits=binning.depth_bits,
    )
    color = C[:, :height, :width]
    depth = D[:height, :width]
    alpha = A[:height, :width]
    diag = (binning.overflow, binning.num_instances)
    residuals = (
        binning, C, D, A,
        means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
        means2d_offset, viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg, active_mask,
        active_degree,
    )
    return (color, depth, alpha, proc.radii, diag), residuals


def _raster_fwd(static_cfg, height, width, *args):
    """AD-path forward.

    Fused-preprocess mode (the SH production path): the forward is the
    primal `_raster_fwd_impl` — residuals are the raw Gaussian parameters,
    and the backward recomputes the preprocess linearization INSIDE the
    fused VJP kernel (ops/preprocess_pallas.py), so no linearization
    residuals ever touch HBM.

    XLA fallback (precomputed color/cov3d): preprocess runs under jax.vjp so
    its linearization residuals are SAVED for the backward instead of
    re-running the whole preprocess forward there (the reference CUDA
    backward also reuses forward state, backward.cu:416-455)."""
    if _use_fused(static_cfg):
        return _raster_fwd_impl(static_cfg, height, width, *args)
    sh_degree, scale_modifier, max_instances, *_ = static_cfg
    (
        means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
        means2d_offset, viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg,
        active_mask, active_degree,
    ) = args
    cam = RasterCamera(viewmatrix, projmatrix, campos, tanfovx, tanfovy, height, width)

    def preproc_only(md, sc, rot, op, sh, cpre, cov, off):
        return _preproc_screen(
            md, sc, rot, op, sh, cpre, cov, off, cam, sh_degree, scale_modifier,
            active_mask, active_degree,
        )

    ((m2d, depths, conics, colors, opacs), pre_vjp, proc) = jax.vjp(
        preproc_only, means3d, scales, rotations, opacities, shs,
        colors_precomp, cov3d_precomp, means2d_offset, has_aux=True,
    )
    proc_screen = proc._replace(means2d=m2d)
    binning = tiling.bin_gaussians(proc_screen, width, height, max_instances)
    C, D, A = _run_fwd(
        binning.inst_data, binning.tile_start, binning.tile_count, bg,
        binning.grid_x, binning.grid_y,
        depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
        depth_bits=binning.depth_bits,
    )
    color = C[:, :height, :width]
    depth = D[:height, :width]
    alpha = A[:height, :width]
    diag = (binning.overflow, binning.num_instances)
    residuals = (
        binning, C, D, A, pre_vjp,
        viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg, active_degree,
    )
    return (color, depth, alpha, proc.radii, diag), residuals


def _raster_bwd(static_cfg, height, width, res, cotangents):
    sh_degree, scale_modifier, max_instances, has_sh, has_cpre, has_cov, has_off = static_cfg[:7]
    fused = _use_fused(static_cfg)
    if fused:
        (
            binning, C, D, A,
            means3d, scales, rotations, opacities, shs, _cpre, _cov,
            means2d_offset, viewmatrix, projmatrix, campos, tanfovx, tanfovy,
            bg, active_mask, active_degree,
        ) = res
    else:
        (
            binning, C, D, A, pre_vjp,
            viewmatrix, projmatrix, campos, tanfovx, tanfovy, bg, active_degree,
        ) = res
    dcolor, ddepth, dalpha, _dradii, _ddiag = cotangents

    gy, gx = binning.grid_y, binning.grid_x
    hp, wp = gy * TILE, gx * TILE
    dC = jnp.zeros((3, hp, wp), jnp.float32).at[:, :height, :width].set(dcolor)
    dD = jnp.zeros((hp, wp), jnp.float32).at[:height, :width].set(ddepth)
    dA = jnp.zeros((hp, wp), jnp.float32).at[:height, :width].set(dalpha)

    grad_inst = _run_bwd(
        binning.inst_data, binning.tile_start, binning.tile_count,
        C, D, A, dC, dD, dA, gx, gy,
        depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
        depth_bits=binning.depth_bits,
    )

    acc = _reduce_per_gaussian(grad_inst, binning)
    if fused:
        # acc rows 0-9 are already the F_*-ordered field cotangents the
        # fused VJP kernel consumes; the screen-offset is additive on the
        # mean rows, so its gradient is the same rows rescaled.
        cam = RasterCamera(
            viewmatrix, projmatrix, campos, tanfovx, tanfovy, height, width
        )
        g_means3d, g_scales, g_rots, g_opac, g_shs = (
            preprocess_pallas.preprocess_fused_bwd(
                means3d, scales, rotations, opacities, shs, cam,
                sh_degree, scale_modifier, acc[0:10],
                active_degree=active_degree,
            )
        )
        g_cpre = g_cov = None
        g_off = None
        if has_off:
            g_off = jnp.stack(
                [acc[0] * (0.5 * width), acc[1] * (0.5 * height)], axis=-1
            ).astype(means2d_offset.dtype)
    else:
        d_m2d = acc[0:2].T
        d_conic = acc[2:5].T
        d_opac = acc[F_OP]
        d_color = acc[F_R : F_R + 3].T
        d_depth = acc[F_D]

        grads = pre_vjp((d_m2d, d_depth, d_conic, d_color, d_opac))
        (g_means3d, g_scales, g_rots, g_opac, g_shs, g_cpre, g_cov, g_off) = grads

    zero_like = lambda x: None if x is None else jnp.zeros_like(x)
    return (
        g_means3d, g_scales, g_rots, g_opac,
        g_shs if has_sh else None,
        g_cpre if has_cpre else None,
        g_cov if has_cov else None,
        g_off if has_off else None,
        zero_like(viewmatrix), zero_like(projmatrix), zero_like(campos),
        jnp.zeros_like(tanfovx) if isinstance(tanfovx, jnp.ndarray) else 0.0,
        jnp.zeros_like(tanfovy) if isinstance(tanfovy, jnp.ndarray) else 0.0,
        zero_like(bg),
        None,
        zero_like(active_degree),
    )


_raster_core.defvjp(_raster_fwd, _raster_bwd)


def rasterize_tiles(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    cam: RasterCamera,
    bg: jnp.ndarray,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    max_instances: int = 0,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    n = means3d.shape[0]
    if max_instances <= 0:
        max_instances = max(4 * n, 1 << 14)
    # tiling.bin_gaussians requires QUANTUM-multiples (lcm of expand.BLK,
    # segsum.BBLK and CHUNK at whatever values the GVD_* envs tuned them to)
    max_instances = -(-max_instances // tiling.QUANTUM) * tiling.QUANTUM

    static_cfg = (
        sh_degree,
        float(scale_modifier),
        int(max_instances),
        shs is not None,
        colors_precomp is not None,
        cov3d_precomp is not None,
        means2d_offset is not None,
        _FUSED_PREPROC[0],  # snapshot: keys jit caches + fwd/bwd agreement
    )
    color, depth, alpha, radii, (overflow, num_instances) = _raster_core(
        static_cfg, cam.height, cam.width,
        means3d, scales, rotations, opacities, shs, colors_precomp, cov3d_precomp,
        means2d_offset, cam.viewmatrix, cam.projmatrix, cam.campos,
        cam.tanfovx, cam.tanfovy, bg, active_mask, active_degree,
    )
    return RenderOutput(color, depth, alpha, radii, radii > 0, overflow, num_instances)


# ----------------------------------------------------------------------------
# multi-camera batched raster: B cameras through ONE kernel chain
# ----------------------------------------------------------------------------
#
# The B cameras' tile grids are stacked vertically into one virtual
# framebuffer (camera c's pixels live in rows [c*Hp, c*Hp+H), Hp = gy*TILE):
# each camera's preprocess output is concatenated along N with means2d.y
# offset by c*Hp and the y-tile-rect clamped to the camera's band
# (tiling.tile_rects n_cams). Every downstream stage — expansion, the
# binning sort, the fwd/bwd blend kernels, the gradient reduce sort and
# segment sum — is tile-grid-agnostic and runs ONCE over the union of all
# cameras' instances. Sort cost is sublinear in M (M/2 -> 0.70x,
# docs/PERF_NOTES.md), so B renders through one chain cost ~0.7-0.8x of B
# separate chains, and the per-dispatch fixed costs (expand windows, grid
# setup, fusion boundaries) are paid once. This is the TPU answer to the
# reference's two-renders-per-guided-iteration (train view + pseudo view,
# reference train_guidedvd.py:332-381) and its 25-frame EasyRenderer loops
# (train_guidedvd.py:520-542).


def _to_virtual_planes(x_b, hp, wp):
    """(B, k, H, W) -> (k, B*hp, wp): zero-pad each camera's plane to the
    padded tile grid, then stack the cameras as vertical bands."""
    b, k, h, w = x_b.shape
    x = jnp.pad(x_b, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    return x.transpose(1, 0, 2, 3).reshape(k, b * hp, wp)


def _from_virtual_planes(x_v, b, hp, height, width):
    """(k, B*hp, wp) -> (B, k, H, W): undo _to_virtual_planes."""
    k = x_v.shape[0]
    x = x_v.reshape(k, b, hp, x_v.shape[2]).transpose(1, 0, 2, 3)
    return x[:, :, :height, :width]


def _cam_of(viewmats, projmats, campos_b, tanfovx, tanfovy, height, width, c):
    pick = lambda x: x[c] if getattr(x, "ndim", 0) > 0 else x
    return RasterCamera(
        viewmats[c], projmats[c], campos_b[c], pick(tanfovx), pick(tanfovy),
        height, width,
    )


def _raster_multi_fwd_impl(
    static_cfg, n_cams, height, width,
    means3d, scales, rotations, opacities, shs,
    means2d_offset, viewmats, projmats, campos_b, tanfovx, tanfovy, bg,
    active_mask, active_degree,
):
    sh_degree, scale_modifier, max_instances, *_ = static_cfg
    gy_cam = (height + TILE - 1) // TILE
    hp = gy_cam * TILE
    parts = []
    for c in range(n_cams):
        cam = _cam_of(
            viewmats, projmats, campos_b, tanfovx, tanfovy, height, width, c
        )
        off_c = None if means2d_offset is None else means2d_offset[c]
        (m2d, _, _, _, _), proc = _preproc_screen(
            means3d, scales, rotations, opacities, shs, None, None,
            off_c, cam, sh_degree, scale_modifier, active_mask, active_degree,
        )
        band = m2d + jnp.array([0.0, c * hp], m2d.dtype)
        parts.append(proc._replace(means2d=band))
    proc_all = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    binning = tiling.bin_gaussians(
        proc_all, width, height, max_instances, n_cams=n_cams
    )
    C, D, A = _run_fwd(
        binning.inst_data, binning.tile_start, binning.tile_count, bg,
        binning.grid_x, binning.grid_y,
        depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
        depth_bits=binning.depth_bits,
    )
    planes = _from_virtual_planes(
        jnp.concatenate([C, D[None], A[None]], axis=0), n_cams, hp, height, width
    )  # (B, 5, H, W)
    color = planes[:, 0:3]
    depth = planes[:, 3]
    alpha = planes[:, 4]
    radii = proc_all.radii.reshape(n_cams, -1)
    diag = (binning.overflow, binning.num_instances)
    residuals = (
        binning, C, D, A,
        means3d, scales, rotations, opacities, shs,
        means2d_offset, viewmats, projmats, campos_b, tanfovx, tanfovy, bg,
        active_mask, active_degree,
    )
    return (color, depth, alpha, radii, diag), residuals


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _raster_core_multi(
    static_cfg,  # (sh_degree, scale_modifier, max_instances, True, False, False, has_offset)
    n_cams,
    height,
    width,
    means3d, scales, rotations, opacities, shs,
    means2d_offset, viewmats, projmats, campos_b, tanfovx, tanfovy, bg,
    active_mask, active_degree,
):
    out, _ = _raster_multi_fwd_impl(
        static_cfg, n_cams, height, width,
        means3d, scales, rotations, opacities, shs,
        means2d_offset, viewmats, projmats, campos_b, tanfovx, tanfovy, bg,
        active_mask, active_degree,
    )
    return out


def _raster_multi_fwd(static_cfg, n_cams, height, width, *args):
    if _use_fused(static_cfg):
        return _raster_multi_fwd_impl(static_cfg, n_cams, height, width, *args)
    sh_degree, scale_modifier, max_instances, *_ = static_cfg
    (
        means3d, scales, rotations, opacities, shs,
        means2d_offset, viewmats, projmats, campos_b, tanfovx, tanfovy, bg,
        active_mask, active_degree,
    ) = args
    gy_cam = (height + TILE - 1) // TILE
    hp = gy_cam * TILE

    def preproc_cat(md, sc, rot, op, sh, off):
        outs = []
        procs = []
        for c in range(n_cams):
            cam = _cam_of(
                viewmats, projmats, campos_b, tanfovx, tanfovy, height, width, c
            )
            off_c = None if off is None else off[c]
            (m2d, depths, conics, colors, opacs), proc = _preproc_screen(
                md, sc, rot, op, sh, None, None, off_c, cam,
                sh_degree, scale_modifier, active_mask, active_degree,
            )
            band = m2d + jnp.array([0.0, c * hp], m2d.dtype)
            outs.append((band, depths, conics, colors, opacs))
            procs.append(proc._replace(means2d=band))
        cat = tuple(
            jnp.concatenate([o[i] for o in outs], axis=0) for i in range(5)
        )
        return cat, procs

    (cat, pre_vjp, procs) = jax.vjp(
        preproc_cat, means3d, scales, rotations, opacities, shs,
        means2d_offset, has_aux=True,
    )
    m2d_cat, depths_cat, conics_cat, colors_cat, opacs_cat = cat
    proc0 = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *procs)
    proc_all = proc0._replace(
        means2d=m2d_cat, depths=depths_cat, conics=conics_cat,
        colors=colors_cat, opacities=opacs_cat,
    )
    binning = tiling.bin_gaussians(
        proc_all, width, height, max_instances, n_cams=n_cams
    )
    C, D, A = _run_fwd(
        binning.inst_data, binning.tile_start, binning.tile_count, bg,
        binning.grid_x, binning.grid_y,
        depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
        depth_bits=binning.depth_bits,
    )
    planes = _from_virtual_planes(
        jnp.concatenate([C, D[None], A[None]], axis=0), n_cams, hp, height, width
    )
    color = planes[:, 0:3]
    depth = planes[:, 3]
    alpha = planes[:, 4]
    radii = proc_all.radii.reshape(n_cams, -1)
    diag = (binning.overflow, binning.num_instances)
    residuals = (
        binning, C, D, A, pre_vjp, bg,
        viewmats, projmats, campos_b, tanfovx, tanfovy,
    )
    return (color, depth, alpha, radii, diag), residuals


def _raster_multi_bwd(static_cfg, n_cams, height, width, res, cotangents):
    sh_degree, scale_modifier, max_instances, has_sh, _, _, has_off = static_cfg[:7]
    fused = _use_fused(static_cfg)
    if fused:
        (
            binning, C, D, A,
            means3d, scales, rotations, opacities, shs,
            means2d_offset, viewmats, projmats, campos_b, tanfovx, tanfovy, bg,
            active_mask, active_degree,
        ) = res
    else:
        (
            binning, C, D, A, pre_vjp, bg,
            viewmats, projmats, campos_b, tanfovx, tanfovy,
        ) = res
    dcolor, ddepth, dalpha, _dradii, _ddiag = cotangents

    gy, gx = binning.grid_y, binning.grid_x
    hp = gy // n_cams * TILE
    wp = gx * TILE
    cot_b = jnp.concatenate([dcolor, ddepth[:, None], dalpha[:, None]], axis=1)
    cot_v = _to_virtual_planes(cot_b, hp, wp)  # (5, gy*TILE, wp)
    dC = cot_v[0:3]
    dD = cot_v[3]
    dA = cot_v[4]

    grad_inst = _run_bwd(
        binning.inst_data, binning.tile_start, binning.tile_count,
        C, D, A, dC, dD, dA, gx, gy,
        depth_dmin=binning.depth_dmin, depth_dstep=binning.depth_dstep,
        depth_bits=binning.depth_bits,
    )
    acc = _reduce_per_gaussian(grad_inst, binning)  # (10+, B*N)
    n = acc.shape[1] // n_cams
    acc_b = acc[:10].reshape(10, n_cams, n)

    if fused:
        cam_args = (viewmats, projmats, campos_b, tanfovx, tanfovy)
        g_means3d = g_scales = g_rots = g_opac = g_shs = None
        for c in range(n_cams):
            cam = _cam_of(*cam_args, height, width, c)
            g = preprocess_pallas.preprocess_fused_bwd(
                means3d, scales, rotations, opacities, shs, cam,
                sh_degree, scale_modifier, acc_b[:, c],
                active_degree=active_degree,
            )
            if g_means3d is None:
                g_means3d, g_scales, g_rots, g_opac, g_shs = g
            else:
                g_means3d = g_means3d + g[0]
                g_scales = g_scales + g[1]
                g_rots = g_rots + g[2]
                g_opac = g_opac + g[3]
                g_shs = g_shs + g[4]
        g_off = None
        if has_off:
            g_off = jnp.stack(
                [acc_b[0] * (0.5 * width), acc_b[1] * (0.5 * height)], axis=-1
            ).astype(means2d_offset.dtype)  # (B, N, 2)
    else:
        d_m2d = acc[0:2].T
        d_conic = acc[2:5].T
        d_opac = acc[F_OP]
        d_color = acc[F_R : F_R + 3].T
        d_depth = acc[F_D]
        (g_means3d, g_scales, g_rots, g_opac, g_shs, g_off) = pre_vjp(
            (d_m2d, d_depth, d_conic, d_color, d_opac)
        )

    zl = lambda x: None if x is None else jnp.zeros_like(x)
    zs = lambda x: (
        jnp.zeros_like(x) if isinstance(x, jnp.ndarray) else 0.0
    )
    return (
        g_means3d, g_scales, g_rots, g_opac,
        g_shs if has_sh else None,
        g_off if has_off else None,
        zl(viewmats), zl(projmats), zl(campos_b),
        zs(tanfovx), zs(tanfovy),
        zl(bg),
        None,  # active_mask (non-differentiable)
        None,  # active_degree
    )


_raster_core_multi.defvjp(_raster_multi_fwd, _raster_multi_bwd)


def rasterize_tiles_multi(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    cams: RasterCamera,  # leaves stacked (B, ...); height/width static ints
    bg: jnp.ndarray,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    means2d_offset: Optional[jnp.ndarray] = None,  # (B, N, 2)
    active_mask: Optional[jnp.ndarray] = None,
    max_instances: int = 0,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Batched render of B cameras through ONE binning/blend/reduce chain
    (module comment above). Returns RenderOutput with leading B on
    color/depth/alpha/radii/visibility; overflow/num_instances are totals
    over the whole batch (size the shared instance buffer accordingly).
    SH path only (the production path) — precomputed color/cov3d callers
    use the single-camera `rasterize_tiles`."""
    assert shs is not None, "rasterize_tiles_multi requires the SH path"
    b = cams.viewmatrix.shape[0]
    n = means3d.shape[0]
    if max_instances <= 0:
        max_instances = max(4 * n * b, 1 << 14)
    max_instances = -(-max_instances // tiling.QUANTUM) * tiling.QUANTUM

    static_cfg = (
        sh_degree,
        float(scale_modifier),
        int(max_instances),
        True,
        False,
        False,
        means2d_offset is not None,
        _FUSED_PREPROC[0],  # snapshot: keys jit caches + fwd/bwd agreement
    )
    # stack_cameras keeps height/width as static ints; tanfovx/tanfovy may
    # be scalars or stacked (B,) arrays (_cam_of picks per camera).
    color, depth, alpha, radii, (overflow, num_instances) = _raster_core_multi(
        static_cfg, b, int(cams.height), int(cams.width),
        means3d, scales, rotations, opacities, shs,
        means2d_offset, cams.viewmatrix, cams.projmatrix, cams.campos,
        cams.tanfovx, cams.tanfovy, bg, active_mask, active_degree,
    )
    return RenderOutput(color, depth, alpha, radii, radii > 0, overflow, num_instances)
