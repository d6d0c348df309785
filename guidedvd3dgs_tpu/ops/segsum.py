"""Pallas streaming segmented-sum kernel for the per-Gaussian gradient
reduction (L1).

Consumes the id-sorted per-instance gradient columns straight from the
11-operand reduce sort (ops/raster_tiles.py::_reduce_per_gaussian) and
produces per-Gaussian sums in one streaming pass, replacing the XLA tail
(stack + lane cumsum + boundary gather, ~14 ms at M=2.5M on TPU v5e).

Same bounded-window trick as ops/expand.py, in reverse: every Gaussian
owns >= 1 instance slot (ops/tiling.py builds expansion with
count' = max(count, 1)), so sorted ids advance by at most one per slot
and a BBLK-slot block maps onto a window of BBLK+128 output columns:

  onehot[c, r]  = (ids[c] - a0 == r)                 (BBLK, OUTW)
  seg_sum       = grads (16, BBLK) . onehot          -> (16, OUTW) MXU
  total         = seg_sum + carry(prev block totals, lane-shifted by the
                  128-aligned window delta)
  out[a0:a0+OUTW] = total

Windows overlap; the stores are serialized (wait previous before starting
the next) so the later block — whose total includes the carry — wins on
the overlap, and columns left of a window base are final. The output is
pre-zeroed via input-output aliasing so columns no window covers (possible
only under capacity overflow, when tail Gaussians own no slot) read zero,
never uninitialized HBM.

Deterministic (fixed summation order), no atomics — the role of the CUDA
atomicAdd reduction in reference backward.cu:555-598.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Instance slots per grid step. Per-block VPU cost is dominated by the
# (BBLK, OUTW) one-hot mask with OUTW = BBLK + 128, so TOTAL work scales
# as M * (BBLK + 128) / BBLK — smaller blocks do strictly less arithmetic
# until per-step fixed costs (DMA issue, matmul passes) dominate.
# Env override for on-chip tuning sweeps.
import os as _os

BBLK = int(_os.environ.get("GVD_SEGSUM_BBLK", "512"))
OUTW = BBLK + 128  # output window (owner span bound + alignment slack)

_INTERPRET = [False]


def set_interpret(flag: bool):
    _INTERPRET[0] = flag


def _segsum_kernel(
    # scalar prefetch
    a0s_ref,  # (nblk,) i32: 128-aligned window base per block
    # inputs
    ids_ref,  # (BBLK, 1) i32 block: sorted gaussian ids (column layout)
    *rest,
    nf: int,
    precision,
):
    grad_refs = rest[:nf]  # nf x (1, BBLK) f32 blocks
    # rest[nf] is the zero buffer aliased onto the output (never read here)
    out_ref = rest[nf + 1]  # (16, NOUT) f32 in ANY (manual windowed DMA)
    tot_vmem = rest[nf + 2]  # (2, 16, OUTW + BBLK + 128): window + zero tail
    osem = rest[nf + 3]  # (2,) DMA sems

    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)
    a0 = (a0s_ref[b] // 128) * 128

    ids = ids_ref[...]  # (BBLK, 1)
    local = ids - a0
    riota = jax.lax.broadcasted_iota(jnp.int32, (1, OUTW), 1)
    onehot = (local == riota).astype(jnp.float32)  # (BBLK, OUTW)

    grads = jnp.concatenate(
        [grad_refs[i][...] for i in range(nf)]
        + [jnp.zeros((16 - nf, BBLK), jnp.float32)],
        axis=0,
    )  # (16, BBLK)
    # HIGHEST when the operands are raw f32 (default precision would round
    # them to bf16); DEFAULT when the caller's values are already
    # bf16-representable (the packed-grad reduce path) — then the bf16
    # rounding is exact and the f32 accumulation unchanged, at half the
    # MXU passes. One-hot side is exact either way.
    seg = jax.lax.dot_general(
        grads, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # (16, OUTW)

    @pl.when(b == 0)
    def _():
        tot_vmem[0] = jnp.zeros_like(tot_vmem[0])
        tot_vmem[1] = jnp.zeros_like(tot_vmem[1])

    # carry: previous block's totals, lane-shifted into this block's window.
    # d is a difference of 128-multiples and bounded by BBLK (sorted ids
    # advance <= 1 per slot); the scratch tail beyond OUTW is always zero,
    # so the shift pads zeros. Mosaic has no dynamic_slice lowering, so the
    # shift selects among the BBLK/128 + 1 static 128-lane-step slices.
    prev_a0 = (a0s_ref[jnp.maximum(b - 1, 0)] // 128) * 128
    d = a0 - prev_a0
    prev_tot = tot_vmem[1 - slot]
    carry = jnp.zeros((16, OUTW), jnp.float32)
    for k in range(BBLK // 128 + 1):
        sel = (d == k * 128).astype(jnp.float32)
        carry = carry + sel * prev_tot[:, k * 128 : k * 128 + OUTW]
    total = seg + carry  # at b == 0 the scratch is freshly zeroed

    # serialize the overlapping window stores: wait for the previous store
    # before starting this one, so the later (carry-complete) writer wins.
    # This also guarantees the DMA issued from this slot two blocks ago has
    # completed before the slot's buffer is overwritten below.
    @pl.when(b >= 1)
    def _():
        pltpu.make_async_copy(
            tot_vmem.at[1 - slot, :, :OUTW],
            out_ref.at[:, pl.ds(prev_a0, OUTW)],
            osem.at[1 - slot],
        ).wait()

    tot_vmem[slot, :, :OUTW] = total
    pltpu.make_async_copy(
        tot_vmem.at[slot, :, :OUTW],
        out_ref.at[:, pl.ds(a0, OUTW)],
        osem.at[slot],
    ).start()

    @pl.when(b == nb - 1)
    def _():
        pltpu.make_async_copy(
            tot_vmem.at[slot, :, :OUTW],
            out_ref.at[:, pl.ds(a0, OUTW)],
            osem.at[slot],
        ).wait()


def segment_sum_sorted(
    ids: jnp.ndarray,  # (M,) i32 sorted gaussian ids (id n = padding)
    grads: tuple,  # nf arrays (M,) f32, id-sorted
    n: int,
    precision=jax.lax.Precision.HIGHEST,
):
    """Per-Gaussian sums (nf, n) of id-sorted per-instance values.

    Requires: every gaussian id in [0, n) appears at least once in ids
    barring capacity overflow (all-present expansion, ops/tiling.py),
    and M % BBLK == 0.
    """
    m = ids.shape[0]
    assert m % BBLK == 0, m
    nf = len(grads)
    nblk = m // BBLK
    nout = -(-(n + 1) // 128) * 128 + OUTW
    a0s = ids[::BBLK].astype(jnp.int32)

    kernel = functools.partial(_segsum_kernel, nf=nf, precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BBLK, 1), lambda b, *_: (b, 0))]
        + [pl.BlockSpec((1, BBLK), lambda b, *_: (0, b)) for _ in range(nf)]
        + [pl.BlockSpec(memory_space=pl.ANY)],  # zero buffer (aliased)
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 16, OUTW + BBLK + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros((16, nout), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, nout), jnp.float32),
        interpret=_INTERPRET[0],
        # input index: 1 scalar-prefetch + 1 ids + nf grads -> zeros
        input_output_aliases={2 + nf: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a0s, ids.reshape(m, 1), *[g.reshape(1, m) for g in grads], zeros)
    return out[:nf, :n]