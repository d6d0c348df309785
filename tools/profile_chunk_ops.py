#!/usr/bin/env python
"""Microbenchmark of the blend-kernel per-chunk primitives on real TPU.

Times isolated Pallas kernels that run ONLY one piece of the per-chunk math
over a synthetic stream of chunks, so per-variant costs (matmul precision
tiers, transcendental counts, reduction strategies) can be compared without
rebuilding the whole rasterizer. Uses the calibrated readback harness
(block_until_ready lies through the axon tunnel — tools/profile_prims.py).
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.profile_prims import calibrate, timeit

CHUNK = 128
PIX = 256
NCH = 2048  # chunks per kernel launch (~= 1/7 of the bench's 15k)

P_HIGHEST = jax.lax.Precision.HIGHEST
P_HIGH = jax.lax.Precision.HIGH
P_DEFAULT = jax.lax.Precision.DEFAULT


def _stream_kernel(body, x_ref, o_ref, acc_vmem):
    """Grid step: read one (CHUNK, PIX) block, apply body, accumulate."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc_vmem[...] = jnp.zeros((CHUNK, PIX), jnp.float32)

    acc_vmem[...] += body(x_ref[...])

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_vmem[...]


def run_stream(name, body, x):
    kernel = functools.partial(_stream_kernel, body)
    fn = pl.pallas_call(
        kernel,
        grid=(NCH,),
        in_specs=[pl.BlockSpec((1, CHUNK, PIX), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((CHUNK, PIX), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CHUNK, PIX), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CHUNK, PIX), jnp.float32)],
    )

    def wrapped(eps, xx):
        return fn(xx + eps)

    timeit(f"{name} [{NCH} chunks]", wrapped, x)


def main():
    calibrate()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (NCH, CHUNK, PIX)).astype(np.float32))

    # --- baselines -----------------------------------------------------------
    run_stream("noop (DMA+acc only)", lambda v: v[0], x)
    run_stream("10 mul", lambda v: functools.reduce(lambda a, _: a * 1.0001, range(10), v[0]), x)
    run_stream("exp", lambda v: jnp.exp(-v[0]), x)
    run_stream("log1p", lambda v: jnp.log1p(-0.5 * v[0]), x)
    run_stream("sublane reduce (sum axis0)", lambda v: jnp.broadcast_to(jnp.sum(v[0], 0, keepdims=True), (CHUNK, PIX)), x)

    # --- tril matmul precision tiers ----------------------------------------
    for prec, tag in ((P_DEFAULT, "default"), (P_HIGH, "high"), ((P_DEFAULT, P_HIGH), "pair d/h"), (P_HIGHEST, "highest")):
        try:
            run_stream(
                f"tril matmul {tag}",
                lambda v, p=prec: jax.lax.dot(
                    jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32)), v[0],
                    preferred_element_type=jnp.float32, precision=p
                ),
                x,
            )
        except Exception as e:
            print(f"tril matmul {tag}: FAILED {type(e).__name__}: {e}")

    # --- rhs-split3: 3 DEFAULT passes, exact when lhs is bf16-exact ---------
    def tril_split3(v):
        from guidedvd3dgs_tpu.ops.raster_tiles import _dot_rhs_split
        return _dot_rhs_split(jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32)), v[0])

    run_stream("tril matmul rhs-split3", tril_split3, x)

    # --- (CHUNK,PIX)x(PIX,6) moments matmul ---------------------------------
    def make_basis():
        ppix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
        cx = (ppix % 16).astype(jnp.float32)
        cy = (ppix // 16).astype(jnp.float32)
        return jnp.concatenate(
            [jnp.ones((PIX, 1), jnp.float32), cx, cy, cx * cx, cx * cy, cy * cy], 1
        )
    for prec, tag in ((P_DEFAULT, "default"), (P_HIGH, "high"), (P_HIGHEST, "highest")):
        run_stream(
            f"moments matmul {tag}",
            lambda v, p=prec: jnp.broadcast_to(
                jax.lax.dot(v[0], make_basis(), preferred_element_type=jnp.float32,
                            precision=p)[:, 0:1], (CHUNK, PIX)),
            x,
        )

    def moments_split3(v):
        from guidedvd3dgs_tpu.ops.raster_tiles import _dot_lhs_split
        return jnp.broadcast_to(
            _dot_lhs_split(v[0], make_basis())[:, 0:1], (CHUNK, PIX))

    run_stream("moments matmul lhs-split3", moments_split3, x)

    # --- acc matmul (5,CHUNK)x(CHUNK,PIX) -----------------------------------
    for prec, tag in ((P_HIGH, "high"), (P_HIGHEST, "highest")):
        run_stream(
            f"acc matmul {tag}",
            lambda v, p=prec: jnp.broadcast_to(
                jax.lax.dot(
                    jax.lax.broadcasted_iota(jnp.float32, (5, CHUNK), 1) * 0.01,
                    v[0], preferred_element_type=jnp.float32,
                    precision=p)[0:1], (CHUNK, PIX)),
            x,
        )

    # --- cumprod via log-step sublane rolls vs log-space matmul -------------
    def cumprod_rolls(v):
        om = 1.0 - 0.003 * v[0]
        y = om
        for k in (1, 2, 4, 8, 16, 32, 64):
            r = pltpu.roll(y, k, 0)
            riota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            y = y * jnp.where(riota >= k, r, 1.0)
        return y

    try:
        run_stream("cumprod 7x sublane rolls", cumprod_rolls, x)
    except Exception as e:
        print(f"cumprod rolls: FAILED {type(e).__name__}: {e}")

    def cumprod_logmm(v):
        om = 1.0 - 0.003 * v[0]
        lom = jnp.log1p(-0.003 * v[0])
        cum = jax.lax.dot(jnp.tril(jnp.ones((CHUNK, CHUNK), jnp.float32)), lom,
                          preferred_element_type=jnp.float32,
                          precision=P_HIGHEST)
        return jnp.exp(cum - lom)

    run_stream("cumprod log-matmul highest + exp", cumprod_logmm, x)


if __name__ == "__main__":
    main()
