#!/usr/bin/env python
"""Round-2 primitive pricing: narrow gathers, transpose, scatter-add,
sort operand scaling, VMEM capacity probe."""
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

ITERS = 8
N = 1_000_000
NPAD = -(-N // 128) * 128
M = 2_507_776


def timeit(name, fn, *args):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(carry, *a)
            leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)]
            s = jnp.stack(leaves).sum()
            return s * 1e-30, s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs

    out = rep(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(rep(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1000.0
    print(f"{name:46s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k2, (M,), 0, N, jnp.int32)

    for w in (2, 4, 6, 8):
        tab = (jax.random.normal(k1, (NPAD, w)) * 100).astype(jnp.int32)
        timeit(f"gather (M,{w}) i32", lambda c, t, i: jnp.take(
            t, i + (c * 0).astype(jnp.int32), axis=0), tab, idx)

    tab8 = (jax.random.normal(k1, (NPAD, 8)) * 100).astype(jnp.int32)
    timeit("gather (M,8) + transpose -> (8,M)",
           lambda c, t, i: jnp.take(t, i + (c * 0).astype(jnp.int32), axis=0).T,
           tab8, idx)

    big = jax.random.normal(k1, (M, 8), jnp.float32)
    timeit("transpose (M,8)->(8,M) f32", lambda c, x: (x + c).T, big)

    # scatter-add for the gradient reduce: (M, k) rows added into (N, k)
    for w in (4, 8):
        vals = jax.random.normal(k1, (M, w), jnp.float32)
        timeit(f"scatter-add (M,{w})->(N,{w})",
               lambda c, v, i: jnp.zeros((NPAD, v.shape[1]), jnp.float32)
               .at[i].add(v + c), vals, idx)

    # sort operand-count scaling at M
    keys = jax.random.randint(k2, (M,), 0, 1 << 30, jnp.int32)
    rows = tuple(jax.random.normal(k1, (M,), jnp.float32) for _ in range(7))
    for k in (2, 4, 6, 8):
        ops_extra = rows[: k - 2]
        timeit(f"sort {k}op M=2.5M",
               lambda c, kk, ii, *rr: jax.lax.sort(
                   (kk + (c * 0).astype(jnp.int32), ii) + rr,
                   num_keys=1, is_stable=True),
               keys, idx, *ops_extra)

    # sort at reduced M (tighter rects scenario)
    M2 = 1_572_864
    keys2 = keys[:M2]
    idx2 = idx[:M2]
    rows2 = tuple(r[:M2] for r in rows[:6])
    timeit("sort 2op M=1.57M", lambda c, kk, ii: jax.lax.sort(
        (kk + (c * 0).astype(jnp.int32), ii), num_keys=1, is_stable=True),
        keys2, idx2)
    timeit("sort 8op M=1.57M", lambda c, kk, ii, *rr: jax.lax.sort(
        (kk + (c * 0).astype(jnp.int32), ii) + rr, num_keys=1, is_stable=True),
        keys2, idx2, *rows2)

    # VMEM capacity probe: how big a scratch can a pallas kernel take?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for mb in (16, 32, 64, 100):
        rows_v = mb * 1024 * 1024 // (4 * 128)

        def kern(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :] * 2.0
            o_ref[...] = scratch[0:8, :] + 1.0

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows_v, 128), jnp.float32)],
            )(jnp.ones((8, 128), jnp.float32))
            np.asarray(out)
            print(f"VMEM scratch {mb} MB: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"VMEM scratch {mb} MB: FAIL ({type(e).__name__})", flush=True)
            break


if __name__ == "__main__":
    main()
