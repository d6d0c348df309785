#!/usr/bin/env python
"""Microbenchmark: row-gather formulations at binning scale.

Question: after a (key, gauss_idx)-only binning sort, how fast can we
materialize the per-instance render fields as table[gauss_sorted]?
Candidates:
  A. take axis=0 from (npad, 16) f32      -> (M, 16)
  B. take axis=0 from (npad, 8)  f32      -> (M, 8)
  C. take axis=1 from (16, npad) f32      -> (16, M)
  D. take axis=0 from (npad, 16) packed int32x8 rows (f16 pairs)
  E. take axis=0, indices SORTED (upper bound: locality-friendly)
Also prices the 2-op sort and the current 9-op sort for reference.
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

ITERS = 8
N = 1_000_000
NPAD = -(-N // 128) * 128
M = 2_507_776  # bench-scale instance count


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
    table16 = jax.random.normal(k1, (NPAD, 16), jnp.float32)
    table8 = table16[:, :8]
    table16_t = table16.T
    tablei = (jax.random.normal(k1, (NPAD, 8)) * 100).astype(jnp.int32)
    idx = jax.random.randint(k2, (M,), 0, N, jnp.int32)
    idx_sorted = jnp.sort(idx)
    print(f"N={N} M={M} table16={NPAD*16*4/1e6:.0f}MB out16={M*16*4/1e6:.0f}MB", flush=True)

    timeit("A take axis0 (npad,16)f32", lambda c, t, i: jnp.take(t, i + (c * 0).astype(jnp.int32), axis=0), table16, idx)
    timeit("B take axis0 (npad,8)f32", lambda c, t, i: jnp.take(t, i + (c * 0).astype(jnp.int32), axis=0), table8, idx)
    timeit("C take axis1 (16,npad)f32", lambda c, t, i: jnp.take(t, i + (c * 0).astype(jnp.int32), axis=1), table16_t, idx)
    timeit("D take axis0 (npad,8)i32", lambda c, t, i: jnp.take(t, i + (c * 0).astype(jnp.int32), axis=0), tablei, idx)
    timeit("E take axis0 sorted idx", lambda c, t, i: jnp.take(t, i + (c * 0).astype(jnp.int32), axis=0), table16, idx_sorted)

    # single-row (1D) gathers, one per field
    table_rows = tuple(table16_t[i] for i in range(8))

    def row_gathers(c, rows, i):
        ii = i + (c * 0).astype(jnp.int32)
        return tuple(r[ii] for r in rows)

    timeit("F 8x 1D row gathers", row_gathers, table_rows, idx)

    # sorts for reference
    pad = jnp.zeros((M,), jnp.int32)

    def sort2(c, keys, gs):
        return jax.lax.sort((keys + (c * 0).astype(jnp.int32), gs), num_keys=1, is_stable=True)

    keys = jax.random.randint(k2, (M,), 0, 1 << 30, jnp.int32)
    timeit("G sort 2op M=2.5M", sort2, keys, idx)

    def sortN(c, keys, gs, rows):
        ops = (keys + (c * 0).astype(jnp.int32), gs) + rows
        return jax.lax.sort(ops, num_keys=1, is_stable=True)

    rowsM = tuple(jax.random.normal(k1, (M,), jnp.float32) for _ in range(7))
    timeit("H sort 9op M=2.5M", sortN, keys, idx, rowsM)

    # N-scale sort (gaussians not instances)
    keysN = jax.random.randint(k2, (NPAD,), 0, 1 << 30, jnp.int32)
    idxN = jnp.arange(NPAD, dtype=jnp.int32)
    timeit("I sort 2op N=1M", sort2, keysN, idxN)


if __name__ == "__main__":
    main()
