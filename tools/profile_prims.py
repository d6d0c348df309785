#!/usr/bin/env python
"""Calibrated cost model of the M-scale XLA primitives the binning/reduce
pipeline is built from.

Measurement notes (hard-won):
- block_until_ready through the axon tunnel is NOT a reliable completion
  barrier; only a host readback (np.asarray of a scalar) is.
- One dispatch+readback round trip costs ~28 ms; amortize with a scan of
  K=64 iterations inside one jit and subtract the calibrated latency.
- XLA folds sort-invariant reductions (sum of sorted == sum of input), so
  checksums sample strided elements, and every iteration perturbs its
  inputs with the scan carry.
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

K = 64
M = 2_507_008  # the bench's demand-adaptive instance count
N = 1_000_000

_LAT = [28.0]


def chk(out):
    """Strided checksum over every array leaf (defeats sort-invariance)."""
    tot = jnp.float32(0.0)
    for x in jax.tree.leaves(out):
        if hasattr(x, "astype"):
            f = x.reshape(-1)[:: max(1, x.size // 512)].astype(jnp.float32)
            tot = tot + jnp.sum(f)
    return tot


def timeit(name, fn, *args, k=K):
    @jax.jit
    def rep(*a):
        def body(c, _):
            s = chk(fn(c, *a))
            return s * 1e-30, s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return outs.sum()

    try:
        np.asarray(rep(*args))  # compile + warm
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(rep(*args))
            best = min(best, (time.perf_counter() - t0) * 1000.0)
        ms = (best - _LAT[0]) / k
        print(f"{name:52s} {ms:9.3f} ms", flush=True)
        return ms
    except Exception as e:
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return -1.0


def calibrate():
    x = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def empty(v):
        return v.sum() + 1.0

    np.asarray(empty(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(empty(x))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    _LAT[0] = best
    print(f"{'dispatch+readback latency':52s} {best:9.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.int32))
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    idsN = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    f32cols = [jnp.asarray(rng.normal(size=M).astype(np.float32)) for _ in range(10)]
    rows16 = jnp.asarray(rng.normal(size=(M, 16)).astype(np.float32))
    rows4i = jnp.asarray(rng.integers(0, 1 << 20, (N, 4)).astype(np.int32))
    tabN16 = jnp.asarray(rng.normal(size=(N + 1, 16)).astype(np.float32))
    idxN = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    monoN = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))

    def eps_i(c):  # 0 at runtime, opaque to XLA
        return (c > 1e9).astype(jnp.int32)

    calibrate()

    # ---- sort operand scaling ----
    for k in (1, 2, 3, 4, 6, 11):
        def sortk(c, keys, *cols, k=k):
            ops = (keys + eps_i(c),) + cols[: k - 1]
            return jax.lax.sort(ops, num_keys=1, is_stable=True)

        timeit(f"sort {k}-operand (M)", sortk, keys, *f32cols)

    # ---- gathers / scatters ----
    timeit("row gather (M,16)f32 random", lambda c, r, p: r[p + eps_i(c)], rows16, perm)
    timeit(
        "row scatter (M,16)f32 permutation",
        lambda c, r, p: jnp.zeros((M, 16), jnp.float32).at[p + eps_i(c)].set(r),
        rows16,
        perm,
    )
    timeit(
        "table row gather (M rows from N+1,16)",
        lambda c, t, i: t[i + eps_i(c)],
        tabN16,
        idsN,
    )
    timeit(
        "row scatter N rows (N,4)i32 -> (M,4)",
        lambda c, r, i: jnp.zeros((M, 4), jnp.int32).at[i + eps_i(c)].set(r),
        rows4i,
        idxN,
    )
    timeit(
        "col gather (16,M) at N idx",
        lambda c, r, i: jnp.take(r, i + eps_i(c), axis=1),
        rows16.T,
        idxN,
    )
    timeit(
        "1d gather (M,) at N idx",
        lambda c, v, i: v[i + eps_i(c)],
        f32cols[0],
        idxN,
    )
    timeit(
        "1d gather (M,) at N idx mono",
        lambda c, v, i: v[i + eps_i(c)],
        f32cols[0],
        monoN,
    )
    timeit(
        "1d scatter-max N -> M",
        lambda c, i, v: jnp.zeros((M,), jnp.int32)
        .at[i + eps_i(c)]
        .max(v[:, 0], mode="drop"),
        idxN,
        rows4i,
    )

    # ---- scans ----
    timeit(
        "XLA cumsum (16,M) f32 lanes",
        lambda c, r: jnp.cumsum(r + c, axis=1),
        rows16.T,
    )
    timeit(
        "XLA cumsum (M,16) f32 sublanes",
        lambda c, r: jnp.cumsum(r + c, axis=0),
        rows16,
    )
    timeit("XLA cummax (M,) i32", lambda c, k_: jax.lax.cummax(k_ + eps_i(c)), keys)

    def blockedcumsum(c, rowsT):
        x = rowsT + c  # (16, M)
        B = M // 128
        xb = x.reshape(16, B, 128)
        tril = jnp.tril(jnp.ones((128, 128), jnp.float32))
        inblock = jnp.einsum("kbm,nm->kbn", xb, tril)
        totals = inblock[:, :, -1]
        carry = jnp.cumsum(totals, axis=1) - totals
        return (inblock + carry[:, :, None]).reshape(16, M)

    timeit("blocked cumsum (16,M): tril MXU + B-carry", blockedcumsum, rows16.T)

    def blockedcummax(c, k_):
        x = (k_ + eps_i(c)).reshape(M // 512, 512)
        inb = jax.lax.cummax(x, axis=1)
        tot = inb[:, -1]
        carry = jax.lax.cummax(tot)
        carry = jnp.concatenate([jnp.full((1,), -(2**31), jnp.int32), carry[:-1]])
        return jnp.maximum(inb, carry[:, None]).reshape(M)

    timeit("blocked cummax (B,512) rows + carry", blockedcummax, keys)

    def segtail(c, rowsT, cum):
        P = jnp.cumsum(rowsT + c, axis=1)
        hi = jnp.take(P, jnp.clip(cum - 1, 0, M - 1), axis=1)
        lo = jnp.concatenate([jnp.zeros((16, 1), jnp.float32), hi[:, :-1]], axis=1)
        return hi - lo

    timeit("cumsum+1 boundary colgather (16,M)->(16,N)", segtail, rows16.T, monoN)

    # transposes / relayouts
    timeit("transpose (M,16)->(16,M)", lambda c, r: (r + c).T, rows16)


if __name__ == "__main__":
    main()
