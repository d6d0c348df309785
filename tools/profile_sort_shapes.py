#!/usr/bin/env python
"""Sort-cost scaling probes for the round-2 kernel work.

Questions answered at bench scale (M = 2.5M):
  1. Does lax.sort cost scale with element count (M vs M/2 vs M/4)?
  2. Do BATCHED sorts ((B, M/B), axis=-1) beat one flat sort? Bitonic
     depth is log^2(M/B), so row-partitioned sorting could cut the
     dominant stage cost if XLA batches well.
  3. is_stable=False vs True pricing.
  4. Operand-count scaling (confirming ~2.2 ms/operand).
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
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    keys = jax.random.randint(k2, (M,), 0, 1 << 30, jnp.int32)
    rows = tuple(
        (jax.random.normal(k1, (M,)) * 100).astype(jnp.int32) for _ in range(7)
    )

    def sort_flat(c, keys, *rows, stable=True, nops=2):
        ops = (keys + (c * 0).astype(jnp.int32),) + rows[: nops - 1]
        return jax.lax.sort(ops, num_keys=1, is_stable=stable)

    # 1. size scaling (2-op)
    for frac in (1, 2, 4):
        m = M // frac
        timeit(
            f"sort 2op flat M/{frac}",
            lambda c, k, r: sort_flat(c, k[:m], r[0][:m]),
            keys, rows,
        )

    # 2. batched sorts, 2-op and 7-op
    for b in (4, 8, 16, 32):
        mb = M // b
        kb = keys[: b * mb].reshape(b, mb)
        rb = tuple(r[: b * mb].reshape(b, mb) for r in rows)

        def sort_b(c, kb, rb, nops):
            ops = (kb + (c * 0).astype(jnp.int32),) + rb[: nops - 1]
            return jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)

        timeit(f"sort 2op batched ({b},{mb})",
               lambda c, kb, rb: sort_b(c, kb, rb, 2), kb, rb)
        timeit(f"sort 7op batched ({b},{mb})",
               lambda c, kb, rb: sort_b(c, kb, rb, 7), kb, rb)

    # 3. stability
    timeit("sort 7op flat stable", lambda c, k, r: sort_flat(c, k, *r, nops=7),
           keys, rows)
    timeit("sort 7op flat UNstable",
           lambda c, k, r: sort_flat(c, k, *r, stable=False, nops=7),
           keys, rows)

    # 4. operand scaling flat
    for nops in (2, 4, 8):
        timeit(f"sort {nops}op flat",
               lambda c, k, r, n=nops: sort_flat(c, k, *r, nops=n), keys, rows)


if __name__ == "__main__":
    main()
