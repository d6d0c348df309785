#!/usr/bin/env python
"""VERDICT r3 #3: counting-sort binning study — measured verdict.

The proposal (rounds 2-4): replace the 9-operand comparison binning sort
with counting-sort placement over the ~560 tile ids (histogram + offsets on
the MXU, like the CUDA radix scatter, rasterizer_impl.cu:290-309). This
tool measures every piece of that plan at bench scale (M ~ 2.23M instances,
320x448 -> 560 tiles) and the cost of every available way to APPLY the
resulting permutation on TPU:

  A. hist+offsets  - per-tile histogram + exclusive cumsum (the counting
                     part; already fused into ops/expand.py for free)
  B. rank/dest     - per-instance destination = tile_base[tile] + rank,
                     via block prefix sums (segmented cumsum over tiles)
  C. apply-gather  - permute the 8 payload rows with one row gather
  D. apply-scatter - permute with .at[dest].set
  E. apply-sort    - permute by sorting payloads with dest as the key
                     (i.e. what the current design already does, minus the
                     wasted rank computation)
  F. sort9 / sort2 - the current 9-operand binning sort and the 2-operand
                     (key, idx) floor, for reference
  G. run-length    - mean length of same-tile runs in expand order: the
                     fragmentation bound for any "write tile buckets
                     directly from the expand kernel" scheme (each run is
                     one contiguous DMA; sub-row runs waste the bus)

Writes COUNTING_SORT_STUDY.json at the repo root. The punchline the
numbers support: on TPU, applying an arbitrary M-row permutation costs a
comparison sort no matter how cheaply the destinations were computed —
gather and scatter are 3-15x slower than the sort they would replace, so
counting-sort placement cannot undercut carrying the payload through ONE
stable sort, and the histogram half of the idea is already implemented
inside the expand kernel.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.artifact_io import write_artifact

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

M = int(os.environ.get("GVD_STUDY_M", str(2_231_424)))
NUM_TILES = 560  # 320x448 at 16px tiles
DEPTH_BITS = 21


_LATENCY_MS = [0.0]


def _calibrate_latency():
    f = jax.jit(lambda v: v.sum() + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    _LATENCY_MS[0] = best


def timed(name, fn, *args, reps=4, out=None):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    # one dispatch+readback through the axon tunnel costs ~25-30 ms; report
    # device time like bench.py does
    ms = max(best * 1000.0 - _LATENCY_MS[0], 0.0)
    print(f"{name:22s} {ms:8.2f} ms", flush=True)
    if out is not None:
        out[name] = round(ms, 2)
    return r


def main():
    _calibrate_latency()
    out = {"m": M, "num_tiles": NUM_TILES,
           "dispatch_latency_ms": round(_LATENCY_MS[0], 2)}
    rng = np.random.default_rng(0)
    # realistic expand-order stream: instances grouped per gaussian, each
    # gaussian covering a small contiguous tile rect (tile ids step by ~1
    # within a rect row) — what the fragmentation stat G depends on
    tiles_list = []
    total = 0
    gx = 28
    while total < M:
        w = rng.integers(1, 4)
        h = rng.integers(1, 4)
        x0 = rng.integers(0, gx - w + 1)
        y0 = rng.integers(0, 20 - h + 1)
        rect = (
            (y0 + np.arange(h))[:, None] * gx + (x0 + np.arange(w))[None, :]
        ).ravel()
        tiles_list.append(rect)
        total += rect.size
    tile = np.concatenate(tiles_list)[:M].astype(np.int32)
    depth_q = rng.integers(0, 1 << DEPTH_BITS, M).astype(np.int32)
    key_np = (tile << DEPTH_BITS) | depth_q

    # G. run-length fragmentation stat (host)
    runs = np.diff(np.flatnonzero(np.concatenate([[True], tile[1:] != tile[:-1], [True]])))
    out["expand_order_mean_run_len"] = round(float(runs.mean()), 3)
    out["expand_order_p90_run_len"] = int(np.quantile(runs, 0.9))
    # one packed int32 row = 4 B/instance; a run is one contiguous DMA
    out["mean_dma_bytes_per_run_8rows"] = round(float(runs.mean()) * 32, 1)

    key = jnp.asarray(key_np)
    tile_j = jnp.asarray(tile)
    payload = [jnp.asarray(rng.integers(-2**31, 2**31 - 1, M, np.int64).astype(np.int32))
               for _ in range(8)]
    idx = jnp.arange(M, dtype=jnp.int32)

    # F. the comparison-sort baselines
    timed("sort9_current", lambda k, *p: jax.lax.sort((k,) + p, num_keys=1, is_stable=True),
          key, *payload, out=out)
    timed("sort2_floor", lambda k, i: jax.lax.sort((k, i), num_keys=1, is_stable=True),
          key, idx, out=out)

    # A. histogram + offsets (the "counting" half)
    def hist_offsets(t):
        h = jnp.zeros((NUM_TILES,), jnp.int32).at[t].add(1)
        return h, jnp.cumsum(h) - h

    timed("hist_offsets_scatter", hist_offsets, tile_j, out=out)

    def hist_offsets_onehot(t):
        # MXU one-hot histogram, the expand-kernel formulation
        oh = (t[None, :] == jnp.arange(NUM_TILES, dtype=jnp.int32)[:, None])
        h = oh.astype(jnp.float32) @ jnp.ones((M, 1), jnp.float32)
        h = h[:, 0].astype(jnp.int32)
        return h, jnp.cumsum(h) - h

    timed("hist_offsets_onehot", hist_offsets_onehot, tile_j, out=out)

    # B. per-instance rank within tile -> destination (segmented prefix via
    # sort-free block partial sums would still need the same one-hot work;
    # measure the direct formulation: rank = running count of own tile)
    def dest_of(t):
        h, base = hist_offsets(t)
        # rank via sort of (tile, idx): after a stable sort by tile, rank is
        # position - segment start — the cheapest correct rank formulation,
        # and it already IS a sort
        st, si = jax.lax.sort((t, idx), num_keys=1, is_stable=True)
        seg_start = jnp.take(base, st)
        rank_sorted = jnp.arange(M, dtype=jnp.int32) - seg_start
        # scatter ranks back to expand order (cost counted here)
        rank = jnp.zeros((M,), jnp.int32).at[si].set(rank_sorted)
        return jnp.take(base, t) + rank

    dest = timed("dest_rank", dest_of, tile_j, out=out)

    # C/D/E: applying a KNOWN permutation
    perm = jnp.asarray(np.argsort(key_np, kind="stable").astype(np.int32))
    pay_mat = jnp.stack(payload, axis=1)  # (M, 8) rows

    timed("apply_gather_rows", lambda pm, p: jnp.take(pm, p, axis=0),
          pay_mat, perm, out=out)
    timed("apply_scatter_rows", lambda pm, d: jnp.zeros_like(pm).at[d].set(pm),
          pay_mat, dest, out=out)
    timed("apply_sort_by_dest", lambda d, *p: jax.lax.sort((d,) + p, num_keys=1),
          dest, *payload, out=out)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "COUNTING_SORT_STUDY.json")
    write_artifact(path, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
