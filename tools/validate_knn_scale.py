#!/usr/bin/env python
"""VERDICT r1 #7: KNN + densify machinery validated at 1M-point scale.

1. knn3 at N=1M on the chip: latency, plus accuracy vs brute force on a
   4096-query subsample (relative error of the mean-3NN-distance, hit rate
   of the true NN ids) — the accuracy class of the reference's own
   Morton-box approximation (simple_knn.cu:192-228).
2. densify_and_prune (jit, full pipeline incl. proximity + KNN) timing at
   1M active / 2^20 capacity.

Writes KNN_SCALE.json at the repo root.
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

from guidedvd3dgs_tpu.ops.knn import knn3

N = 1_000_000
SUB = 4096


def force(x):
    # sync WITHOUT bulk transfer: pull ONE scalar of the first leaf (a
    # plain block_until_ready measured 0.1 ms for a 1.3 s knn on the
    # tunneled axon platform — it does not reliably block there), while
    # np.asarray of the full 1M-row state costs tens of seconds of tunnel
    # transfer (that inflation was inside the r3 "38 s densify" artifact).
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1])
    return jax.tree.leaves(x)


def main():
    out = {}
    rng = np.random.default_rng(0)
    # clustered points (real scenes are surface-clustered; uniform points
    # over-flatter Morton windows): 4k centers, sigma 1% of the extent
    centers = rng.uniform(-1, 1, (4096, 3))
    pts_np = (centers[rng.integers(0, 4096, N)]
              + rng.normal(0, 0.02, (N, 3))).astype(np.float32)
    pts = jnp.asarray(pts_np)

    f = jax.jit(lambda p: knn3(p))
    t0 = time.time()
    d, idx = f(pts)
    force(d)
    out["knn1m_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    for i in range(3):
        # perturb per rep: identical (executable, args) repeats measured
        # 0.1 ms on the tunneled platform (result served without re-exec)
        d2_, _ = f(pts + np.float32(1e-6 * (i + 1)))
        force(d2_)
    out["knn1m_run_ms"] = round((time.time() - t0) / 3 * 1000.0, 1)

    # exact 3NN for a query subsample, blocked brute force on host
    d_np = np.asarray(d)
    idx_np = np.asarray(idx)
    qs = rng.integers(0, N, SUB)
    pq = pts_np[qs]
    best = np.full((SUB, 3), np.inf)
    best_i = np.zeros((SUB, 3), np.int64)
    B = 65536
    for s in range(0, N, B):
        blk = pts_np[s : s + B]
        d2 = ((pq[:, None, :] - blk[None]) ** 2).sum(-1)
        self_cols = qs - s
        ok = (self_cols >= 0) & (self_cols < blk.shape[0])
        d2[np.nonzero(ok)[0], self_cols[ok]] = np.inf  # drop self-distance
        cat_d = np.concatenate([best, d2], axis=1)
        cat_i = np.concatenate(
            [best_i,
             np.broadcast_to(np.arange(s, s + blk.shape[0]), d2.shape)],
            axis=1,
        )
        order = np.argsort(cat_d, axis=1)[:, :3]
        best = np.take_along_axis(cat_d, order, 1)
        best_i = np.take_along_axis(cat_i, order, 1)

    exact_mean = best.mean(axis=1)
    approx_mean = d_np[qs]
    rel = np.abs(approx_mean - exact_mean) / np.maximum(exact_mean, 1e-12)
    hits = float(np.mean([
        len(set(idx_np[q].tolist()) & set(best_i[k].tolist())) / 3.0
        for k, q in enumerate(qs)
    ]))
    out["knn1m_meandist_rel_err_mean"] = round(float(np.mean(rel)), 5)
    out["knn1m_meandist_rel_err_p99"] = round(float(np.quantile(rel, 0.99)), 5)
    out["knn1m_true_nn_hit_rate"] = round(hits, 4)

    # densify/prune (full event: clone + split-with-KNN + proximity + prune
    # + compaction) at 1M active points, 2^20 capacity
    from guidedvd3dgs_tpu.models import gaussians as G
    from guidedvd3dgs_tpu.train.baseline import densify_and_prune_jit

    rgb = rng.uniform(size=(N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts_np, rgb, capacity=1 << 20)
    # realistic stats: some gradient mass so clone/split paths are exercised
    state = state._replace(
        xyz_gradient_accum=jnp.asarray(
            np.abs(rng.normal(0, 1e-3, state.xyz_gradient_accum.shape)).astype(np.float32)),
        denom=jnp.ones_like(state.denom),
    )
    cfg = G.DensifyConfig(
        grad_threshold=5e-4, min_opacity=5e-3, extent=3.0, max_screen_size=0.0,
        percent_dense=0.01, dist_thres=10.0, prune_enabled=True,
        proximity_enabled=True,
    )
    t0 = time.time()
    s2 = densify_and_prune_jit(state, jax.random.key(0), cfg)
    force(s2)
    out["densify1m_compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    s3 = densify_and_prune_jit(state, jax.random.key(1), cfg)
    force(s3)
    out["densify1m_run_ms"] = round((time.time() - t0) * 1000.0, 1)
    out["densify1m_active_after"] = int(np.asarray(jnp.sum(s3.active)))

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "KNN_SCALE.json")
    write_artifact(path, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
