#!/usr/bin/env python
"""VERDICT r3 #5: decompose the 38 s densify_and_prune at 1M points.

Times each phase of the densification event (reference:
gaussian_model.py:420-521) in isolation at 1M active / 2^20 capacity:
knn, clone, split, proximity, prune+compact, and the full event.
Writes DENSIFY_PROFILE.json at the repo root.
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

N = int(os.environ.get("GVD_DENSIFY_N", str(1 << 20)))


def force(x):
    # sync WITHOUT bulk transfer: pull ONE scalar of the first leaf (a
    # plain block_until_ready measured 0.1 ms for a 1.3 s knn on the
    # tunneled axon platform — it does not reliably block there), while
    # np.asarray of the full 1M-row state costs tens of seconds of tunnel
    # transfer (that inflation was inside the r3 "38 s densify" artifact).
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def timed(name, fn, *args, out=None, reps=2):
    t0 = time.time()
    r = fn(*args)
    force(r)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        force(r)
    run_ms = (time.time() - t0) / reps * 1000.0
    print(f"{name:28s} compile {compile_s:7.1f} s   run {run_ms:9.1f} ms", flush=True)
    if out is not None:
        out[name] = round(run_ms, 1)
    return r


def main():
    from guidedvd3dgs_tpu.models import gaussians as G
    from guidedvd3dgs_tpu.ops.knn import dist_knn3

    out = {"n": N}
    rng = np.random.default_rng(0)
    centers = rng.uniform(-1, 1, (4096, 3))
    pts_np = (centers[rng.integers(0, 4096, N)]
              + rng.normal(0, 0.02, (N, 3))).astype(np.float32)
    rgb = rng.uniform(size=(N, 3)).astype(np.float32)
    state = G.create_from_pcd(pts_np, rgb, capacity=N)
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
    key = jax.random.key(0)

    grads_fn = jax.jit(lambda s: jnp.nan_to_num(
        jnp.where(s.denom > 0, s.xyz_gradient_accum / jnp.maximum(s.denom, 1e-12), 0.0)))
    grads = grads_fn(state)
    force(grads)

    timed("knn", jax.jit(lambda s: dist_knn3(s.params.xyz, s.active)), state, out=out)
    timed("clone", jax.jit(G.densify_and_clone, static_argnames="cfg"),
          state, grads, cfg, out=out)
    timed("split", jax.jit(G.densify_and_split, static_argnames="cfg"),
          state, grads, key, cfg, out=out)
    timed("proximity", jax.jit(G.proximity, static_argnames="cfg"),
          state, cfg, out=out)
    timed("compact", jax.jit(G.compact), state, out=out)
    timed("prune_only", jax.jit(G.prune_only, static_argnames="cfg"),
          state, cfg, out=out)
    timed("full", jax.jit(G.densify_and_prune, static_argnames="cfg"),
          state, key, cfg, out=out, reps=1)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "DENSIFY_PROFILE.json")
    write_artifact(path, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
