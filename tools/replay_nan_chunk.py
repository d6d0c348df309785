#!/usr/bin/env python
"""Replay a nan_chunk bundle (train_scan --nan_debug dump) step by step to
find the exact iteration and gradient component that goes non-finite.

Usage:
    python tools/replay_nan_chunk.py output/.../nan_chunk_6100_6200.pkl
        [--dump_state /tmp/prenan.npz]  # save the state right before the bad step

Phase 1: run single steps (k=1 chunks) checking parameter finiteness after
each -> exact bad iteration.
Phase 2: from the state before the bad step, compute loss + per-leaf grads
and report which leaves are non-finite, plus render-output diagnostics.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bundle")
    ap.add_argument("--source_path", default="/tmp/synthetic_scene")
    ap.add_argument("--model_path", default=None, help="dir with cfg_args.json (defaults to bundle dir)")
    ap.add_argument("--dump_state", default=None)
    args = ap.parse_args()

    with open(args.bundle, "rb") as f:
        b = pickle.load(f)
    model_path = args.model_path or os.path.dirname(os.path.abspath(args.bundle))

    from guidedvd3dgs_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams,
        get_combined_args_without_cmdline,
    )
    from guidedvd3dgs_tpu.scene.scene import Scene
    from guidedvd3dgs_tpu.train import baseline as B
    from guidedvd3dgs_tpu.train.baseline import BaselineTrainer

    ns = get_combined_args_without_cmdline(model_path)
    ns.source_path = args.source_path
    dataset = ModelParams.extract(ns)
    opt = OptimizationParams.extract(ns)
    pipe = PipelineParams.extract(ns)
    scene = Scene(dataset)
    state0 = scene.create_gaussians(max_sh_degree=dataset.sh_degree)
    trainer = BaselineTrainer(scene, state0, opt, pipe, dataset)

    state = jax.device_put(jax.tree.map(jnp.asarray, b["state"]))
    rcs, gts, _ = trainer._stacked_train_cams()
    mi = int(b["max_instances"])

    def finite(s):
        p = s.params
        return bool(
            jnp.isfinite(p.xyz).all()
            & jnp.isfinite(p.opacity).all()
            & jnp.isfinite(p.scaling).all()
            & jnp.isfinite(p.rotation).all()
            & jnp.isfinite(p.features_dc).all()
        )

    k = len(b["cam_idx"])
    print(f"replaying {k} steps {b['it0']}->{b['it1']} (cam order {b['cam_idx'][:8]}...)")
    prev = jax.device_get(state)
    bad_i = None
    for i in range(k):
        prev = jax.device_get(state)
        state, metrics = B.train_steps_chunk(
            state, rcs, gts,
            jnp.asarray(b["cam_idx"][i : i + 1]),
            jnp.asarray(b["xyz_lrs"][i : i + 1]),
            jnp.asarray(b["apply_adam"][i : i + 1]),
            jnp.asarray(b["update_stats"][i : i + 1]),
            jnp.asarray(b["degrees"][i : i + 1]),
            trainer.bg, B.lrs_for(opt, 0.0),
            sh_degree=trainer.max_sh_degree,
            lambda_dssim=opt.lambda_dssim,
            use_confidence=getattr(pipe, "use_confidence", False),
            backend=trainer.backend,
            max_instances=mi,
        )
        if not finite(state):
            bad_i = i
            it = b["it0"] + i + 1
            print(f"step {it} (chunk idx {i}, cam {b['cam_idx'][i]}) -> NON-FINITE params")
            break
        if i % 10 == 0:
            print(f"  step {b['it0']+i+1} ok loss={float(metrics['loss']):.5f}")
    if bad_i is None:
        print("chunk replay stayed finite?! (nondeterministic) — rerun")
        return

    if args.dump_state:
        flat = {}
        for grp, tree in (("params", prev.params), ("adam_m", prev.adam_m), ("adam_v", prev.adam_v)):
            for name, arr in tree._asdict().items():
                flat[f"{grp}.{name}"] = np.asarray(arr)
        flat["active"] = np.asarray(prev.active)
        flat["confidence"] = np.asarray(prev.confidence)
        flat["cam_idx"] = b["cam_idx"][bad_i]
        flat["degree"] = b["degrees"][bad_i]
        np.savez(args.dump_state, **flat)
        print(f"pre-NaN state dumped to {args.dump_state}")

    # phase 2: grads of the bad step, leaf by leaf
    state = jax.device_put(jax.tree.map(jnp.asarray, prev))
    idx = int(b["cam_idx"][bad_i])
    adeg = jnp.float32(b["degrees"][bad_i])
    cam = jax.tree.map(lambda a: a[idx], rcs)
    gt = gts[idx]
    from guidedvd3dgs_tpu.train.baseline import render_gaussians
    from guidedvd3dgs_tpu.utils.losses import l1_loss, ssim

    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)

    def loss_fn(params, offset):
        r = render_gaussians(
            params, state.active, state.confidence, cam, trainer.bg,
            trainer.max_sh_degree, means2d_offset=offset,
            use_confidence=getattr(pipe, "use_confidence", False),
            backend=trainer.backend, max_instances=mi, active_degree=adeg,
        )
        ll1 = l1_loss(r.color, gt)
        loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - ssim(r.color, gt))
        return loss, r

    (loss, r), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        state.params, offset0
    )
    print(f"bad-step loss: {float(loss):.6f}")
    print("render: color finite", bool(jnp.isfinite(r.color).all()),
          "depth finite", bool(jnp.isfinite(r.depth).all()),
          "alpha finite", bool(jnp.isfinite(r.alpha).all()),
          "overflow", int(r.overflow), "num_inst", int(r.num_instances))
    gp, goff = grads
    for name, garr in list(gp._asdict().items()) + [("means2d_offset", goff)]:
        bad = ~jnp.isfinite(garr)
        nbad = int(bad.sum())
        if nbad:
            rows = jnp.unique(jnp.nonzero(bad.reshape(garr.shape[0], -1).any(1))[0])[:16]
            print(f"  grad[{name}]: {nbad} non-finite, rows {np.asarray(rows)[:16]}")
        else:
            print(f"  grad[{name}]: finite (max |g| {float(jnp.abs(garr).max()):.3e})")

    # inspect offending rows' parameters
    bad_rows = set()
    for name, garr in list(gp._asdict().items()) + [("means2d_offset", goff)]:
        bad = ~jnp.isfinite(garr)
        if int(bad.sum()):
            bad_rows.update(np.asarray(jnp.nonzero(bad.reshape(garr.shape[0], -1).any(1))[0]).tolist())
    bad_rows = sorted(bad_rows)[:8]
    if bad_rows:
        import guidedvd3dgs_tpu.models.gaussians as G
        from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
        act = G.activated_params(state.params) if hasattr(G, "activated_params") else None
        p = state.params
        for rr in bad_rows:
            print(f"  row {rr}: active={bool(state.active[rr])} xyz={np.asarray(p.xyz[rr])} "
                  f"scaling(raw)={np.asarray(p.scaling[rr])} opacity(raw)={float(p.opacity[rr,0]):.4f} "
                  f"rot(raw)={np.asarray(p.rotation[rr])}")
        # view-space z of the bad rows
        V = np.asarray(cam.viewmatrix)
        xyzs = np.asarray(p.xyz)[bad_rows]
        tz = xyzs @ V[:3, 2] + V[3, 2]
        print("  view-space z of bad rows:", tz)


if __name__ == "__main__":
    main()
