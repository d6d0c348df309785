#!/usr/bin/env python
"""Decompose the in-chunk training iteration at the e2e configuration.

The committed oracle e2e (output/synthetic_oracle_e2e/timing_summary.json)
runs scanned train chunks at 4.68 it/s (214 ms/iter) on ~31k active points
at 352x624 — while the raster kernel at that scale costs ~10 ms. This tool
measures, ON THE CHIP, where the rest of an in-chunk iteration goes:

  kernel_ms      rasterize fwd+bwd alone (same N / resolution / capacity)
  render_loss_ms + L1/SSIM loss and its grad
  step_ms        the full scanned train-step body (train_steps_chunk / K):
                 render + loss grad + densify stats + masked Adam update

Writes GUIDED_ITER_PROFILE.json at the repo root. Methodology matches
bench.py (scan-amortized, readback-forced, dispatch latency subtracted).
"""

from __future__ import annotations

import json
import math
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

N_ACTIVE = int(os.environ.get("GVD_PROF_N", "31000"))
# the synthetic e2e train resolution (env-overridable for CPU smoke tests)
H = int(os.environ.get("GVD_PROF_H", "352"))
W = int(os.environ.get("GVD_PROF_W", "624"))
K = int(os.environ.get("GVD_PROF_K", "32"))  # steps per scanned chunk
ITERS = 8


def make_state():
    from guidedvd3dgs_tpu.models import gaussians as G

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (N_ACTIVE, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (N_ACTIVE, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols)
    return state


def make_cam(tz: float = 0.0):
    """tz > 0 moves the camera toward the point cloud (centered at z=3):
    splats cover more tiles, mimicking the higher instance demand of the
    guided trainer's novel-pose pseudo cameras."""
    from guidedvd3dgs_tpu.ops.projection import RasterCamera
    from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix, getWorld2View2

    fov = math.radians(60)
    view = np.asarray(
        getWorld2View2(
            np.eye(3, dtype=np.float32),
            np.array([0.0, 0.0, -tz], np.float32),
        )
    ).T
    proj = np.asarray(getProjectionMatrix(0.01, 100.0, fov, fov)).T
    return RasterCamera(
        jnp.asarray(view), jnp.asarray(view @ proj),
        jnp.asarray(np.linalg.inv(view.T)[:3, 3]),
        math.tan(fov / 2), math.tan(fov / 2), H, W,
    )


_LAT = [0.0]


def calibrate():
    empty = jax.jit(lambda v: v.sum() + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(empty(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(empty(x))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    _LAT[0] = best


def timed(fn, args, iters):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            np.asarray(jax.tree.leaves(leaf)[0] if hasattr(leaf, "shape") else leaf)
        best = min(best, time.perf_counter() - t0)
    return max(best * 1000.0 - _LAT[0], 0.0) / iters


def main():
    from guidedvd3dgs_tpu.models import gaussians as G
    from guidedvd3dgs_tpu.models.render import render_gaussians
    from guidedvd3dgs_tpu.train import baseline as B
    from guidedvd3dgs_tpu.utils.losses import l1_loss, ssim

    state = make_state()
    cam = make_cam()
    bg = jnp.zeros((3,), jnp.float32)
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, H, W)).astype(np.float32)
    )
    calibrate()

    # trainer-style instance capacity
    demand = int(jax.jit(
        lambda s: render_gaussians(
            s.params, s.active, s.confidence, cam, bg, 3, backend="tiles"
        ).num_instances
    )(state))
    from guidedvd3dgs_tpu.ops.raster_tiles import CHUNK
    mi = -(-int(demand * 1.3) // CHUNK) * CHUNK
    out = {"n_active": N_ACTIVE, "capacity": int(state.active.shape[0]),
           "res": [H, W], "instance_demand": demand, "max_instances": mi,
           "dispatch_latency_ms": round(_LAT[0], 2)}

    # 1) kernel fwd+bwd alone
    def kloss(params, s):
        r = render_gaussians(params, s.active, s.confidence, cam, bg, 3,
                             backend="tiles", max_instances=mi)
        return r.color.sum() + 0.1 * r.depth.sum() + 0.1 * r.alpha.sum()

    @jax.jit
    def k_rep(s):
        def body(c, _):
            g = jax.grad(kloss)(jax.tree.map(lambda x: x + c * 0.0, s.params), s)
            m = jnp.stack([jnp.mean(x) for x in jax.tree.leaves(g)]).mean()
            return m * 0.0, m
        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[1]

    out["kernel_fwd_bwd_ms"] = round(timed(k_rep, (state,), ITERS), 2)

    # 2) render + L1/SSIM loss grad
    def rloss(params, s):
        r = render_gaussians(params, s.active, s.confidence, cam, bg, 3,
                             backend="tiles", max_instances=mi)
        ll1 = l1_loss(r.color, gt)
        return 0.8 * ll1 + 0.2 * (1.0 - ssim(r.color, gt))

    @jax.jit
    def rl_rep(s):
        def body(c, _):
            g = jax.grad(rloss)(jax.tree.map(lambda x: x + c * 0.0, s.params), s)
            m = jnp.stack([jnp.mean(x) for x in jax.tree.leaves(g)]).mean()
            return m * 0.0, m
        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[1]

    out["render_loss_ms"] = round(timed(rl_rep, (state,), ITERS), 2)

    # 3) full scanned train-step chunk (K steps in one dispatch)
    rcs = jax.tree.map(lambda a: jnp.stack([a, a]), cam)
    gts = jnp.stack([gt, gt])
    lrs = G.LearningRates(xyz=1e-4, f_dc=2.5e-3, f_rest=1.25e-4,
                          opacity=0.05, scaling=5e-3, rotation=1e-3)

    def chunk(s):
        return B.train_steps_chunk(
            s, rcs, gts,
            jnp.zeros((K,), jnp.int32),
            jnp.full((K,), 1e-4, jnp.float32),
            jnp.ones((K,), bool), jnp.ones((K,), bool),
            jnp.full((K,), 3.0, jnp.float32),
            bg, lrs, 3, 0.2, backend="tiles", max_instances=mi,
        )

    # train_steps_chunk donates its state: re-feed the returned state
    st = jax.tree.map(jnp.copy, state)  # real copy: the chunk donates its input
    st, _ = chunk(st)  # compile + warm
    np.asarray(st.step)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        st, m = chunk(st)
        np.asarray(st.step)
        best = min(best, time.perf_counter() - t0)
    out["train_step_ms"] = round(
        max(best * 1000.0 - _LAT[0], 0.0) / K, 2
    )

    out["kernel_share_of_step"] = round(
        out["kernel_fwd_bwd_ms"] / max(out["train_step_ms"], 1e-9), 3
    )

    # 4) the GUIDED chunk (train render + pseudo render + SSIM + masked
    # Adam + combined densify stats), serial-two-renders vs the batched
    # two-camera kernel chain, and the VGG term priced separately.
    from guidedvd3dgs_tpu.train import guided as GU

    # pseudo pool camera: closer to the cloud, mimicking the novel-pose
    # cameras' higher instance demand (the e2e guided chunk runs at the
    # UNION buffer size, so the pseudo view's demand dominates the sorts)
    pcam = make_cam(tz=float(os.environ.get("GVD_PROF_PSEUDO_TZ", "1.5")))
    pdemand = int(jax.jit(
        lambda s: render_gaussians(
            s.params, s.active, s.confidence, pcam, bg, 3, backend="tiles",
            max_instances=8 << 20,  # probe headroom (2^24 exactness cap)
        ).num_instances
    )(state))
    out["pseudo_instance_demand"] = pdemand

    pool_p = 4
    pool_rcs = jax.tree.map(lambda a: jnp.stack([a] * pool_p), pcam)
    pool_gts = jnp.stack([gt] * pool_p)
    kk = jnp.zeros((K,), jnp.int32)
    ww = jnp.full((K,), 0.05, jnp.float32)
    bb = jnp.ones((K,), bool)
    mi2 = -(-int((demand + pdemand) * 1.3) // CHUNK) * CHUNK
    mi_serial = -(-int(max(demand, pdemand) * 1.3) // CHUNK) * CHUNK
    out["max_instances_batched"] = mi2
    out["max_instances_serial"] = mi_serial

    def guided_chunk_ms(batched, vgg_fn=None):
        GU.set_batch_renders(batched)
        chunk_fn = GU.make_guided_steps_chunk(vgg_loss_fn=vgg_fn)
        def run(s):
            return chunk_fn(
                s, rcs, gts, pool_rcs, pool_gts,
                kk, kk, ww, bb,
                jnp.full((K,), 1e-4, jnp.float32), bb, bb,
                bg, lrs,
                sh_degree=3, lambda_dssim=0.2, use_confidence=False,
                backend="tiles", pseudo_ssim=False,
                max_instances=mi2 if batched else mi_serial,
                with_pseudo=True,
            )
        st2 = jax.tree.map(jnp.copy, state)  # real copy: the chunk donates
        st2, _ = run(st2)
        np.asarray(st2.step)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            st2, _ = run(st2)
            np.asarray(st2.step)
            best = min(best, time.perf_counter() - t0)
        GU.set_batch_renders(True)
        return round(max(best * 1000.0 - _LAT[0], 0.0) / K, 2)

    out["guided_step_serial_ms"] = guided_chunk_ms(False)
    out["guided_step_batched_ms"] = guided_chunk_ms(True)

    # surrogate VGG (random weights, true architecture cost) so the term is
    # priced even without the external torchvision weights on disk
    try:
        from guidedvd3dgs_tpu.utils.vgg_loss import make_vgg_loss_fn

        vgg_fn = make_vgg_loss_fn(None, random_init=True)
    except TypeError:
        vgg_fn = None
    if vgg_fn is not None:
        out["guided_step_batched_vgg_ms"] = guided_chunk_ms(True, vgg_fn)

    out["batched_saving_ms"] = round(
        out["guided_step_serial_ms"] - out["guided_step_batched_ms"], 2
    )
    # GVD_PROF_OUT: write elsewhere for throwaway (CPU smoke) runs so a
    # local run can never clobber the committed on-chip artifact
    path = os.environ.get("GVD_PROF_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GUIDED_ITER_PROFILE.json",
    )
    write_artifact(path, out)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
