#!/usr/bin/env python
"""VERDICT r4 #7: measure pipelined vs serial guidance in the regime the
feature exists for — the diffusion engine on DISJOINT devices from the
trainer, with a generate cost inflated to the measured real-engine ratio.

The committed single-chip measurement (PIPELINE_OVERLAP.json) showed
pipelining LOSES 16% at the oracle config: on one chip there is nothing to
overlap — the chip is busy generating. The real engine costs 204.9 s/event
(DIFFUSION_SMOKE.json full_sample_s) against ~31 s of training chunk per
260-iteration period (8.3 it/s), i.e. generate ~= 6.6x chunk. With the
engine on its own device(s) — the reference's two-GPU split,
train_guidedvd.py:551-553 — pipelining should hide ~the whole chunk under
the generate, bounding the win at chunk/(chunk+generate) ~= 13%.

This tool reproduces that regime on a virtual CPU mesh: trainer on device
0, a BUSY mock engine on device 1 whose generate runs a calibrated on-device
burn sized to the real generate/chunk ratio; serial vs --pipeline_guidance
wall-clocks are compared. CPU caveat (stamped into the artifact): virtual
devices share host cores, so the overlap win is a LOWER bound.

Writes PIPELINE_OVERLAP_MESH.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.artifact_io import write_artifact

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PIPELINE_OVERLAP_MESH.json",
)

GEN_OVER_CHUNK = 6.6  # 204.9 s generate / ~31 s chunk (DIFFUSION_SMOKE r4)


class BusyMockEngine:
    """MockDiffusionEngine semantics + a calibrated on-device burn THREADED
    INTO the returned video (the burn output is added as exact zeros), so
    forcing the video waits for the burn, while async dispatch lets the
    trainer keep stepping on ITS device — a stand-in for the real 205 s
    50-step guided sample on the guidance chip."""

    def __init__(self, video_length, height, width, device, burn_iters):
        self.video_length = video_length
        self.height = height
        self.width = width
        self.device = device
        self.burn_iters = burn_iters

        def burn(x, iters):
            def body(c, _):
                c = jnp.tanh(c @ c + 0.1)
                return c, ()

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c

        self._burn = jax.jit(burn, static_argnums=1)
        self._x0 = jax.device_put(
            jnp.eye(256, dtype=jnp.float32) * 0.1 + 0.01, device
        )

    def generate(self, pc_renders, guidance_images, guidance_masks,
                 guidance_depths, rng, no_guidance=False, scale_guidance_weight=1.0):
        pc_renders, guidance_images, guidance_masks = jax.device_put(
            (pc_renders, guidance_images, guidance_masks), self.device
        )
        t = guidance_images.shape[0]
        pc = jax.image.resize(
            pc_renders, (t, guidance_images.shape[2], guidance_images.shape[3], 3),
            "bilinear",
        )
        pc = jnp.transpose(pc, (0, 3, 1, 2))
        m = guidance_masks
        video = jnp.clip(guidance_images * m + pc * (1 - m), 0.0, 1.0)
        z = self._burn(self._x0, self.burn_iters)
        # exact-zero coupling: burn result gates the video's readiness
        return video + (z[0, 0] - z[0, 0])


def _build_trainer(engine, pipeline: bool, n_iters: int, interval: int):
    from guidedvd3dgs_tpu.config import OptimizationParams
    from guidedvd3dgs_tpu.models import gaussians as G
    from guidedvd3dgs_tpu.train.guided import FrozenRenderer, GuidedTrainer

    # repo root (where __graft_entry__ lives) is on sys.path from line 34
    import importlib

    ge = importlib.import_module("__graft_entry__")

    n, h, w = 400, 48, 48
    xyz, log_scales, rots, opac_logit, sh = ge._synthetic_scene(n)
    rgb = 1.0 / (1.0 + np.exp(-sh[:, 0]))
    state = G.create_from_pcd(xyz, rgb, capacity=512)
    frozen_state = jax.tree.map(jnp.copy, G.create_from_pcd(xyz, rgb, capacity=512))
    frozen = FrozenRenderer(frozen_state, sh_degree=0, backend="dense")

    class _Scene:
        def __init__(self, cams):
            self._cams = cams
            self.cameras_extent = 3.0

        def getTrainCameras(self):
            return self._cams

    class _Pipe:
        use_confidence = False
        raster_backend = "dense"

    class _MP:
        sh_degree = 0
        white_background = False
        train_bg = False

    opt = OptimizationParams()
    opt.iterations = n_iters
    opt.start_sample_pseudo = 2
    opt.end_sample_pseudo = n_iters
    opt.sample_pseudo_interval = 1
    opt.guidance_vd_iter = interval
    opt.use_trajectory_pool = False
    opt.guidance_random_traj = True
    opt.densify_from_iter = 10_000_000
    opt.densify_until_iter = 0

    cams = [ge._make_cam(h, w, seed=10 + i) for i in range(3)]
    fx = w / (2 * math.tan(cams[0].FoVx / 2))
    fy = h / (2 * math.tan(cams[0].FoVy / 2))
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
    tr = GuidedTrainer(
        _Scene(cams), state, opt, _Pipe(), _MP(),
        frozen=frozen, engine=engine,
        pcd_points=xyz, pcd_colors=rgb, guidance_intrinsic=K,
        pipeline_guidance=pipeline,
    )
    tr.init_view_geometry()
    return tr


def main():
    dev_train, dev_engine = jax.devices()[0], jax.devices()[1]
    t, h, w = 5, 48, 48

    # --- calibrate: one chunk of training steps on device 0
    interval = 40
    n_iters = 5 * interval + 1
    probe = _build_trainer(
        BusyMockEngine(t, h, w, dev_engine, 1), False, n_iters, 10**9
    )
    for it in range(1, 6):
        probe.step(it)  # warm compile
    t0 = time.perf_counter()
    for it in range(6, 6 + interval):
        probe.step(it)
    chunk_s = time.perf_counter() - t0
    target_burn_s = GEN_OVER_CHUNK * chunk_s

    # calibrate burn iters to target_burn_s
    eng = BusyMockEngine(t, h, w, dev_engine, 64)
    x = eng._x0
    np.asarray(eng._burn(x, 64))
    t0 = time.perf_counter()
    np.asarray(eng._burn(x, 64))
    per64 = time.perf_counter() - t0
    burn_iters = max(64, int(64 * target_burn_s / per64))
    print(f"chunk_s={chunk_s:.2f} target_burn_s={target_burn_s:.2f} "
          f"burn_iters={burn_iters}", flush=True)

    out = {
        "regime": "engine on a DISJOINT virtual device; generate/chunk ratio "
                  f"{GEN_OVER_CHUNK} from DIFFUSION_SMOKE r4 (204.9 s / ~31 s)",
        "cpu_caveat": "virtual CPU devices share host cores; the overlap win "
                      "is a lower bound on the disjoint-chip win",
        "chunk_s_calibrated": round(chunk_s, 2),
        "burn_target_s": round(target_burn_s, 2),
        "interval": interval,
        "events_target": 5,
    }

    for tag, pipeline in (("serial", False), ("pipelined", True)):
        eng = BusyMockEngine(t, h, w, dev_engine, burn_iters)
        tr = _build_trainer(eng, pipeline, n_iters, interval)
        for it in range(1, 6):
            tr.step(it)  # warm
        t0 = time.perf_counter()
        for it in range(6, n_iters + 1):
            tr.step(it)
        # drain any pending event so both modes pay generation fully
        if pipeline and getattr(tr, "_pending_event", None) is not None:
            tr.finalize_diffusion_event(tr._pending_event)
            tr._pending_event = None
        total = time.perf_counter() - t0
        out[tag] = {"total_s": round(total, 2), "events_run": tr.events_run,
                    "pseudo": len(tr.pseudo_stack)}
        print(tag, out[tag], flush=True)

    s, p = out["serial"]["total_s"], out["pipelined"]["total_s"]
    out["overlap_win_s"] = round(s - p, 2)
    out["overlap_win_pct"] = round(100.0 * (s - p) / s, 1)
    out["bound_win_pct"] = round(100.0 / (1.0 + GEN_OVER_CHUNK), 1)
    write_artifact(OUT_PATH, out)
    print(json.dumps({k: v for k, v in out.items() if k != "_capture"}, indent=1))


if __name__ == "__main__":
    main()
