#!/usr/bin/env python
"""Benchmark: Pallas tile rasterizer fwd+bwd at 1M splats, 320x448.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra diagnostics (fwd-only ms, demand, tracebacks on failure) go to
BENCH_DETAIL.json next to this file and stderr.

The reference ships no kernel-level numbers (SURVEY.md §6) — the north-star
kernel metric is established here and tracked round-over-round; vs_baseline
is computed against the INRIA CUDA rasterizer's typical ~25 ms fwd+bwd at
1M visible splats on V100-class hardware (the hardware the reference's 3-4 h
wall-clock is quoted on), i.e. vs_baseline = 25 / value.

The instance buffer is sized demand*1.3 the way the trainers do (they track
per-render demand and regrow/shrink with headroom, train/baseline.py
check_overflow) — the first probe render measures demand.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N = 1_000_000
H, W = 320, 448
REFERENCE_MS = 25.0  # V100 CUDA rasterizer ballpark at this load
ITERS = 8
DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")


def make_inputs():
    rng = np.random.default_rng(0)
    means = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    means[:, 2] += 3.0
    scales = np.exp(rng.uniform(-6.5, -4.5, (N, 3))).astype(np.float32)
    rots = rng.normal(size=(N, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    opac = (1 / (1 + np.exp(-rng.normal(size=(N, 1))))).astype(np.float32)
    shs = (rng.normal(size=(N, 16, 3)) * 0.3).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, rots, opac, shs)))


def make_camera():
    from guidedvd3dgs_tpu.ops.projection import RasterCamera
    from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix, getWorld2View2

    fov = math.radians(60)
    view = np.asarray(getWorld2View2(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))).T
    proj = np.asarray(getProjectionMatrix(0.01, 100.0, fov, fov)).T
    return RasterCamera(
        jnp.asarray(view), jnp.asarray(view @ proj),
        jnp.asarray(np.linalg.inv(view.T)[:3, 3]),
        math.tan(fov / 2), math.tan(fov / 2), H, W,
    )


_LATENCY_MS = [0.0]


def _calibrate_latency():
    """One dispatch+readback round trip through the remote (axon) TPU
    tunnel costs ~28 ms; subtract it so the metric is device time."""
    empty = jax.jit(lambda v: v.sum() + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(empty(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(empty(x))
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    _LATENCY_MS[0] = best


REPS = int(os.environ.get("GVD_BENCH_REPS", "5"))


def _timed(rep_fn, args):
    """block_until_ready is NOT a reliable completion barrier through the
    remote (axon) TPU tunnel — only a host readback is. The rep_fn's scan
    amortizes the dispatch+readback latency over ITERS and the calibrated
    latency is subtracted. Median-of-REPS with the full series recorded:
    round 3 saw a single capture swing the headline 69.5 -> 101.7 ms, so a
    lone best-of-2 is not a metric."""
    out = rep_fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + warm, forced readback
    series = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = rep_fn(*args)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        series.append(
            max((time.perf_counter() - t0) * 1000.0 - _LATENCY_MS[0], 0.0) / ITERS
        )
    med = float(np.median(series))
    stats = {
        "median_ms": round(med, 3),
        "min_ms": round(min(series), 3),
        "max_ms": round(max(series), 3),
        "series_ms": [round(s, 3) for s in series],
    }
    return med, stats, out


def bench():
    from guidedvd3dgs_tpu.ops import raster_tiles
    from guidedvd3dgs_tpu.ops.raster_tiles import CHUNK, rasterize_tiles

    # GVD_MM_PRECISION=high: 3-pass f32 split kernels (~1e-5 relative) for
    # precision/perf A-B runs; default stays exact-f32 HIGHEST
    if os.environ.get("GVD_MM_PRECISION", "").lower() == "high":
        raster_tiles.set_matmul_precision(jax.lax.Precision.HIGH)

    cam = make_camera()
    bg = jnp.zeros((3,), jnp.float32)
    args = make_inputs()
    _calibrate_latency()

    # demand probe -> trainer-style adaptive instance buffer (1.3x headroom)
    demand = int(
        jax.jit(lambda *a: rasterize_tiles(*a, cam, bg, sh_degree=3).num_instances)(*args)
    )
    mi = -(-int(demand * 1.3) // CHUNK) * CHUNK

    def loss(m, s, r, o, sh):
        out = rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3, max_instances=mi)
        return out.color.sum() + 0.1 * out.depth.sum() + 0.1 * out.alpha.sum()

    # repeat inside one jit so host->device dispatch latency (large through
    # remote-attached TPUs) does not pollute the timing; the carry perturbs
    # the inputs so XLA cannot hoist work out of the loop
    @jax.jit
    def fwd_rep(m, s, r, o, sh):
        def body(carry, _):
            val = loss(m + carry * 0.0, s, r, o, sh)
            return val * 0.0, val

        return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[1]

    fwd_ms, fwd_stats, _ = _timed(fwd_rep, args)

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def g_rep(m, s, r, o, sh):
        def body(carry, _):
            val, grads = vg(m + carry * 0.0, s, r, o, sh)
            gsum = jnp.stack([jnp.mean(x) for x in jax.tree.leaves(grads)])
            return val * 0.0, (val, gsum)

        _, (vals, grads) = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return vals, grads

    ms, bwd_stats, out = _timed(g_rep, args)
    finite = all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(out[1]))
    # model-FLOP estimate for achieved-throughput tracking: every binned
    # instance touches its tile's 256 pixels; ~40 f32 ops/instance-pixel in
    # the fwd blend (conic quadratic + exp + transmittance recurrence), ~2.5x
    # that for fwd+bwd (replay + moment accumulation). Binning/sort/preprocess
    # excluded — this is blend-kernel model-throughput, not a hardware counter.
    blend_flops_fwd = demand * 256 * 40
    detail = {
        "fwd_ms": round(fwd_ms, 3),
        "fwd_bwd_ms": round(ms, 3),
        "fwd_stats": fwd_stats,
        "fwd_bwd_stats": bwd_stats,
        "instance_demand": demand,
        "max_instances": mi,
        "grads_finite": finite,
        "model_gflops_fwd": round(blend_flops_fwd / (fwd_ms * 1e6), 1),
        "model_gflops_fwd_bwd": round(2.5 * blend_flops_fwd / (ms * 1e6), 1),
        "dispatch_latency_ms": round(_LATENCY_MS[0], 3),
        "device": str(jax.devices()[0]),
    }
    if not finite:
        raise RuntimeError(f"non-finite gradients in bench; detail={detail}")
    return ms, detail


def _probe_backend(timeout_s: int = 300) -> bool:
    """Bounded backend-init probe in a subprocess: the axon TPU tunnel can be
    UNAVAILABLE for hours, and jax.devices() then hangs far longer than any
    driver timeout — fail fast with a JSON line instead."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    try:
        if not _probe_backend(int(os.environ.get("GVD_BENCH_PROBE_S", "300"))):
            raise RuntimeError(
                "backend init probe failed/timed out (TPU tunnel down?)"
            )
        ms, detail = bench()
        with open(DETAIL_PATH, "w") as f:
            json.dump(detail, f, indent=1)
            f.write("\n")
        print(json.dumps({
            "metric": "raster_fwd_bwd_ms_1m_splats_320x448",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(REFERENCE_MS / ms, 3),
        }))
    except Exception:  # never leave the driver without a JSON line
        tb = traceback.format_exc()
        sys.stderr.write(f"bench failed:\n{tb}\n")
        try:
            with open(DETAIL_PATH, "w") as f:
                json.dump({"error": tb}, f, indent=1)
                f.write("\n")
        except Exception:
            pass
        print(json.dumps({
            "metric": "raster_fwd_bwd_ms_1m_splats_320x448",
            "value": -1.0,
            "unit": "ms",
            "vs_baseline": 0.0,
        }))
        sys.exit(0)


if __name__ == "__main__":
    main()
