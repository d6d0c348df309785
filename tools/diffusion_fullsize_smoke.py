#!/usr/bin/env python
"""Full-size diffusion memory/throughput smoke on one TPU chip.

Validates the real ViewCrafter workload shape (BASELINE.md: 320x448x25
video, model_channels 320, context 1024, ViT-H conditioning; the reference
needs ~32 GB fp16-autocast on V100) with random weights:

  stage A: conditioning build (CLIP text+image, resampler, per-frame VAE
           encode) + ONE cond/uncond UNet forward (bf16 compute)
  stage B: ONE guided DDIM step — vjp through the UNet pair + per-frame
           differentiable VAE decode (remat'd UNet blocks)
  stage C (--full): a complete 50-step guided sample

Prints per-stage wall-clock + device memory stats. Run serialized — this
host has ONE CPU core and compiles are expensive.
"""

from __future__ import annotations

import argparse
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



def force(x):
    """Completion barrier: block_until_ready is NOT reliable through the
    remote (axon) TPU tunnel — only a host readback is (see bench.py)."""
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.ravel()[0:1])


def mem_stats():
    try:
        s = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 2),
            "peak_bytes_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 2),
        }
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also run the 50-step sample")
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=448)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import dataclasses

    from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
    from guidedvd3dgs_tpu.diffusion.model import LatentDiffusionConfig, apply_model
    from guidedvd3dgs_tpu.diffusion.synthesis import (
        SynthesisConfig, build_conditioning, image_guided_synthesis,
    )
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import GuidedSampleConfig
    from guidedvd3dgs_tpu.guidance.loss_guidance import make_guidance_fn, resize_guidance

    T, H, W = args.frames, args.height, args.width
    timings = {}  # per-stage seconds, persisted in DIFFUSION_SMOKE.json

    def write_json():
        # incremental: a late-stage crash must not lose earlier evidence
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "DIFFUSION_SMOKE.json",
        )
        write_artifact(path, {"params_m": round(tot / 1e6), "mem": mem_stats(),
                              "shape": [T, H, W], "steps": args.steps,
                              "timings": timings})
    mcfg = LatentDiffusionConfig(compute_dtype="bfloat16")
    mcfg = dataclasses.replace(
        mcfg,
        unet=dataclasses.replace(mcfg.unet, temporal_length=T, remat=True),
    )
    scfg = SynthesisConfig(ddim_steps=args.steps)

    print("initializing random full-size params ...", flush=True)
    t0 = time.time()
    params = init_diffusion_params(mcfg, scfg, jax.random.key(0))
    tot = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"  {tot/1e6:.0f}M params in {time.time()-t0:.0f}s", flush=True)
    # bf16 weights on device (the reference holds fp32 master + autocast;
    # inference-only here, so bf16 storage halves HBM)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    force(params)
    print(f"  placed bf16: {mem_stats()}", flush=True)

    rng = jax.random.key(1)
    video = jax.random.uniform(jax.random.key(2), (T, H, W, 3)) * 2.0 - 1.0

    # --- stage A: conditioning + one UNet fwd -------------------------------
    t0 = time.time()
    cond, uncond, _ = build_conditioning(params, mcfg, scfg, video, rng)
    force(cond.context)
    timings["conditioning_s"] = round(time.time() - t0, 1)
    print(f"A1 conditioning built in {time.time()-t0:.0f}s {mem_stats()}", flush=True)

    x = jax.random.normal(jax.random.key(3), (1, T, H // 8, W // 8, 4))

    # params/cond are jit ARGUMENTS — closing over them embeds 2.9 GB of
    # weights as executable constants (slow lowering, duplicated HBM)
    fwd = jax.jit(lambda p, c, x, t: apply_model(p, mcfg, x, t, c))
    t0 = time.time()
    v = fwd(params, cond, x, jnp.asarray([500]))
    force(v)
    compile_s = time.time() - t0
    t0 = time.time()
    v = fwd(params, cond, x, jnp.asarray([500]))
    force(v)
    timings["unet_fwd_compile_s"] = round(compile_s, 1)
    timings["unet_fwd_run_s"] = round(time.time() - t0, 3)
    write_json()
    print(
        f"A2 UNet fwd: compile {compile_s:.0f}s, run {1000*(time.time()-t0):.0f}ms, "
        f"finite={bool(jnp.isfinite(v.astype(jnp.float32)).all())} {mem_stats()}",
        flush=True,
    )

    # --- stage B: one guided DDIM step --------------------------------------
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import _guided_step
    from guidedvd3dgs_tpu.diffusion.schedules import make_ddim_params

    gi = jax.random.uniform(jax.random.key(4), (T, 3, H, W))
    buffers = resize_guidance(gi, H, W, masks=jnp.ones((T, 1, H, W)),
                              depths=jnp.ones((T, 1, H, W)))

    sched = mcfg.schedule()
    pr = make_ddim_params(sched, scfg.ddim_steps, eta=scfg.ddim_eta,
                          method=scfg.timestep_spacing)

    gcfg = GuidedSampleConfig(cfg_scale=scfg.cfg_scale,
                              guidance_rescale=scfg.guidance_rescale)

    def step(p, c, u, bufs, x, i, key):
        gf = make_guidance_fn(bufs)  # built INSIDE jit from the bufs args
        return _guided_step(p, mcfg, sched, pr, c, u, gcfg, gf,
                            jnp.float32(1.0), x, i, key)

    step_fn = jax.jit(step)
    t0 = time.time()
    out = step_fn(params, cond, uncond, buffers, x,
                  jnp.int32(scfg.ddim_steps - 1), jax.random.key(5))
    force(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = step_fn(params, cond, uncond, buffers, x,
                  jnp.int32(scfg.ddim_steps - 1), jax.random.key(5))
    force(out)
    timings["guided_step_compile_s"] = round(compile_s, 1)
    timings["guided_step_run_s"] = round(time.time() - t0, 2)
    write_json()
    xp = out[0]
    print(
        f"B guided step: compile {compile_s:.0f}s, run {time.time()-t0:.1f}s, "
        f"finite={bool(jnp.isfinite(xp.astype(jnp.float32)).all())} {mem_stats()}",
        flush=True,
    )

    if args.full:
        # HOST-LOOPED sampler: one compiled program per piece, reusing the
        # stage-B step executable. A single jitted whole-synthesis program
        # (conditioning + 50-step scan + per-frame decode in ONE
        # executable) crashed the TPU worker at this size — its program
        # text alone exceeds 1 GB on top of the ~11.8 GB working set. The
        # host loop costs 50 dispatches (~25 ms each through the tunnel)
        # against ~260 s of step compute — noise. The reference runs the
        # same structure (a python loop over DDIM steps,
        # ddim_guidance.py:136-202).
        from guidedvd3dgs_tpu.diffusion.model import decode_video_frames

        lh, lw = H // 8, W // 8
        key = jax.random.key(6)
        key, nk = jax.random.split(key)
        xs = jax.random.normal(nk, (1, T, lh, lw, 4), jnp.float32)
        t0 = time.time()
        for i in range(scfg.ddim_steps - 1, -1, -1):
            key, sk = jax.random.split(key)
            out = step_fn(params, cond, uncond, buffers, xs, jnp.int32(i), sk)
            xs = out[0]
        dec = jax.jit(lambda p, z: decode_video_frames(p, mcfg, z))
        frames = dec(params, xs[0])
        force(frames)
        timings["full_sample_s"] = round(time.time() - t0, 1)
        timings["full_sample_mode"] = "host_loop"
        print(
            f"C full {scfg.ddim_steps}-step guided sample (host loop): "
            f"{timings['full_sample_s']:.0f}s incl. decode compile, "
            f"finite={bool(jnp.isfinite(frames.astype(jnp.float32)).all())} {mem_stats()}",
            flush=True,
        )

    write_json()
    print("OK")


if __name__ == "__main__":
    main()
