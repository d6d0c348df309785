#!/usr/bin/env python
"""AOT memory analysis of the full-size guided-step executable.

The axon-tunneled TPU exposes no runtime memory_stats, so when the guided
step OOMs (RESOURCE_EXHAUSTED with no sizes) the only quantitative signal
is XLA's own compile-time accounting: `Compiled.memory_analysis()` reports
argument/output/temp/code sizes WITHOUT executing anything. This tool
compiles the stage-B pieces of tools/diffusion_fullsize_smoke.py
separately and prints their budgets:

  P1  cond build + UNet fwd (the piece known to run: stage A)
  P2  vjp through the checkpointed CFG UNet pair only
  P3  the per-frame VAE decode-gradient scan only
  P4  the full guided DDIM step (P2 + P3 + rho/ddim plumbing)

Run serialized with other chip work (compiles go through the tunnel).
"""

from __future__ import annotations

import argparse
import dataclasses
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


def report(name, compiled, out):
    try:
        ma = compiled.memory_analysis()
        row = {
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
            "output_gb": round(ma.output_size_in_bytes / 2**30, 2),
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            "code_mb": round(ma.generated_code_size_in_bytes / 2**20, 1),
            "alias_gb": round(
                getattr(ma, "alias_size_in_bytes", 0) / 2**30, 2
            ),
        }
    except Exception as e:  # some backends return None / raise
        row = {"error": repr(e)}
    out[name] = row
    print(f"{name:28s} {row}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=448)
    args = ap.parse_args()

    from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
    from guidedvd3dgs_tpu.diffusion.model import (
        LatentDiffusionConfig, apply_model, decode_frame,
    )
    from guidedvd3dgs_tpu.diffusion.synthesis import (
        SynthesisConfig, build_conditioning,
    )
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import (
        GuidedSampleConfig, _guided_step,
    )
    from guidedvd3dgs_tpu.diffusion.schedules import make_ddim_params
    from guidedvd3dgs_tpu.guidance.loss_guidance import (
        make_guidance_fn, resize_guidance,
    )

    T, H, W = args.frames, args.height, args.width
    mcfg = LatentDiffusionConfig(compute_dtype="bfloat16")
    mcfg = dataclasses.replace(
        mcfg, unet=dataclasses.replace(mcfg.unet, temporal_length=T, remat=True)
    )
    scfg = SynthesisConfig(ddim_steps=50)

    print("initializing params (host) ...", flush=True)
    params = init_diffusion_params(mcfg, scfg, jax.random.key(0))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    video = jax.random.uniform(jax.random.key(2), (T, H, W, 3)) * 2.0 - 1.0
    cond, uncond, _ = build_conditioning(params, mcfg, scfg, video, jax.random.key(1))
    x = jax.random.normal(jax.random.key(3), (1, T, H // 8, W // 8, 4))
    t = jnp.asarray([500])

    gi = jax.random.uniform(jax.random.key(4), (T, 3, H, W))
    buffers = resize_guidance(gi, H, W, masks=jnp.ones((T, 1, H, W)),
                              depths=jnp.ones((T, 1, H, W)))
    sched = mcfg.schedule()
    pr = make_ddim_params(sched, scfg.ddim_steps, eta=scfg.ddim_eta,
                          method=scfg.timestep_spacing)
    gcfg = GuidedSampleConfig(cfg_scale=scfg.cfg_scale,
                              guidance_rescale=scfg.guidance_rescale)
    out = {}

    # P1: plain UNet fwd
    f1 = jax.jit(lambda p, c, xv: apply_model(p, mcfg, xv, t, c))
    t0 = time.time()
    report("P1 unet_fwd", f1.lower(params, cond, x).compile(), out)
    print(f"  compile {time.time()-t0:.0f}s", flush=True)

    # P2: vjp through the checkpointed, lax.map-serialized CFG pair
    def pair_vjp(p, c, u, xv):
        cu = jax.tree.map(lambda a, b: jnp.stack([a, b]), c, u)

        def f(xv_):
            vs = jax.lax.map(
                jax.checkpoint(lambda c_: apply_model(p, mcfg, xv_, t, c_)), cu
            )
            return vs[0] + scfg.cfg_scale * (vs[0] - vs[1])

        y, vjp = jax.vjp(f, xv)
        (gx,) = vjp(jnp.ones_like(y))
        return y, gx

    f2 = jax.jit(pair_vjp)
    t0 = time.time()
    report("P2 pair_vjp", f2.lower(params, cond, uncond, x).compile(), out)
    print(f"  compile {time.time()-t0:.0f}s", flush=True)

    # P3: per-frame decode-grad scan
    def decode_grads(p, zs):
        gf = make_guidance_fn(buffers)

        def floss(zf, fi):
            d = decode_frame(p, mcfg, zf)
            loss, numel = gf(d, jnp.int32(0), fi)
            return loss / numel

        def body(carry, inp):
            zf, fi = inp
            return carry, jax.grad(floss)(zf, fi)

        return jax.lax.scan(body, None, (zs, jnp.arange(zs.shape[0])))[1]

    f3 = jax.jit(decode_grads)
    t0 = time.time()
    report("P3 decode_grads", f3.lower(params, x[0]).compile(), out)
    print(f"  compile {time.time()-t0:.0f}s", flush=True)

    # P4: the full guided step
    def step(p, c, u, bufs, xv, i, key):
        gf = make_guidance_fn(bufs)
        return _guided_step(p, mcfg, sched, pr, c, u, gcfg, gf,
                            jnp.float32(1.0), xv, i, key)

    f4 = jax.jit(step)
    t0 = time.time()
    report("P4 guided_step", f4.lower(
        params, cond, uncond, buffers, x, jnp.int32(scfg.ddim_steps - 1),
        jax.random.key(5)).compile(), out)
    print(f"  compile {time.time()-t0:.0f}s", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "DIFFUSION_MEMORY.json")
    write_artifact(path, out)
    print("written", path)


if __name__ == "__main__":
    main()
