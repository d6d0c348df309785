#!/usr/bin/env python
"""VERDICT r3 #1: profile + optimize the full-size guided DDIM step.

Sweeps the GuidedSampleConfig perf knobs (pair_mode x decode_chunk) at the
production shape (25x320x448, model_channels 320): each variant is AOT
compiled, its XLA memory budget read (Compiled.memory_analysis — the only
memory telemetry the tunneled TPU exposes), and executed only if the
estimated peak fits under --exec-limit-gb (an OOM can wedge the TPU worker
for hours). Also decomposes the step for the chosen variants: CFG pair fwd
only, pair fwd+vjp, decode-grads only.

Writes GUIDED_STEP_PROFILE.json at the repo root.
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

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "GUIDED_STEP_PROFILE.json")


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def mem_of(compiled):
    ma = compiled.memory_analysis()
    return {
        "argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
        "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
        "code_mb": round(ma.generated_code_size_in_bytes / 2**20, 1),
        "peak_est_gb": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes) / 2**30, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=448)
    ap.add_argument("--exec-limit-gb", type=float, default=14.0)
    ap.add_argument("--variants", type=str,
                    default="serial_ckpt:1,serial:1,batched:1,serial:5,serial_ckpt:5")
    ap.add_argument("--decompose", action="store_true",
                    help="also time pair-fwd / pair-vjp / decode-grads pieces")
    ap.add_argument("--free-encoders", action="store_true",
                    help="after building conditioning, FREE the CLIP/"
                         "resampler/VAE-encoder weights from HBM and run the "
                         "step with sampler_params only (the engine's "
                         "encoder_residency='offload' discipline) — raises "
                         "the realistic exec budget by ~2 GB")
    args = ap.parse_args()

    from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
    from guidedvd3dgs_tpu.diffusion.model import LatentDiffusionConfig, apply_model
    from guidedvd3dgs_tpu.diffusion.synthesis import SynthesisConfig, build_conditioning
    from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import (
        GuidedSampleConfig, _guided_step, _per_frame_guidance_grads,
    )
    from guidedvd3dgs_tpu.diffusion.model import decode_frame
    from guidedvd3dgs_tpu.diffusion.schedules import make_ddim_params
    from guidedvd3dgs_tpu.guidance.loss_guidance import make_guidance_fn, resize_guidance

    T, H, W = args.frames, args.height, args.width
    mcfg = LatentDiffusionConfig(compute_dtype="bfloat16")
    mcfg = dataclasses.replace(
        mcfg, unet=dataclasses.replace(mcfg.unet, temporal_length=T, remat=True)
    )
    scfg = SynthesisConfig(ddim_steps=50)

    out = {"shape": [T, H, W], "variants": {}}

    def write():
        write_artifact(OUT_PATH, out)

    print("initializing params (host) ...", flush=True)
    params = init_diffusion_params(mcfg, scfg, jax.random.key(0))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    force(params)

    video = jax.random.uniform(jax.random.key(2), (T, H, W, 3)) * 2.0 - 1.0
    t0 = time.time()
    cond, uncond, _ = build_conditioning(params, mcfg, scfg, video, jax.random.key(1))
    for leaf in jax.tree.leaves((cond, uncond)):
        np.asarray(leaf.ravel()[0:1])
    print(f"conditioning built in {time.time()-t0:.0f}s", flush=True)

    if args.free_encoders:
        # the engine's encoder_residency='offload' discipline: the step only
        # ever sees UNet + VAE-decoder weights; CLIP/resampler/VAE-encoder
        # buffers are deleted from HBM before any step executable runs
        from guidedvd3dgs_tpu.diffusion.synthesis import sampler_params

        slim = sampler_params(params)
        slim_ids = {id(l) for l in jax.tree.leaves(slim)}
        freed = 0
        for leaf in jax.tree.leaves(params):
            if id(leaf) not in slim_ids and hasattr(leaf, "delete"):
                freed += leaf.size * leaf.dtype.itemsize
                leaf.delete()
        params = slim
        out["freed_encoder_gb"] = round(freed / 2**30, 2)
        print(f"freed {out['freed_encoder_gb']} GB of encoder weights", flush=True)
    x = jax.random.normal(jax.random.key(3), (1, T, H // 8, W // 8, 4))

    gi = jax.random.uniform(jax.random.key(4), (T, 3, H, W))
    buffers = resize_guidance(gi, H, W, masks=jnp.ones((T, 1, H, W)),
                              depths=jnp.ones((T, 1, H, W)))
    sched = mcfg.schedule()
    pr = make_ddim_params(sched, scfg.ddim_steps, eta=scfg.ddim_eta,
                          method=scfg.timestep_spacing)

    mcfg_noblock = dataclasses.replace(
        mcfg, unet=dataclasses.replace(mcfg.unet, remat=False)
    )

    for spec in args.variants.split(","):
        parts = spec.split(":")
        mode, ck = parts[0], int(parts[1])
        noblock = len(parts) > 2 and parts[2] == "noblock"
        name = f"{mode}:{ck}" + (":noblock" if noblock else "")
        vcfg = mcfg_noblock if noblock else mcfg
        gcfg = GuidedSampleConfig(
            cfg_scale=scfg.cfg_scale, guidance_rescale=scfg.guidance_rescale,
            pair_mode=mode, decode_chunk=ck,
        )

        def step(p, c, u, bufs, xv, i, key, vcfg=vcfg, gcfg=gcfg):
            gf = make_guidance_fn(bufs)
            return _guided_step(p, vcfg, sched, pr, c, u, gcfg, gf,
                                jnp.float32(1.0), xv, i, key)

        row = {}
        t0 = time.time()
        try:
            compiled = jax.jit(step).lower(
                params, cond, uncond, buffers, x,
                jnp.int32(scfg.ddim_steps - 1), jax.random.key(5)).compile()
            row["compile_s"] = round(time.time() - t0, 1)
            row["mem"] = mem_of(compiled)
            print(f"{name:16s} compile {row['compile_s']}s mem {row['mem']}", flush=True)
            if row["mem"]["peak_est_gb"] <= args.exec_limit_gb:
                r = compiled(params, cond, uncond, buffers, x,
                             jnp.int32(scfg.ddim_steps - 1), jax.random.key(5))
                force(r)
                best = float("inf")
                for _ in range(2):
                    t1 = time.time()
                    r = compiled(params, cond, uncond, buffers, x,
                                 jnp.int32(scfg.ddim_steps - 1), jax.random.key(5))
                    force(r)
                    best = min(best, time.time() - t1)
                row["step_s"] = round(best, 2)
                row["finite"] = bool(jnp.isfinite(r[0].astype(jnp.float32)).all())
                print(f"{name:16s} step {row['step_s']}s finite={row['finite']}", flush=True)
            else:
                row["skipped"] = f"peak_est > {args.exec_limit_gb} GB"
                print(f"{name:16s} SKIPPED ({row['skipped']})", flush=True)
        except Exception as e:
            row["error"] = repr(e)[:2500]
            print(f"{name:16s} ERROR {row['error']}", flush=True)
        out["variants"][name] = row
        write()

    if args.decompose:
        t = jnp.asarray([500])
        dec = {}

        def pair_fwd(p, c, u, xv):
            cu = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), c, u)
            xb = jnp.concatenate([xv, xv], 0)
            tb = jnp.concatenate([t, t], 0)
            return apply_model(p, mcfg, xb, tb, cu)

        def pair_vjp(p, c, u, xv):
            y, vjp = jax.vjp(lambda xv_: pair_fwd(p, c, u, xv_), xv)
            return vjp(jnp.ones_like(y))

        def decode_grads(p, bufs, zs):
            gf = make_guidance_fn(bufs)

            def floss(zf, fi):
                d = decode_frame(p, mcfg, zf)
                return gf(d, jnp.int32(0), fi)

            return _per_frame_guidance_grads(
                floss, zs, GuidedSampleConfig(decode_chunk=1))

        for nm, fn, fargs in [
            ("pair_fwd_batched", pair_fwd, (params, cond, uncond, x)),
            ("pair_vjp_batched", pair_vjp, (params, cond, uncond, x)),
            ("decode_grads_serial", decode_grads, (params, buffers, x[0])),
        ]:
            try:
                t0 = time.time()
                compiled = jax.jit(fn).lower(*fargs).compile()
                mem = mem_of(compiled)
                if mem["peak_est_gb"] > args.exec_limit_gb:
                    dec[nm] = {"mem": mem, "skipped": "over limit"}
                    continue
                r = compiled(*fargs)
                force(r)
                t1 = time.time()
                r = compiled(*fargs)
                force(r)
                dec[nm] = {"mem": mem, "run_s": round(time.time() - t1, 3),
                           "compile_s": round(t1 - t0, 1)}
                print(f"{nm:22s} {dec[nm]}", flush=True)
            except Exception as e:
                dec[nm] = {"error": repr(e)[:2500]}
                print(f"{nm:22s} ERROR {dec[nm]['error']}", flush=True)
            out["decompose"] = dec
            write()

    write()
    print("written", OUT_PATH)


if __name__ == "__main__":
    main()
