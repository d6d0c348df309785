#!/usr/bin/env python
"""VAE decode fwd/grad profile at the production frame size (320x448).

The guided step spends ~1.4 s (27%) in 25 per-frame decode gradients
(GUIDED_STEP_PROFILE.json decode_grads_serial); this decomposes one frame:
decode fwd, decode fwd+vjp, and the same with jax.checkpoint at resblock
granularity if enabled. Writes VAE_DECODE_PROFILE.json.
"""

from __future__ import annotations

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

H, W = 320, 448
ITERS = 8


def timed(name, fn, args, out):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    comp = time.time() - t0
    ma = compiled.memory_analysis()
    r = compiled(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        r = compiled(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        best = min(best, time.time() - t1)
    ms = max(best * 1000.0 - 30.0, 0.0) / ITERS
    out[name] = {"ms": round(ms, 2), "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                 "compile_s": round(comp, 1)}
    print(f"{name:28s} {ms:8.2f} ms  temp {out[name]['temp_gb']} GB", flush=True)


def main():
    from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
    from guidedvd3dgs_tpu.diffusion.model import LatentDiffusionConfig, decode_frame
    from guidedvd3dgs_tpu.diffusion.synthesis import SynthesisConfig

    mcfg = LatentDiffusionConfig(compute_dtype="bfloat16")
    scfg = SynthesisConfig(ddim_steps=50)
    params = init_diffusion_params(mcfg, scfg, jax.random.key(0))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    z = jax.random.normal(jax.random.key(1), (H // 8, W // 8, 4))
    g = jax.random.uniform(jax.random.key(2), (H, W, 3))
    out = {}

    def scan8(body):
        def f(*args):
            def step(c, _):
                y = body(*args, c)
                return y.ravel()[0] * 0.0, y.ravel()[0]
            return jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)[1]
        return f

    timed("decode_fwd", scan8(lambda p, zz, c: decode_frame(p, mcfg, zz + c)),
          (params, z), out)

    def dgrad(p, zz, c):
        def loss(q):
            d = decode_frame(p, mcfg, q)
            return ((d - g) ** 2).sum()
        return jax.grad(loss)(zz + c)

    timed("decode_fwd_vjp", scan8(dgrad), (params, z), out)

    # cost analysis of the fwd
    c = jax.jit(lambda p, zz: decode_frame(p, mcfg, zz)).lower(params, z).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out["fwd_flops_tf"] = round(ca.get("flops", 0) / 1e12, 3)
    out["fwd_bytes_gb"] = round(ca.get("bytes accessed", 0) / 2**30, 2)
    print("fwd cost:", out["fwd_flops_tf"], "TF,", out["fwd_bytes_gb"], "GiB", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "VAE_DECODE_PROFILE.json")
    write_artifact(path, out)


if __name__ == "__main__":
    main()
