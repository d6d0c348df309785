#!/usr/bin/env python
"""Per-block UNet forward profile at the production shape (VERDICT r3 #1:
"the 466 ms UNet fwd is unprofiled").

Walks build_layout(cfg), derives each block's input shape, and times
_apply_layers per block in isolation (unique (shape, structure) signatures
are timed once and multiplied by their count). Sum-of-blocks ~ composed
forward modulo fusion across block boundaries. Writes UNET_BLOCK_PROFILE
.json at the repo root with per-kind totals (res / spatial / temporal /
up-down) per pyramid level.
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

T, H, W = 25, 320, 448


def main():
    from guidedvd3dgs_tpu.diffusion.init import init_diffusion_params
    from guidedvd3dgs_tpu.diffusion.model import LatentDiffusionConfig
    from guidedvd3dgs_tpu.diffusion.synthesis import SynthesisConfig
    from guidedvd3dgs_tpu.diffusion.unet3d import _apply_layers, build_layout

    mcfg = LatentDiffusionConfig(compute_dtype="bfloat16")
    mcfg = dataclasses.replace(
        mcfg, unet=dataclasses.replace(mcfg.unet, temporal_length=T)
    )
    cfg = mcfg.unet
    scfg = SynthesisConfig(ddim_steps=50)
    print("initializing params ...", flush=True)
    params = init_diffusion_params(mcfg, scfg, jax.random.key(0))
    up = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params.unet)

    input_blocks, middle, output_blocks = build_layout(cfg)
    bt = T  # batch 1
    emb = jnp.zeros((bt, 4 * cfg.model_channels), jnp.bfloat16)
    ctx = jnp.zeros((bt, cfg.text_context_len + cfg.image_tokens_per_frame,
                     cfg.context_dim), jnp.bfloat16)

    lh, lw = H // 8, W // 8

    # walk shapes: (h, w, in_ch) per block, mirroring unet_apply
    def walk():
        shapes = []
        ch, ds = cfg.in_channels, 1
        hh, ww = lh, lw
        for layers in input_blocks:
            shapes.append(("in", layers, (hh, ww, ch)))
            for kind, _, meta in layers:
                if kind == "conv_in":
                    ch = cfg.model_channels
                elif kind == "res":
                    ch = meta["out_ch"]
                elif kind == "down":
                    hh, ww = (hh + 1) // 2, (ww + 1) // 2
                    ds *= 2
        skips = []  # channel of each input block output
        # rebuild skip channels by replaying
        ch2 = cfg.in_channels
        sk = []
        for layers in input_blocks:
            for kind, _, meta in layers:
                if kind == "conv_in":
                    ch2 = cfg.model_channels
                elif kind == "res":
                    ch2 = meta["out_ch"]
            sk.append(ch2)
        shapes.append(("mid", middle, (hh, ww, ch2)))
        for layers in output_blocks:
            ich = sk.pop()
            shapes.append(("out", layers, (hh, ww, ch2 + ich)))
            for kind, _, meta in layers:
                if kind == "res":
                    ch2 = meta["out_ch"]
                elif kind == "up":
                    hh, ww = hh * 2, ww * 2
        return shapes

    shapes = walk()
    # dedupe by signature
    sig_of = {}
    order = []
    for tag, layers, (hh, ww, ch) in shapes:
        struct = tuple(
            (k, tuple(sorted(m.items())) if m else ()) for k, _, m in layers
        )
        sig = (struct, hh, ww, ch)
        if sig not in sig_of:
            sig_of[sig] = {"tag": tag, "layers": layers, "shape": (hh, ww, ch),
                           "count": 0}
            order.append(sig)
        sig_of[sig]["count"] += 1

    out = {"blocks": [], "by_kind": {}}
    total = 0.0
    for sig in order:
        e = sig_of[sig]
        hh, ww, ch = e["shape"]
        h = jax.random.normal(jax.random.key(1), (bt, hh, ww, ch), jnp.bfloat16)

        ITERS = 8

        def f(p, hx, ebx, cx, layers=e["layers"]):
            # scan amortizes the ~30 ms tunnel dispatch latency over ITERS;
            # the carry perturbation stops XLA hoisting the block out
            def body(carry, _):
                y = _apply_layers(p, layers, hx + carry, ebx, cx, cfg, 1)
                return (y.ravel()[0] * 0).astype(hx.dtype), y.ravel()[0]
            return jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)[1]

        t0 = time.time()
        try:
            compiled = jax.jit(f).lower(up, h, emb, ctx).compile()
        except Exception as ex:
            print(f"{e['tag']} {e['shape']} COMPILE FAIL {repr(ex)[:200]}", flush=True)
            continue
        comp = time.time() - t0
        r = compiled(up, h, emb, ctx)
        np.asarray(r.ravel()[:1])
        best = float("inf")
        for _ in range(3):
            t1 = time.time()
            r = compiled(up, h, emb, ctx)
            np.asarray(r.ravel()[:1])
            best = min(best, time.time() - t1)
        ms = max(best * 1000.0 - 30.0, 0.0) / ITERS
        kinds = "+".join(k for k, _, _ in e["layers"])
        row = {"tag": e["tag"], "shape": [hh, ww, ch], "kinds": kinds,
               "count": e["count"], "ms_one": round(ms, 2),
               "ms_total": round(ms * e["count"], 2),
               "compile_s": round(comp, 1)}
        out["blocks"].append(row)
        total += ms * e["count"]
        print(f"{e['tag']:4s} {str(e['shape']):16s} x{e['count']} {kinds:30s}"
              f" {ms:7.2f} ms (total {ms*e['count']:8.2f})", flush=True)
    out["sum_ms"] = round(total, 1)
    print(f"sum over blocks: {total:.1f} ms (composed fwd measured ~466 ms"
          f" - each isolated timing carries ~30 ms dispatch latency x reps)",
          flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "UNET_BLOCK_PROFILE.json")
    write_artifact(path, out)


if __name__ == "__main__":
    main()
