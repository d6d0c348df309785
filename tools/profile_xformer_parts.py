#!/usr/bin/env python
"""Internal decomposition of the UNet level-0 spatial and temporal
transformers at ch=320 (the residual hotspots after the flash block-size
fix: spatial ~8.4 ms, temporal ~9.8 ms per application, x6 blocks each).

Times each piece in isolation: group norm + projections, attn1 (flash),
attn2 text cross (kv 77), attn2 image cross (kv 16), GEGLU FF, layer norms,
and the temporal relayout transposes. Writes XFORMER_PARTS_PROFILE.json.
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

T, HL, WL, CH = 25, 40, 56, 320
HEADS, DH = 5, 64
N = HL * WL
ITERS = 8
DISPATCH_MS = 24.0


def timed(name, fn, args, out):
    t0 = time.time()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
    except Exception as e:
        print(f"{name:30s} COMPILE FAIL {repr(e)[:160]}", flush=True)
        out[name] = None
        return
    comp = time.time() - t0
    r = compiled(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t1 = time.time()
        r = compiled(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        best = min(best, time.time() - t1)
    ms = max(best * 1000.0 - DISPATCH_MS, 0.0) / ITERS
    out[name] = round(ms, 3)
    print(f"{name:30s} {ms:8.2f} ms  (compile {comp:.1f}s)", flush=True)


def scan_wrap(body):
    def f(*args):
        def step(c, _):
            y = body(*args, c)
            return (y.ravel()[0] * 0).astype(jnp.bfloat16), y.ravel()[0]

        return jax.lax.scan(step, jnp.bfloat16(0.0), None, length=ITERS)[1]

    return f


def main():
    from guidedvd3dgs_tpu.diffusion.nnops import (
        attention, gelu, group_norm, layer_norm, linear,
        merge_heads, split_heads,
    )

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.05, jnp.bfloat16)

    p = {}
    for nm, o, i in (
        ("proj_in", CH, CH), ("proj_out", CH, CH),
        ("to_q", CH, CH), ("to_k", CH, CH), ("to_v", CH, CH), ("to_out.0", CH, CH),
        ("to_k77", CH, 1024), ("to_v77", CH, 1024),
        ("to_k16", CH, 1024), ("to_v16", CH, 1024),
        ("ff.net.0.proj", CH * 8, CH), ("ff.net.2", CH, CH * 4),
    ):
        p[f"{nm}.weight"] = mk(o, i)
        p[f"{nm}.bias"] = mk(o)
    p["gn.weight"], p["gn.bias"] = mk(CH), mk(CH)
    p["ln.weight"], p["ln.bias"] = mk(CH), mk(CH)

    x4 = mk(T, HL, WL, CH)       # spatial activations
    xs = mk(T, N, CH)            # spatial tokens
    xt = mk(N, T, CH)            # temporal tokens
    ctx77 = mk(T, 77, 1024)
    ctx16 = mk(T, 16, 1024)
    out = {}
    scale = DH ** -0.5

    timed("gn_spatial", scan_wrap(lambda p, x, c: group_norm(p, "gn", x + c, eps=1e-6)), (p, x4), out)
    timed("ln_tokens", scan_wrap(lambda p, x, c: layer_norm(p, "ln", x + c)), (p, xs), out)
    timed("proj_inout", scan_wrap(
        lambda p, x, c: linear(p, "proj_out", linear(p, "proj_in", x + c))), (p, xs), out)

    def attn_self(p, x, c):
        h = x + c
        q = split_heads(linear(p, "to_q", h), HEADS)
        k = split_heads(linear(p, "to_k", h), HEADS)
        v = split_heads(linear(p, "to_v", h), HEADS)
        return linear(p, "to_out.0", merge_heads(attention(q, k, v, scale)))

    timed("attn1_full_flash", scan_wrap(attn_self), (p, xs), out)

    def attn_cross(p, x, cc, c, kn, vn):
        h = x + c
        q = split_heads(linear(p, "to_q", h), HEADS)
        k = split_heads(linear(p, kn, cc), HEADS)
        v = split_heads(linear(p, vn, cc), HEADS)
        return linear(p, "to_out.0", merge_heads(attention(q, k, v, scale)))

    timed("attn2_text77", scan_wrap(
        lambda p, x, cc, c: attn_cross(p, x, cc, c, "to_k77", "to_v77")), (p, xs, ctx77), out)
    timed("attn2_img16", scan_wrap(
        lambda p, x, cc, c: attn_cross(p, x, cc, c, "to_k16", "to_v16")), (p, xs, ctx16), out)

    def ff(p, x, c):
        h = linear(p, "ff.net.0.proj", x + c)
        a, g = jnp.split(h, 2, axis=-1)
        return linear(p, "ff.net.2", a * gelu(g))

    timed("ff_geglu", scan_wrap(ff), (p, xs), out)

    # temporal-layout pieces
    timed("relayout_t", scan_wrap(
        lambda x, c: (x + c).transpose(0, 2, 3, 1, 4)),
        (mk(1, T, HL, WL, CH),), out)
    timed("attn_temporal", scan_wrap(attn_self), (p, xt), out)
    timed("ln_temporal", scan_wrap(lambda p, x, c: layer_norm(p, "ln", x + c)), (p, xt), out)
    timed("ff_temporal", scan_wrap(ff), (p, xt), out)
    timed("proj_temporal", scan_wrap(
        lambda p, x, c: linear(p, "proj_out", linear(p, "proj_in", x + c))), (p, xt), out)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "XFORMER_PARTS_PROFILE.json",
    )
    write_artifact(path, out)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
