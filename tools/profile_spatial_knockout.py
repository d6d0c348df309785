#!/usr/bin/env python
"""Attribute the level-0 spatial transformer's measured 26 ms (UNET_L0_PROFILE
ch320 spatial_transformer) — its isolated parts sum to only ~10-14 ms
(XFORMER_PARTS_PROFILE), so either a part is slower in context or the old
fixed-24 ms dispatch subtraction at ITERS=8 left ±0.6 ms noise per part.

Strategy: measure the FULL production function, then the same function with
one sub-op knocked out (identity) at a time — the delta IS that op's
in-context cost, dispatch noise cancels. Plus layout microbenches for the
two anomalies the parts profile showed:
  * (56000,320)@(320,320) projection matmul: 1.553 ms/pair on (25,2240,320)
    vs 0.317 ms/pair on (2240,25,320) — same FLOPs, 5x apart;
  * layer_norm: 1.694 ms on (25,2240,320) vs 0.271 on (2240,25,320).

Writes SPATIAL_KNOCKOUT.json. Reference module being tuned:
third_party/ViewCrafter/lvdm/modules/attention.py:294-311 (the torch side
runs this under xformers; our bar is the v5e roofline, not torch).
"""

from __future__ import annotations

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
ITERS = 24
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SPATIAL_KNOCKOUT.json",
)

_LAT = [None]


def _calibrate():
    f = jax.jit(lambda x: x * 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(f(z))
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        np.asarray(f(z))
        ts.append((time.perf_counter() - t0) * 1000.0)
    _LAT[0] = float(np.median(ts))
    print(f"dispatch latency {_LAT[0]:.1f} ms", flush=True)


def scan_wrap(body):
    def f(*args):
        def step(c, _):
            y = body(*args, c)
            return (y.ravel()[0] * 0).astype(jnp.bfloat16), y.ravel()[0]

        return jax.lax.scan(step, jnp.bfloat16(0.0), None, length=ITERS)[1]

    return f


def timed(name, fn, args, out):
    t0 = time.time()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
    except Exception as e:
        print(f"{name:28s} COMPILE FAIL {repr(e)[:160]}", flush=True)
        out[name] = None
        return
    comp = time.time() - t0
    r = compiled(*args)
    np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
    best = float("inf")
    for _ in range(5):
        t1 = time.perf_counter()
        r = compiled(*args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t1)
    ms = max(best * 1000.0 - _LAT[0], 0.0) / ITERS
    out[name] = round(ms, 3)
    print(f"{name:28s} {ms:8.2f} ms  (compile {comp:.1f}s)", flush=True)


def main():
    from guidedvd3dgs_tpu.diffusion import attention as A
    from guidedvd3dgs_tpu.diffusion import nnops

    _calibrate()
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.05, jnp.bfloat16)

    emb_dim, ctx_dim = CH * 4, 1024
    p = {}
    pref = "spat"
    p[f"{pref}.norm.weight"], p[f"{pref}.norm.bias"] = mk(CH), mk(CH)
    for nm in ("proj_in", "proj_out"):
        p[f"{pref}.{nm}.weight"], p[f"{pref}.{nm}.bias"] = mk(CH, CH), mk(CH)
    tb = f"{pref}.transformer_blocks.0"
    for i in (1, 2, 3):
        p[f"{tb}.norm{i}.weight"], p[f"{tb}.norm{i}.bias"] = mk(CH), mk(CH)
    for an in ("attn1", "attn2"):
        for nm in ("to_q", "to_out.0"):
            p[f"{tb}.{an}.{nm}.weight"] = mk(CH, CH)
            p[f"{tb}.{an}.{nm}.bias"] = mk(CH)
        kv_in = CH if an == "attn1" else ctx_dim
        for nm in ("to_k", "to_v"):
            p[f"{tb}.{an}.{nm}.weight"] = mk(CH, kv_in)
    for nm in ("to_k_ip", "to_v_ip"):
        p[f"{tb}.attn2.{nm}.weight"] = mk(CH, ctx_dim)
    p[f"{tb}.ff.net.0.proj.weight"] = mk(CH * 8, CH)
    p[f"{tb}.ff.net.0.proj.bias"] = mk(CH * 8)
    p[f"{tb}.ff.net.2.weight"] = mk(CH, CH * 4)
    p[f"{tb}.ff.net.2.bias"] = mk(CH)

    x = mk(T, HL, WL, CH)
    ctx = mk(T, 77 + 16, ctx_dim)
    out = {"_shape": f"({T},{HL},{WL},{CH}) heads={HEADS}"}

    def full(p, x, cc, c):
        return A.spatial_transformer(
            p, pref, x + c, cc, HEADS, DH, image_cross_attention=True
        )

    timed("full", scan_wrap(full), (p, x, ctx), out)

    # knockouts: monkeypatch one sub-op to identity, re-trace
    import contextlib

    @contextlib.contextmanager
    def patched(obj, name, repl):
        old = getattr(obj, name)
        setattr(obj, name, repl)
        try:
            yield
        finally:
            setattr(obj, name, old)

    def timed_patched(label, obj, name, repl):
        with patched(obj, name, repl):
            timed(label, scan_wrap(full), (p, x, ctx), out)
        if out.get(label) is not None and out.get("full") is not None:
            out[f"{label}_delta"] = round(out["full"] - out[label], 3)

    # no attention ops at all (projections stay): attention -> v passthrough.
    # attention.py binds these names at import (from nnops import ...), so
    # patch the A-module bindings, not nnops.
    timed_patched("no_attn_op", A, "attention",
                  lambda q, k, v, scale, bias=None, mask=None:
                  q + v.mean(axis=2, keepdims=True)
                  + k.mean(axis=2, keepdims=True))  # q-shaped, keeps k/v live
    # flash -> plain einsum for the long self-attn (cross stays einsum);
    # _FUSED_ATTENTION is read through the nnops global, patchable there
    timed_patched("attn_einsum", nnops, "_FUSED_ATTENTION", [False])
    # cross_attention (both attn1+attn2 incl. projections) -> identity
    timed_patched(
        "no_cross_attention", A, "cross_attention",
        lambda p_, pr_, x_, *a, **k: x_,
    )
    # feed_forward -> identity
    timed_patched("no_ff", A, "feed_forward", lambda p_, pr_, x_: x_)
    # layer_norm -> identity (3 of them)
    timed_patched("no_ln", A, "layer_norm", lambda p_, n_, x_, eps=1e-5: x_)
    # group_norm -> identity
    timed_patched("no_gn", A, "group_norm",
                  lambda p_, n_, x_, num_groups=32, eps=1e-5: x_)
    # proj_in/out -> identity (leave other linears): patch A.linear selectively
    real_linear = A.linear
    timed_patched(
        "no_projio", A, "linear",
        lambda p_, n_, x_: x_ if n_.endswith(("proj_in", "proj_out")) else real_linear(p_, n_, x_),
    )

    # --- layout microbenches ---
    w320 = mk(CH, CH)
    b320 = mk(CH)
    xs = mk(T, N, CH)     # (25, 2240, 320)
    xt = mk(N, T, CH)     # (2240, 25, 320)
    x2 = mk(T * N, CH)    # (56000, 320)

    for nm, a in (("mm_xs", xs), ("mm_xt", xt), ("mm_2d", x2)):
        timed(nm, scan_wrap(lambda w, b, a_, c, _a=None: ((a_ + c) @ w.T + b)),
              (w320, b320, a), out)
    lnw, lnb = mk(CH), mk(CH)

    def ln(w, b, a_, c):
        h = a_ + c
        m = h.mean(axis=-1, keepdims=True)
        v = h.var(axis=-1, keepdims=True)
        return (h - m) * jax.lax.rsqrt(v + 1e-5) * w + b

    for nm, a in (("ln_xs", xs), ("ln_xt", xt), ("ln_2d", x2)):
        timed(nm, scan_wrap(ln), (lnw, lnb, a), out)

    write_artifact(OUT_PATH, out)
    print("wrote", OUT_PATH, flush=True)


if __name__ == "__main__":
    main()
