#!/usr/bin/env python
"""Microbench the temporal attention at the UNet's production shape:
(B=2240, H=5, T=25, D=64) — t=25 tokens per (h,w) site, 11200 tiny
(25,64)@(64,25) batched matmuls on the einsum path (MXU-hostile).

Candidates: the production einsum, a broadcast-multiply-reduce (VPU)
formulation, and a merged-batch variant. Also times the full
temporal_transformer with each wired in. Writes TEMPORAL_ATTN_SWEEP.json.
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

B, H, T, D = 2240, 5, 25, 64
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


def einsum_attn(q, k, v, scale):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def bcast_attn(q, k, v, scale):
    # scores via broadcast-multiply-reduce: VPU elementwise + reduction,
    # no tiny-matmul MXU dispatch. f32 accumulate matches einsum numerics.
    qf = q.astype(jnp.float32)[:, :, :, None, :]  # (B,H,T,1,D)
    kf = k.astype(jnp.float32)[:, :, None, :, :]  # (B,H,1,T,D)
    sim = (qf * kf).sum(-1) * scale  # (B,H,T,T)
    attn = jax.nn.softmax(sim, axis=-1)
    pv = attn[..., None] * v.astype(jnp.float32)[:, :, None, :, :]
    return pv.sum(3).astype(v.dtype)


def bcast_qk_mm_pv(q, k, v, scale):
    # scores on VPU, PV back on the (batched) matmul path
    qf = q.astype(jnp.float32)[:, :, :, None, :]
    kf = k.astype(jnp.float32)[:, :, None, :, :]
    sim = (qf * kf).sum(-1) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def merged_batch(q, k, v, scale):
    # (B*H, T, D) single batch axis
    qm = q.reshape(B * H, T, D)
    km = k.reshape(B * H, T, D)
    vm = v.reshape(B * H, T, D)
    sim = jnp.einsum("bid,bjd->bij", qm, km, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bij,bjd->bid", attn.astype(vm.dtype), vm).reshape(B, H, T, D)


def main():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, D), np.float32) * 0.1, jnp.bfloat16)
        for _ in range(3)
    )
    scale = D ** -0.5
    out = {}

    from guidedvd3dgs_tpu.diffusion import nnops

    def grouped(g):
        def f(q, k, v, scale):
            old = nnops._SMALL_ATTN_GROUP[0]
            nnops.set_small_attn_group(g)  # trace-time only: g is static
            try:
                return nnops._grouped_small_attention(q, k, v, scale)
            finally:
                nnops.set_small_attn_group(old)

        return f

    cands = [
        ("einsum", einsum_attn),
        ("bcast_vpu", bcast_attn),
        ("bcast_qk_mm_pv", bcast_qk_mm_pv),
        ("merged_batch", merged_batch),
    ] + [(f"grouped_g{g}", grouped(g)) for g in (4, 5, 8, 10)]
    for name, fn in cands:
        timed(name, scan_wrap(lambda q, k, v, c, f=fn: f(q + c, k, v, scale)), (q, k, v), out)

    # parity check of the winner formulation vs einsum (on-chip numerics)
    r_e = jax.jit(lambda q, k, v: einsum_attn(q, k, v, scale))(q, k, v)
    r_b = jax.jit(lambda q, k, v: bcast_attn(q, k, v, scale))(q, k, v)
    err = float(jnp.abs(r_e.astype(jnp.float32) - r_b.astype(jnp.float32)).max())
    out["bcast_vs_einsum_maxabs"] = err
    print("bcast vs einsum max abs err:", err, flush=True)

    def vjp_of(f):
        def g(q, k, v, c):
            y, bwd = jax.vjp(lambda a, b, cc: f(a, b, cc, scale), q + c, k, v)
            dq, dk, dv = bwd(jnp.ones_like(y))
            return dq

        return g

    timed("einsum_vjp", scan_wrap(vjp_of(einsum_attn)), (q, k, v), out)
    timed("bcast_vpu_vjp", scan_wrap(vjp_of(bcast_attn)), (q, k, v), out)
    for g in (4, 5, 8):
        timed(f"grouped_g{g}_vjp", scan_wrap(vjp_of(grouped(g))), (q, k, v), out)
    # parity of the grouped form vs einsum at g=5 (production default)
    r_g = jax.jit(lambda q, k, v: grouped(5)(q, k, v, scale))(q, k, v)
    out["grouped5_vs_einsum_maxabs"] = float(
        jnp.abs(r_e.astype(jnp.float32) - r_g.astype(jnp.float32)).max()
    )
    print("grouped5 vs einsum max abs err:", out["grouped5_vs_einsum_maxabs"], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TEMPORAL_ATTN_SWEEP.json",
    )
    write_artifact(path, out)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
