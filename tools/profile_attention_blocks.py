#!/usr/bin/env python
"""Microbench the level-0 spatial attention (25 frames, 5 heads, seq 2240,
d 64) — the single largest term of the UNet forward per UNET_L0_PROFILE.json
(spatial transformer 26 ms of the 44 ms block; x6 blocks).

Compares: einsum attention, the Pallas flash kernel at default 128-block
sizes (current production path), and tuned BlockSizes over the padded
2304-token sequence. Also times the fwd+bwd (vjp) of the best candidates —
the guided DDIM step differentiates through attention. Writes
ATTN_BLOCK_SWEEP.json.
"""

from __future__ import annotations

import functools
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
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention,
)

B, H, N, D = 25, 5, 2240, 64
if len(sys.argv) == 5:  # optional: B H N D (e.g. 25 10 560 64 = UNet level 1)
    B, H, N, D = (int(a) for a in sys.argv[1:5])
NPAD = -(-N // 128) * 128
ITERS = 8
DISPATCH_MS = 24.0


def timed(name, fn, args, out):
    t0 = time.time()
    try:
        compiled = jax.jit(fn).lower(*args).compile()
    except Exception as e:
        print(f"{name:34s} COMPILE FAIL {repr(e)[:160]}", flush=True)
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
    print(f"{name:34s} {ms:8.2f} ms  (compile {comp:.1f}s)", flush=True)


def scan_wrap(body):
    def f(*args):
        def step(c, _):
            y = body(*args, c)
            return (y.ravel()[0] * 0).astype(jnp.bfloat16), y.ravel()[0]

        return jax.lax.scan(step, jnp.bfloat16(0.0), None, length=ITERS)[1]

    return f


def flash_padded(q, k, v, scale, bs=None):
    b, h, n, d = q.shape
    pad = [(0, 0), (0, 0), (0, NPAD - n), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    seg = jnp.concatenate(
        [jnp.ones((b, n), jnp.int32), jnp.full((b, NPAD - n), 2, jnp.int32)], axis=1
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=scale,
        block_sizes=bs,
    )
    return out[:, :, :n, :]


def flash_nopad_noseg(q, k, v, scale, bs=None):
    # exact-2304 shape without segment ids: measures the segment-id cost
    return flash_attention(q, k, v, sm_scale=scale, block_sizes=bs)


def einsum_attn(q, k, v, scale):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def bs_of(bq, bk, bkm=None):
    bkm = bkm or bk
    return BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
    )


def main():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, N, D), np.float32) * 0.1, jnp.bfloat16)
        for _ in range(3)
    )
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, NPAD - N), (0, 0)])
    kp, vp = (jnp.pad(x, [(0, 0), (0, 0), (0, NPAD - N), (0, 0)]) for x in (k, v))
    scale = D ** -0.5
    out = {}

    timed("einsum", scan_wrap(lambda q, k, v, c: einsum_attn(q + c, k, v, scale)), (q, k, v), out)
    timed(
        "flash_default128_seg",
        scan_wrap(lambda q, k, v, c: flash_padded(q + c, k, v, scale)),
        (q, k, v),
        out,
    )
    from guidedvd3dgs_tpu.diffusion.nnops import _flash_block_sizes

    auto = _flash_block_sizes(NPAD)
    timed(
        f"flash_auto_q{auto.block_q}_seg",
        scan_wrap(lambda q, k, v, c: flash_padded(q + c, k, v, scale, auto)),
        (q, k, v),
        out,
    )
    timed(
        "flash_auto_seg_vjp",
        scan_wrap(
            (lambda f: lambda q, k, v, c: f(q, k, v, c))(
                lambda q, k, v, c: jax.vjp(
                    lambda a: flash_padded(a, k, v, scale, auto), q + c
                )[1](jnp.ones((B, H, N, D), q.dtype))[0]
            )
        ),
        (q, k, v),
        out,
    )
    for bq, bkm, bk in ((1152, 1152, 1152), (768, 2304, 768), (1152, 2304, 1152),
                        (768, 2304, 2304)):
        timed(
            f"flash_q{bq}_km{bkm}_k{bk}_seg",
            scan_wrap(lambda q, k, v, c, bs=BlockSizes(
                block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
                block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk,
                block_q_dq=bq,
            ): flash_padded(q + c, k, v, scale, bs)),
            (q, k, v),
            out,
        )
    for bq, bk in ((256, 256), (384, 384), (768, 768), (768, 384), (2304, 2304)):
        timed(
            f"flash_q{bq}_k{bk}_seg",
            scan_wrap(lambda q, k, v, c, bs=bs_of(bq, bk): flash_padded(q + c, k, v, scale, bs)),
            (q, k, v),
            out,
        )
    timed(
        "flash_q768_k768_noseg2304",
        scan_wrap(lambda q, k, v, c: flash_nopad_noseg(q + c, k, v, scale, bs_of(768, 768))),
        (qp, kp, vp),
        out,
    )

    # fwd+bwd of the contenders
    def vjp_of(f):
        def g(q, k, v, c):
            y, bwd = jax.vjp(lambda a, b, cc: f(a, b, cc, scale), q + c, k, v)
            dq, dk, dv = bwd(jnp.ones_like(y))
            return dq

        return g

    timed("einsum_vjp", scan_wrap(vjp_of(lambda a, b, cc, s: einsum_attn(a, b, cc, s))), (q, k, v), out)
    timed(
        "flash_default128_seg_vjp",
        scan_wrap(vjp_of(lambda a, b, cc, s: flash_padded(a, b, cc, s))),
        (q, k, v),
        out,
    )
    best_bs = bs_of(768, 768)
    timed(
        "flash_q768_seg_vjp",
        scan_wrap(vjp_of(lambda a, b, cc, s: flash_padded(a, b, cc, s, best_bs))),
        (q, k, v),
        out,
    )
    bs384 = bs_of(384, 384)
    timed(
        "flash_q384_seg_vjp",
        scan_wrap(vjp_of(lambda a, b, cc, s: flash_padded(a, b, cc, s, bs384))),
        (q, k, v),
        out,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ATTN_BLOCK_SWEEP.json",
    )
    write_artifact(path, out)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
