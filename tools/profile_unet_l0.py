#!/usr/bin/env python
"""Component attribution for the dominant level-0 UNet blocks.

UNET_BLOCK_PROFILE.json shows the three (40,56,*) block signatures cost
226 ms of the 377 ms sum-of-blocks (the composed fwd is 466 ms). This tool
times the pieces of one level-0 `res+spatial+temporal` block in isolation —
res conv path, temporal_conv_block (4x conv3d(3,1,1)), spatial transformer,
temporal transformer, plus microbenches (one conv3d vs a shifted-matmul
reformulation, one f32 GroupNorm) — to find where the ~40 ms goes.

Weights are synthetic (numpy, bf16) with the production torch names; only
the timed block's parameters are materialized, so the script iterates fast
on the tunneled chip. Writes UNET_L0_PROFILE.json.
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

T, HL, WL = 25, 40, 56
ITERS = 8
DISPATCH_MS = 24.0


def make_params(ch: int, emb_dim: int, heads: int, dim_head: int, ctx_dim: int):
    rng = np.random.default_rng(0)
    p = {}

    def add(name, *shape):
        p[name] = jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * 0.02, jnp.bfloat16
        )

    def gn(name):
        add(f"{name}.weight", ch)
        add(f"{name}.bias", ch)

    def ln(name, d):
        add(f"{name}.weight", d)
        add(f"{name}.bias", d)

    def lin(name, o, i):
        add(f"{name}.weight", o, i)
        add(f"{name}.bias", o)

    # res block
    gn("res.in_layers.0")
    add("res.in_layers.2.weight", ch, ch, 3, 3)
    add("res.in_layers.2.bias", ch)
    lin("res.emb_layers.1", ch, emb_dim)
    gn("res.out_layers.0")
    add("res.out_layers.3.weight", ch, ch, 3, 3)
    add("res.out_layers.3.bias", ch)
    for i in (1, 2, 3, 4):
        gn(f"res.temopral_conv.conv{i}.0")
        k = 2 if i == 1 else 3
        add(f"res.temopral_conv.conv{i}.{k}.weight", ch, ch, 3, 1, 1)
        add(f"res.temopral_conv.conv{i}.{k}.bias", ch)

    inner = heads * dim_head
    for pref, cd in (("spat", ch), ("temp", ch)):
        gn(f"{pref}.norm")
        lin(f"{pref}.proj_in", inner, ch)
        lin(f"{pref}.proj_out", ch, inner)
        b = f"{pref}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            ln(f"{b}.{n}", inner)
        for a in ("attn1", "attn2"):
            add(f"{b}.{a}.to_q.weight", inner, inner)
            kv_in = inner if (pref == "temp" or a == "attn1") else ctx_dim
            add(f"{b}.{a}.to_k.weight", inner, kv_in)
            add(f"{b}.{a}.to_v.weight", inner, kv_in)
            lin(f"{b}.{a}.to_out.0", inner, inner)
        # image cross-attn extras on spatial attn2
        if pref == "spat":
            add(f"{b}.attn2.to_k_ip.weight", inner, ctx_dim)
            add(f"{b}.attn2.to_v_ip.weight", inner, ctx_dim)
        lin(f"{b}.ff.net.0.proj", inner * 8, inner)
        lin(f"{b}.ff.net.2", inner, inner * 4)
    return p


def timed(name, fn, args, out):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
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
    print(f"{name:28s} {ms:8.2f} ms   (compile {comp:.1f}s)", flush=True)


def scan_wrap(body):
    """body(carry_scalar) -> array; scanned ITERS times to amortize dispatch."""

    def f(*args):
        def step(c, _):
            y = body(*args, c)
            return (y.ravel()[0] * 0).astype(jnp.bfloat16), y.ravel()[0]

        return jax.lax.scan(step, jnp.bfloat16(0.0), None, length=ITERS)[1]

    return f


def main():
    from guidedvd3dgs_tpu.diffusion.attention import (
        spatial_transformer,
        temporal_transformer,
    )
    from guidedvd3dgs_tpu.diffusion.nnops import conv3d, group_norm
    from guidedvd3dgs_tpu.diffusion.unet3d import res_block, temporal_conv_block

    results = {}
    for ch in (320, 640):
        heads, dim_head = ch // 64, 64
        emb_dim = 4 * 320
        ctx_dim = 1024
        p = make_params(ch, emb_dim, heads, dim_head, ctx_dim)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((T, HL, WL, ch), np.float32) * 0.1,
            jnp.bfloat16,
        )
        emb = jnp.zeros((T, emb_dim), jnp.bfloat16)
        ctx = jnp.zeros((T, 77 + 16, ctx_dim), jnp.bfloat16)
        out = {}
        print(f"--- ch={ch} ({T},{HL},{WL}) ---", flush=True)

        timed(
            "res_block_full",
            scan_wrap(lambda p, x, e, c: res_block(p, "res", x + c, e, ch, ch, True, 1)),
            (p, x, emb),
            out,
        )
        timed(
            "res_block_noTconv",
            scan_wrap(lambda p, x, e, c: res_block(p, "res", x + c, e, ch, ch, False, 1)),
            (p, x, emb),
            out,
        )
        xv = x.reshape(1, T, HL, WL, ch)
        timed(
            "temporal_conv_block",
            scan_wrap(lambda p, xv, c: temporal_conv_block(p, "res.temopral_conv", xv + c)),
            (p, xv),
            out,
        )
        timed(
            "spatial_transformer",
            scan_wrap(
                lambda p, x, cc, c: spatial_transformer(
                    p, "spat", x + c, cc, heads, dim_head, image_cross_attention=True
                )
            ),
            (p, x, ctx),
            out,
        )
        timed(
            "temporal_transformer",
            scan_wrap(
                lambda p, xv, c: temporal_transformer(
                    p, "temp", xv + c, None, heads, dim_head, use_linear=True
                )
            ),
            (p, xv),
            out,
        )

        # microbenches
        timed(
            "conv3d_311_one",
            scan_wrap(lambda p, xv, c: conv3d(p, "res.temopral_conv.conv2.3", xv + c)),
            (p, xv),
            out,
        )

        def tconv_matmul(p, xv, c):
            # (3,1,1) temporal conv as 3 shifted pointwise matmuls (MXU path)
            w = p["res.temopral_conv.conv2.3.weight"]  # (O, I, 3, 1, 1)
            b = p["res.temopral_conv.conv2.3.bias"]
            h = xv + c
            y = h @ w[:, :, 1, 0, 0].T
            y = y.at[:, 1:].add(h[:, :-1] @ w[:, :, 0, 0, 0].T)
            y = y.at[:, :-1].add(h[:, 1:] @ w[:, :, 2, 0, 0].T)
            return y + b

        timed("tconv_matmul_one", scan_wrap(tconv_matmul), (p, xv), out)

        def tconv_matmul_pad(p, xv, c):
            # same but via concat of shifted views (no scatter-add)
            w = p["res.temopral_conv.conv2.3.weight"]
            b = p["res.temopral_conv.conv2.3.bias"]
            h = xv + c
            z = jnp.zeros_like(h[:, :1])
            hm = jnp.concatenate([z, h[:, :-1]], axis=1)
            hp = jnp.concatenate([h[:, 1:], z], axis=1)
            y = (
                h @ w[:, :, 1, 0, 0].T
                + hm @ w[:, :, 0, 0, 0].T
                + hp @ w[:, :, 2, 0, 0].T
            )
            return y + b

        timed("tconv_matmul_pad_one", scan_wrap(tconv_matmul_pad), (p, xv), out)

        timed(
            "group_norm_one",
            scan_wrap(lambda p, x, c: group_norm(p, "res.in_layers.0", x + c)),
            (p, x),
            out,
        )
        results[f"ch{ch}"] = out

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "UNET_L0_PROFILE.json",
    )
    write_artifact(path, results)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
