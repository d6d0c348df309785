#!/usr/bin/env python
"""Is the preprocess cost the (N,16,3)->(48,N) SH transpose?

Times: full preprocess (current layout), preprocess fed pre-transposed
(48, N) SH rows (no moveaxis), the moveaxis alone, and a no-SH preprocess
(colors_precomp). Decides whether the Gaussian state should hold features
in (48, N) layout natively.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import make_camera, make_inputs, N
from guidedvd3dgs_tpu.ops import projection as P

ITERS = 8


def timeit(name, fn, *args):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(carry * 0.0, *a)
            leaves = [
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out)
                if hasattr(x, "astype")
            ]
            s = jnp.stack(leaves).sum()
            return s * 1e-30, s

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs

    out = rep(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(rep(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1000.0
    print(f"{name:44s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()
    sh_rows = jnp.moveaxis(shs.reshape(N, 48), -1, 0)  # (48, N)

    timeit("preprocess CURRENT (N,16,3)",
           lambda e, m, s, r, o, sh: P.preprocess_gaussians(
               m + e, s, r, o, sh, cam, sh_degree=3),
           means, scales, rots, opac, shs)

    # monkeypatch-free variant: inline the SH eval with pre-transposed rows
    def pre_rows(e, m, s, r, o, rows):
        proc = P.preprocess_gaussians(
            m + e, s, r, o, None, cam, sh_degree=3,
            colors_precomp=jnp.zeros((N, 3), jnp.float32))
        dxl = m[:, 0] + e - cam.campos[0]
        dyl = m[:, 1] - cam.campos[1]
        dzl = m[:, 2] - cam.campos[2]
        inv_n = 1.0 / jnp.sqrt(jnp.maximum(dxl * dxl + dyl * dyl + dzl * dzl, 1e-20))
        sh48 = [(rows[3 * k], rows[3 * k + 1], rows[3 * k + 2]) for k in range(16)]
        r3, g3, b3 = P._eval_sh_channels(
            3, sh48, dxl * inv_n, dyl * inv_n, dzl * inv_n)
        color = jnp.stack([jnp.maximum(r3 + 0.5, 0.0),
                           jnp.maximum(g3 + 0.5, 0.0),
                           jnp.maximum(b3 + 0.5, 0.0)], axis=-1)
        return proc._replace(colors=color)

    timeit("preprocess PRE-TRANSPOSED (48,N)", pre_rows,
           means, scales, rots, opac, sh_rows)

    timeit("moveaxis alone", lambda e, sh: jnp.moveaxis(
        sh.reshape(N, 48) + e, -1, 0), shs)

    colors = jnp.zeros((N, 3), jnp.float32)
    timeit("preprocess colors_precomp (no SH)",
           lambda e, m, s, r, o, c: P.preprocess_gaussians(
               m + e, s, r, o, None, cam, sh_degree=3, colors_precomp=c),
           means, scales, rots, opac, colors)

    # vjp versions
    def vjp_current(e, m, s, r, o, sh):
        def f(m2, sh2):
            p = P.preprocess_gaussians(m2, s, r, o, sh2, cam, sh_degree=3)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)
        out, vjp = jax.vjp(f, m + e, sh)
        return vjp(tuple(jnp.ones_like(x) for x in out))

    timeit("fwd+vjp CURRENT", vjp_current, means, scales, rots, opac, shs)

    def vjp_rows(e, m, s, r, o, rows):
        def f(m2, rows2):
            p = pre_rows(jnp.float32(0.0), m2, s, r, o, rows2)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)
        out, vjp = jax.vjp(f, m + e, rows)
        return vjp(tuple(jnp.ones_like(x) for x in out))

    timeit("fwd+vjp PRE-TRANSPOSED", vjp_rows, means, scales, rots, opac, sh_rows)


if __name__ == "__main__":
    main()
