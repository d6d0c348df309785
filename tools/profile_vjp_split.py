#!/usr/bin/env python
"""Split timing: rasterize_tiles forward (via jax.vjp) vs the vjp application,
plus the full _raster_bwd called directly on real residuals."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import make_camera, make_inputs, H, W, N
from guidedvd3dgs_tpu.ops import raster_tiles as rt

ITERS = 8


def timeit(name, fn, *args):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(*a)
            leaves = [
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree.leaves(out)
                if hasattr(x, "astype")
            ]
            return carry + leaves[0] * 0.0, jnp.stack(leaves).sum()

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return outs

    out = rep(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = rep(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:36s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera()
    bg = jnp.zeros((3,), jnp.float32)
    means, scales, rots, opac, shs = make_inputs()

    def f(m, s, r, o, sh):
        out = rt.rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3)
        return (out.color, out.depth, out.alpha)

    # forward via vjp (residual-saving forward)
    def fwd_with_res(m, s, r, o, sh):
        out, _ = jax.vjp(f, m, s, r, o, sh)
        return out

    timeit("fwd (vjp residual path)", fwd_with_res, means, scales, rots, opac, shs)

    cots = (
        jnp.ones((3, H, W), jnp.float32),
        jnp.full((H, W), 0.1, jnp.float32),
        jnp.full((H, W), 0.1, jnp.float32),
    )

    def fwd_bwd(m, s, r, o, sh):
        out, vjp_fn = jax.vjp(f, m, s, r, o, sh)
        return vjp_fn(cots)

    timeit("fwd+bwd (vjp)", fwd_bwd, means, scales, rots, opac, shs)

    # _raster_bwd directly on prebuilt residuals
    static_cfg = (3, 1.0, rt.CHUNK * (-(-4 * N // rt.CHUNK)), True, False, False, False)
    _, res = rt._raster_fwd_impl(
        static_cfg, H, W,
        means, scales, rots, opac, shs, None, None, None,
        cam.viewmatrix, cam.projmatrix, cam.campos, cam.tanfovx, cam.tanfovy,
        bg, None,
    )
    res = jax.tree.map(lambda x: x, res)  # concretize
    cots4 = (cots[0], cots[1], cots[2], jnp.zeros((N,), jnp.int32),
             (jnp.int32(0), jnp.int32(0)))

    def bwd_only(res_arrays):
        return rt._raster_bwd(static_cfg, H, W, res_arrays, cots4)

    timeit("_raster_bwd on residuals", bwd_only, res)


if __name__ == "__main__":
    main()
