#!/usr/bin/env python
"""Isolate preprocess fwd/vjp costs at bench scale: full SH path vs
precomputed-colors path vs pieces (SH eval alone, cov2d chain alone)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import make_camera, make_inputs
from tools.profile_prims import calibrate, timeit
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians


def main():
    calibrate()
    cam = make_camera()
    means, scales, rots, opac, shs = make_inputs()
    n = means.shape[0]
    cot = (
        jnp.ones((n, 2)), jnp.ones((n,)), jnp.ones((n, 3)),
        jnp.ones((n, 3)), jnp.ones((n,)),
    )

    def run_vjp(f, *args):
        _, vjp = jax.vjp(f, *args)
        return vjp(cot)

    def full(eps, m, s, r, o, sh):
        def f(m, s, r, o, sh):
            p = preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=3)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)

        return run_vjp(f, m + eps, s, r, o, sh)

    timeit("vjp FULL (incl re-fwd)", full, means, scales, rots, opac, shs)

    colors_pre = jnp.ones((n, 3)) * 0.5

    def nosh(eps, m, s, r, o, cp):
        def f(m, s, r, o, cp):
            p = preprocess_gaussians(m, s, r, o, None, cam, sh_degree=3,
                                     colors_precomp=cp)
            return (p.means2d, p.depths, p.conics, p.colors, p.opacities)

        return run_vjp(f, m + eps, s, r, o, cp)

    timeit("vjp NO-SH (colors_precomp)", nosh, means, scales, rots, opac, colors_pre)

    def fwd_only(eps, m, s, r, o, sh):
        p = preprocess_gaussians(m + eps, s, r, o, sh, cam, sh_degree=3)
        return (p.means2d, p.depths, p.conics, p.colors, p.opacities)

    timeit("fwd FULL", fwd_only, means, scales, rots, opac, shs)

    def fwd_nosh(eps, m, s, r, o, cp):
        p = preprocess_gaussians(m + eps, s, r, o, None, cam, sh_degree=3,
                                 colors_precomp=cp)
        return (p.means2d, p.depths, p.conics, p.colors, p.opacities)

    timeit("fwd NO-SH", fwd_nosh, means, scales, rots, opac, colors_pre)


if __name__ == "__main__":
    main()
