#!/usr/bin/env python
"""Experiment E1 (PERF_NOTES / VERDICT r4 #3): can a payload-free
(key, iota) sort + ONE wide row gather undercut the payload-carrying
k-operand binning/reduce sorts — the exact pattern that took densify at 1M
from 38 s to 1.63 s (models/gaussians.py _sort_carried)?

Measured at the BENCH configuration (1M splats, 320x448, trainer-sized
instance buffer) with the REAL key distribution: every variant runs the
full preprocess+expand presort prefix inside the jit (identical across
variants, measured separately for subtraction), then its sort/permute
formulation. Variants:

  presort        preprocess + expand + pad-key synthesis only (the shared
                 prefix — subtract from everything below)
  pack9          the production 9-operand packed binning sort
                 (ops/tiling.py bin_gaussians _PACK_FIELDS path)
  e1_bin         (key, iota) 2-op sort -> (m_pad, 8) int32 payload matrix
                 -> one row gather -> transpose back to the (8, m_pad)
                 row layout the blend kernels stream
  e1_bin_notr    same, WITHOUT the transpose back (lower bound if the
                 kernels consumed column-major instances)
  reduce6        the production 6-operand gradient reduce sort
                 (raster_tiles._reduce_per_gaussian packed path) on
                 synthetic payload rows over the real inst_gauss
  e1_reduce      (gauss, iota) 2-op sort + (m_pad, 8) gather + transpose

Parity: e1_bin must reproduce pack9's inst_data BIT-EXACTLY (stable sort
tie order == iota order). Checked once outside the timing loop.

Writes E1_SORT_STUDY.json at the repo root.
Reference analog being replaced: the CUDA radix scatter,
cuda_rasterizer/rasterizer_impl.cu:290-309.
"""

from __future__ import annotations

import argparse
import json
import math
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

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "E1_SORT_STUDY.json"
)
ITERS = 8
REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    import bench  # repo-root bench: reuses inputs/camera/latency calibration
    from guidedvd3dgs_tpu.ops import raster_tiles, tiling
    from guidedvd3dgs_tpu.ops.raster_tiles import CHUNK, RasterCamera, rasterize_tiles
    from guidedvd3dgs_tpu.ops.tiling import _pack_f16, binning_presort, F_OP

    bench.N = args.n
    inputs = bench.make_inputs()
    cam = bench.make_camera()
    bench._calibrate_latency()
    lat = bench._LATENCY_MS[0]
    bg = jnp.zeros((3,), jnp.float32)

    demand = int(
        jax.jit(
            lambda *a: rasterize_tiles(*a, cam, bg, sh_degree=3).num_instances
        )(*inputs)
    )
    # round to QUANTUM (not CHUNK) — binning_presort's buffer granularity,
    # same rounding rasterize_tiles applies (raster_tiles.py:1095-1097)
    mi = -(-int(demand * 1.3) // tiling.QUANTUM) * tiling.QUANTUM
    print(f"demand {demand}, max_instances {mi}", flush=True)

    H, W = bench.H, bench.W

    def presort_of(m, s, r, o, sh):
        (m2d, depths, conics, colors, opacs), proc = raster_tiles._preproc_screen(
            m, s, r, o, sh, None, None, None, cam, 3, 1.0, None
        )
        proc_screen = proc._replace(means2d=m2d)
        return binning_presort(proc_screen, W, H, mi)

    def geom_rows(ps):
        cat = ps["cat"]
        return [cat(i) for i in range(F_OP)]  # mx, my, ca, cb, cc (f32)

    def packed_rows(ps):
        cat = ps["cat"]
        return _pack_f16(cat(F_OP), cat(F_OP + 1)), _pack_f16(cat(F_OP + 2), cat(F_OP + 3))

    # --- variant bodies (take the presort dict, return (inst_data, gauss, key))
    def body_pack9(ps):
        g5 = geom_rows(ps)
        p0, p1 = packed_rows(ps)
        ops = (ps["key_op"], ps["gs_op"]) + tuple(g5) + (p0, p1)
        so = jax.lax.sort(ops, num_keys=1, is_stable=True)
        geom = [jax.lax.bitcast_convert_type(so[2 + i], jnp.int32) for i in range(5)]
        inst = jnp.stack(geom + [so[7], so[8], so[0]], axis=0)
        return inst, so[1]

    def e1_payload(ps):
        g5 = geom_rows(ps)
        p0, p1 = packed_rows(ps)
        cols = [ps["gs_op"]] + [
            jax.lax.bitcast_convert_type(g, jnp.int32) for g in g5
        ] + [p0, p1]
        return jnp.stack(cols, axis=1)  # (m_pad, 8) int32

    def body_e1(ps, transpose_back=True):
        payload = e1_payload(ps)
        iota = jnp.arange(payload.shape[0], dtype=jnp.int32)
        sk, perm = jax.lax.sort((ps["key_op"], iota), num_keys=1, is_stable=True)
        gathered = jnp.take(payload, perm, axis=0)  # (m_pad, 8) row gather
        if not transpose_back:
            return gathered, sk
        gt = gathered.T  # (8, m_pad)
        inst = jnp.stack(
            [gt[1], gt[2], gt[3], gt[4], gt[5], gt[6], gt[7], sk], axis=0
        )
        return inst, gt[0]

    def body_reduce6(ps):
        # real inst_gauss order requires the binning sort; approximate the
        # reduce-sort COST with the unsorted gs_op as key (same distribution
        # of segment sizes) + 5 synthetic bf16-pair payload rows
        key = ps["gs_op"]
        pay = [
            jax.lax.bitcast_convert_type(ps["cat"](i % F_OP) * (1.0 + i), jnp.int32)
            for i in range(5)
        ]
        so = jax.lax.sort((key,) + tuple(pay), num_keys=1, is_stable=True)
        return jnp.stack(so[1:], axis=0), so[0]

    def body_e1_reduce(ps):
        key = ps["gs_op"]
        pay = jnp.stack(
            [
                jax.lax.bitcast_convert_type(ps["cat"](i % F_OP) * (1.0 + i), jnp.int32)
                for i in range(5)
            ]
            + [jnp.zeros((ps["m_pad"],), jnp.int32)] * 3,  # pad cols to 8
            axis=1,
        )
        iota = jnp.arange(ps["m_pad"], dtype=jnp.int32)
        sk, perm = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
        gathered = jnp.take(pay, perm, axis=0)
        return gathered.T[:5], sk

    variants = {
        "presort": lambda ps: (ps["key_op"], ps["gs_op"]),
        "pack9": body_pack9,
        "e1_bin": lambda ps: body_e1(ps, True),
        "e1_bin_notr": lambda ps: body_e1(ps, False),
        "reduce6": body_reduce6,
        "e1_reduce": body_e1_reduce,
    }

    out = {"n": args.n, "demand": demand, "max_instances": mi,
           "dispatch_latency_ms": round(lat, 3), "variants": {}}

    # parity check once: e1_bin == pack9 bit-exact
    @jax.jit
    def parity(m, s, r, o, sh):
        ps = presort_of(m, s, r, o, sh)
        a_inst, a_g = body_pack9(ps)
        b_inst, b_g = body_e1(ps, True)
        ne_inst = jnp.sum((a_inst != b_inst).astype(jnp.int32))
        ne_g = jnp.sum((a_g != b_g).astype(jnp.int32))
        return ne_inst, ne_g

    d_inst, d_g = (int(np.asarray(x)) for x in parity(*inputs))
    out["parity"] = {"inst_mismatch_elems": d_inst, "gauss_mismatch_elems": d_g,
                     "pass": d_inst == 0 and d_g == 0}
    print("parity:", out["parity"], flush=True)

    for name, body in variants.items():
        def rep(m, s, r, o, sh, body=body):
            def it(carry, _):
                ps = presort_of(m + carry * 0.0, s, r, o, sh)
                res = body(ps)
                csum = sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in res)
                return csum * 0.0, csum

            return jax.lax.scan(it, jnp.float32(0.0), None, length=ITERS)[1]

        t0 = time.time()
        f = jax.jit(rep)
        r = f(*inputs)
        np.asarray(r)
        compile_s = time.time() - t0
        series = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(*inputs))
            series.append(max((time.perf_counter() - t0) * 1000.0 - lat, 0.0) / ITERS)
        med = float(np.median(series))
        out["variants"][name] = {
            "ms": round(med, 3),
            "min_ms": round(min(series), 3),
            "max_ms": round(max(series), 3),
            "compile_s": round(compile_s, 1),
        }
        print(f"{name:12s} {out['variants'][name]}", flush=True)
        write_artifact(OUT_PATH, out)

    base = out["variants"]["presort"]["ms"]
    for name, row in out["variants"].items():
        if name != "presort":
            row["net_ms"] = round(row["ms"] - base, 3)
    write_artifact(OUT_PATH, out)
    print("written", OUT_PATH)


if __name__ == "__main__":
    main()
