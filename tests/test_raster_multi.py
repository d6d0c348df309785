"""Multi-camera batched rasterizer vs per-camera single renders.

The batched path (ops/raster_tiles.rasterize_tiles_multi) stacks B cameras
as vertical bands of one virtual framebuffer and runs ONE expand/sort/blend
/reduce chain; outputs and parameter gradients must match B independent
single-camera renders (whose grads are summed — the reference accumulates
train + pseudo backward passes into the same .grad buffers,
reference: train_guidedvd.py:383).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.ops import raster_tiles, tiling
from guidedvd3dgs_tpu.ops.raster_tiles import rasterize_tiles, rasterize_tiles_multi
from guidedvd3dgs_tpu.parallel.data_parallel import stack_cameras

from helpers import activated, make_camera, random_gaussians

raster_tiles.set_interpret(True)


@pytest.fixture(autouse=True)
def _interpret_exact():
    prev = raster_tiles._INTERPRET[0]
    raster_tiles.set_interpret(True)
    tiling.set_pack_fields(False)
    raster_tiles.set_pack_grads(False)
    yield
    raster_tiles.set_interpret(prev)
    tiling.set_pack_fields(True)
    raster_tiles.set_pack_grads(True)


def setup(n=300, height=48, width=64):
    cams = [
        make_camera(height=height, width=width).raster_camera(),
        make_camera(height=height, width=width, cam_z=-3.2, look_noise=0.35,
                    seed=3).raster_camera(),
    ]
    parts = activated(*random_gaussians(n=n, seed=0))
    return cams, tuple(jnp.asarray(p) for p in parts)


def test_multi_matches_singles_forward():
    cams, parts = setup()
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    outs = [rasterize_tiles(*parts, c, bg, max_instances=1 << 14) for c in cams]
    mo = rasterize_tiles_multi(
        *parts, stack_cameras(cams), bg, max_instances=1 << 15
    )
    for c, o in enumerate(outs):
        np.testing.assert_allclose(
            np.asarray(mo.color[c]), np.asarray(o.color), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mo.depth[c]), np.asarray(o.depth), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(mo.alpha[c]), np.asarray(o.alpha), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(mo.radii[c]), np.asarray(o.radii))
    assert int(mo.overflow) == 0
    assert int(mo.num_instances) == sum(int(o.num_instances) for o in outs)


def test_multi_grads_match_summed_singles():
    cams, parts = setup(n=200)
    bg = jnp.zeros(3, jnp.float32)
    cams_s = stack_cameras(cams)
    n = parts[0].shape[0]
    tgt0 = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, 48, 64)), jnp.float32)
    tgt1 = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (3, 48, 64)), jnp.float32)

    def loss_single(m, s, r, o, sh, off):
        a = rasterize_tiles(m, s, r, o, sh, cams[0], bg,
                            means2d_offset=off[0], max_instances=1 << 14)
        b = rasterize_tiles(m, s, r, o, sh, cams[1], bg,
                            means2d_offset=off[1], max_instances=1 << 14)
        return (
            jnp.abs(a.color - tgt0).mean()
            + jnp.abs(b.color - tgt1).mean()
            + 0.05 * (a.depth.mean() + b.depth.mean())
            + 0.02 * (a.alpha.mean() + b.alpha.mean())
        )

    def loss_multi(m, s, r, o, sh, off):
        mo = rasterize_tiles_multi(m, s, r, o, sh, cams_s, bg,
                                   means2d_offset=off, max_instances=1 << 15)
        return (
            jnp.abs(mo.color[0] - tgt0).mean()
            + jnp.abs(mo.color[1] - tgt1).mean()
            + 0.05 * mo.depth.mean(axis=(1, 2)).sum()
            + 0.02 * mo.alpha.mean(axis=(1, 2)).sum()
        )

    off = jnp.zeros((2, n, 2), jnp.float32)
    args = parts + (off,)
    ls, gs = jax.value_and_grad(loss_single, argnums=tuple(range(6)))(*args)
    lm, gm = jax.value_and_grad(loss_multi, argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(float(lm), float(ls), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / denom, b / denom, atol=5e-5)


def test_multi_xla_fallback_path():
    """Same parity with the fused Pallas preprocess disabled (the XLA
    preprocess + jax.vjp residual path)."""
    cams, parts = setup(n=150)
    bg = jnp.zeros(3, jnp.float32)
    cams_s = stack_cameras(cams)
    prev = raster_tiles._FUSED_PREPROC[0]
    raster_tiles.set_fused_preproc(False)
    try:
        outs = [rasterize_tiles(*parts, c, bg, max_instances=1 << 14) for c in cams]
        mo = rasterize_tiles_multi(*parts, cams_s, bg, max_instances=1 << 15)
        for c, o in enumerate(outs):
            np.testing.assert_allclose(
                np.asarray(mo.color[c]), np.asarray(o.color), atol=1e-5
            )

        def loss_multi(m):
            r = rasterize_tiles_multi(m, *parts[1:], cams_s, bg,
                                      max_instances=1 << 15)
            return r.color.sum() + 0.1 * r.depth.sum()

        def loss_single(m):
            t = 0.0
            for c in cams:
                r = rasterize_tiles(m, *parts[1:], c, bg, max_instances=1 << 14)
                t = t + r.color.sum() + 0.1 * r.depth.sum()
            return t

        gm = jax.grad(loss_multi)(parts[0])
        gs = jax.grad(loss_single)(parts[0])
        denom = np.abs(np.asarray(gs)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(gm) / denom, np.asarray(gs) / denom, atol=5e-5
        )
    finally:
        raster_tiles.set_fused_preproc(prev)


def test_multi_packed_production_mode():
    """Packed sort payloads + packed grads (the production configuration)
    stay within the same tolerance budget as the single-camera packed test."""
    cams, parts = setup(n=250)
    bg = jnp.zeros(3, jnp.float32)
    cams_s = stack_cameras(cams)
    tiling.set_pack_fields(True)
    raster_tiles.set_pack_grads(True)
    try:
        def loss(m, o):
            r = rasterize_tiles_multi(m, parts[1], parts[2], o, parts[4],
                                      cams_s, bg, max_instances=1 << 15)
            return (r.color.sum() + 0.1 * r.depth.sum(), r.color)

        (lp, cp), gp = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            parts[0], parts[3]
        )
        tiling.set_pack_fields(False)
        raster_tiles.set_pack_grads(False)
        (le, ce), ge = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            parts[0], parts[3]
        )
        np.testing.assert_allclose(np.asarray(cp), np.asarray(ce), atol=4e-3)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(ge)):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(b).max() + 1e-6
            np.testing.assert_allclose(a / denom, b / denom, atol=2e-2)
    finally:
        tiling.set_pack_fields(True)
        raster_tiles.set_pack_grads(True)


def test_multi_render_gaussians_api():
    """models/render.render_gaussians_multi: confidence grad scaling and
    active-mask handling behave as B stacked render_gaussians calls."""
    from guidedvd3dgs_tpu.models import gaussians as G
    from guidedvd3dgs_tpu.models.render import (
        render_gaussians,
        render_gaussians_multi,
    )

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols)
    cams = [
        make_camera(height=48, width=64, cam_z=-4.0).raster_camera(),
        make_camera(height=48, width=64, cam_z=-3.0, look_noise=0.3,
                    seed=5).raster_camera(),
    ]
    bg = jnp.zeros(3, jnp.float32)
    mo = render_gaussians_multi(
        state.params, state.active, state.confidence, stack_cameras(cams), bg,
        3, backend="tiles", max_instances=1 << 15,
    )
    for c, cam in enumerate(cams):
        o = render_gaussians(
            state.params, state.active, state.confidence, cam, bg, 3,
            backend="tiles", max_instances=1 << 14,
        )
        np.testing.assert_allclose(
            np.asarray(mo.color[c]), np.asarray(o.color), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(mo.visibility_filter[c]), np.asarray(o.visibility_filter)
        )


def test_guided_chunk_batched_matches_serial():
    """make_guided_steps_chunk on the tile backend: the batched two-camera
    render path must produce the same post-chunk state and metrics as two
    serial single-camera renders (set_batch_renders toggle)."""
    from guidedvd3dgs_tpu.models import gaussians as G
    from guidedvd3dgs_tpu.train import guided as GU

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (150, 3)).astype(np.float32)

    cams = [
        make_camera(height=32, width=48).raster_camera(),
        make_camera(height=32, width=48, cam_z=-3.5, look_noise=0.2,
                    seed=7).raster_camera(),
    ]
    rcs = stack_cameras([cams[0]])
    pool_rcs = stack_cameras([cams[1], cams[1]])
    gts = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 48)), jnp.float32)
    pool_gts = jnp.asarray(rng.uniform(0, 1, (2, 3, 32, 48)), jnp.float32)
    K = 3
    kk = jnp.zeros((K,), jnp.int32)
    lrs = G.LearningRates(xyz=1e-3, f_dc=2.5e-3, f_rest=1.25e-4,
                          opacity=0.05, scaling=5e-3, rotation=1e-3)
    bg = jnp.zeros(3, jnp.float32)

    def run(batched, adam):
        GU.set_batch_renders(batched)
        try:
            chunk = GU.make_guided_steps_chunk()
            state = G.create_from_pcd(pts, cols)
            return chunk(
                state, rcs, gts, pool_rcs, pool_gts,
                kk, jnp.array([0, 1, 0], jnp.int32),
                jnp.full((K,), 0.05, jnp.float32),
                jnp.ones((K,), bool),
                jnp.full((K,), 1e-3, jnp.float32),
                jnp.full((K,), adam, bool), jnp.ones((K,), bool),
                bg, lrs,
                sh_degree=0, lambda_dssim=0.2, backend="tiles",
                max_instances=1 << 14, with_pseudo=True,
            )
        finally:
            GU.set_batch_renders(True)

    # Adam OFF: losses, max radii and densify stats (functions of the
    # gradients) must agree to f32 reduction noise. The batched buffer lays
    # instances at different block offsets, so intra-segment summation
    # order differs by ~1 ulp — same nondeterminism class as the reference
    # CUDA atomics (backward.cu:555-598), kept out of this strict check.
    st_b, m_b = run(True, adam=False)
    st_s, m_s = run(False, adam=False)
    for a, b in zip(jax.tree.leaves(st_b), jax.tree.leaves(st_s)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
        else:
            np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(
        np.asarray(m_b["loss"]), np.asarray(m_s["loss"]), rtol=1e-5
    )
    # batched demand = train + pseudo instances (the buffer sizing contract)
    assert int(np.asarray(m_b["num_instances"]).max()) >= int(
        np.asarray(m_s["num_instances"]).max()
    )

    # Adam ON: eps=1e-15 amplifies cancellation-noise gradients to +-lr per
    # step, so per-param drift is bounded by ~K * lr, not by grad parity.
    st_b, _ = run(True, adam=True)
    st_s, _ = run(False, adam=True)
    for a, b in zip(
        jax.tree.leaves(st_b.params), jax.tree.leaves(st_s.params)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= K * 5e-3 + 1e-5
