"""Fused Pallas preprocess (ops/preprocess_pallas.py) vs the pure-XLA
preprocess (ops/projection.py) — values and VJP grads, interpret mode."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.ops import preprocess_pallas as pf
from guidedvd3dgs_tpu.ops.projection import RasterCamera, preprocess_gaussians
from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix, getWorld2View2

pf.set_interpret(True)


@pytest.fixture(autouse=True)
def _interpret():
    prev = pf._INTERPRET[0]
    pf.set_interpret(True)
    yield
    pf.set_interpret(prev)


def make_cam(h=64, w=96):
    fov = math.radians(60)
    view = np.asarray(
        getWorld2View2(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    ).T
    proj = np.asarray(getProjectionMatrix(0.01, 100.0, fov, fov)).T
    return RasterCamera(
        jnp.asarray(view), jnp.asarray(view @ proj),
        jnp.asarray(np.linalg.inv(view.T)[:3, 3]),
        math.tan(fov / 2), math.tan(fov / 2), h, w,
    )


def make_scene(n=777, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    means[:, 2] += 3.0
    means[:5, 2] = -1.0  # behind camera: exercises the cull/safe-where path
    scales = np.exp(rng.uniform(-5.5, -3.5, (n, 3))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(size=(n, 1))))).astype(np.float32)
    shs = (rng.normal(size=(n, 16, 3)) * 0.3).astype(np.float32)
    return tuple(map(jnp.asarray, (means, scales, rots, opac, shs)))


@pytest.mark.parametrize("sh_degree", [0, 1, 3])
def test_fused_fwd_matches_xla(sh_degree):
    cam = make_cam()
    means, scales, rots, opac, shs = make_scene()
    proc = preprocess_gaussians(
        means, scales, rots, opac, shs, cam, sh_degree=sh_degree
    )
    out16 = pf.preprocess_fused_fwd(
        means, scales, rots, opac, shs, cam, sh_degree, 1.0
    )
    np.testing.assert_allclose(out16[0], proc.means2d[:, 0], rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(out16[1], proc.means2d[:, 1], rtol=1e-6, atol=1e-5)
    for i in range(3):
        np.testing.assert_allclose(
            out16[2 + i], proc.conics[:, i], rtol=1e-6, atol=1e-6
        )
    np.testing.assert_allclose(out16[5], proc.opacities, rtol=0, atol=0)
    for i in range(3):
        np.testing.assert_allclose(
            out16[6 + i], proc.colors[:, i], rtol=1e-6, atol=1e-6
        )
    np.testing.assert_allclose(out16[9], proc.depths, rtol=1e-6, atol=1e-6)
    # radius/visible/ext rows (visible here has no active_mask)
    vis = out16[11] > 0.5
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(proc.visible))
    radii = np.where(np.asarray(vis), np.asarray(out16[10]), 0.0).astype(np.int32)
    np.testing.assert_array_equal(radii, np.asarray(proc.radii))
    np.testing.assert_allclose(out16[12], proc.ext_x, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out16[13], proc.ext_y, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("sh_degree", [1, 3])
def test_fused_bwd_matches_xla_vjp(sh_degree):
    cam = make_cam()
    means, scales, rots, opac, shs = make_scene(n=513, seed=3)  # forces padding
    rng = np.random.default_rng(9)
    n = means.shape[0]
    cot10 = jnp.asarray(rng.normal(size=(10, n)).astype(np.float32))

    def xla_fields(m, s, r, o, sh):
        proc = preprocess_gaussians(m, s, r, o, sh, cam, sh_degree=sh_degree)
        return jnp.stack(
            [
                proc.means2d[:, 0], proc.means2d[:, 1],
                proc.conics[:, 0], proc.conics[:, 1], proc.conics[:, 2],
                proc.opacities,
                proc.colors[:, 0], proc.colors[:, 1], proc.colors[:, 2],
                proc.depths,
            ]
        )

    _, vjp = jax.vjp(xla_fields, means, scales, rots, opac, shs)
    ref = vjp(cot10)
    got = pf.preprocess_fused_bwd(
        means, scales, rots, opac, shs, cam, sh_degree, 1.0, cot10
    )
    names = ["means", "scales", "rots", "opac", "shs"]
    for nm, a, b in zip(names, got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=nm
        )


def test_fused_active_degree_masks_bands():
    cam = make_cam()
    means, scales, rots, opac, shs = make_scene(n=256, seed=5)
    full = pf.preprocess_fused_fwd(means, scales, rots, opac, shs, cam, 3, 1.0)
    masked = pf.preprocess_fused_fwd(
        means, scales, rots, opac, shs, cam, 3, 1.0,
        active_degree=jnp.float32(0.0),
    )
    deg0 = preprocess_gaussians(
        means, scales, rots, opac, shs, cam, sh_degree=3,
        active_degree=jnp.float32(0.0),
    )
    for i in range(3):
        np.testing.assert_allclose(
            masked[6 + i], deg0.colors[:, i], rtol=1e-6, atol=1e-6
        )
    assert not np.allclose(np.asarray(full[6]), np.asarray(masked[6]))
