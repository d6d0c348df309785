"""Dense oracle rasterizer: geometric sanity + blending semantics + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.ops.projection import RasterCamera, preprocess_gaussians
from guidedvd3dgs_tpu.ops.raster_dense import rasterize_dense

from helpers import activated, make_camera, random_gaussians


def _render(n=200, seed=0, height=48, width=48, bg=0.0, **kw):
    cam = make_camera(height=height, width=width).raster_camera()
    parts = activated(*random_gaussians(n=n, seed=seed))
    xyz, scales, rots, opac, sh = (jnp.asarray(p) for p in parts)
    out = rasterize_dense(xyz, scales, rots, opac, sh, cam, jnp.full((3,), bg), **kw)
    return out, (xyz, scales, rots, opac, sh), cam


def test_center_gaussian_projects_to_center():
    cam = make_camera(height=64, width=64).raster_camera()
    xyz = jnp.array([[0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), 0.05)
    rots = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([[0.9]])
    sh = jnp.zeros((1, 16, 3))
    proc = preprocess_gaussians(xyz, scales, rots, opac, sh, cam)
    # ndc 0 -> pixel (S-1)/2
    np.testing.assert_allclose(np.asarray(proc.means2d[0]), [31.5, 31.5], atol=1e-4)
    assert float(proc.depths[0]) == pytest.approx(4.0, abs=1e-5)
    assert int(proc.radii[0]) > 0


def test_behind_camera_culled():
    cam = make_camera(cam_z=-4.0).raster_camera()
    xyz = jnp.array([[0.0, 0.0, -10.0]])  # behind camera (depth < 0.2)
    proc = preprocess_gaussians(
        xyz, jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]), jnp.array([[0.9]]),
        jnp.zeros((1, 16, 3)), cam,
    )
    assert int(proc.radii[0]) == 0
    assert not bool(proc.visible[0])


def test_background_composites_where_empty():
    out, _, _ = _render(n=1, bg=0.75)
    img = np.asarray(out.color)
    # corners should be (nearly) pure background
    assert img[:, 0, 0] == pytest.approx(0.75, abs=1e-3)


def test_alpha_bounded_and_depth_consistent():
    out, _, _ = _render(n=300, seed=1)
    alpha = np.asarray(out.alpha)
    assert alpha.min() >= 0.0 and alpha.max() <= 1.0 + 1e-5
    depth = np.asarray(out.depth)
    # accumulated depth should be within alpha * [min_depth, max_depth]
    assert depth.min() >= -1e-5


def test_front_to_back_occlusion():
    """An opaque near Gaussian must hide a far one."""
    cam = make_camera(height=32, width=32).raster_camera()
    xyz = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])  # depths 3 and 5
    scales = jnp.full((2, 3), 0.5)
    rots = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([[0.999], [0.999]])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = rasterize_dense(
        xyz, scales, rots, opac, None, cam, jnp.zeros(3), colors_precomp=colors
    )
    c = np.asarray(out.color)[:, 16, 16]
    assert c[0] > 0.9  # near red dominates
    assert c[1] < 0.1


def test_order_independence_of_sorting():
    """Shuffling input order must not change the image (sort by depth)."""
    out1, parts, cam = _render(n=120, seed=3)
    xyz, scales, rots, opac, sh = parts
    perm = np.random.default_rng(0).permutation(120)
    out2 = rasterize_dense(
        xyz[perm], scales[perm], rots[perm], opac[perm], sh[perm], cam, jnp.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(out1.color), np.asarray(out2.color), atol=1e-5)


@pytest.mark.slow
def test_gradients_flow_and_are_finite():
    cam = make_camera(height=32, width=32).raster_camera()
    parts = activated(*random_gaussians(n=64, seed=5))
    xyz, scales, rots, opac, sh = (jnp.asarray(p) for p in parts)
    target = jnp.ones((3, 32, 32)) * 0.5

    def loss_fn(xyz, scales, rots, opac, sh, off):
        out = rasterize_dense(
            xyz, scales, rots, opac, sh, cam, jnp.zeros(3), means2d_offset=off
        )
        return jnp.abs(out.color - target).mean()

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
        xyz, scales, rots, opac, sh, jnp.zeros((64, 2))
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # the screen-space offset hook must receive gradient signal
    assert np.abs(np.asarray(grads[5])).sum() > 0


@pytest.mark.slow
def test_finite_difference_opacity_grad():
    """Finite-difference check of a scalar parameter through the full blend."""
    cam = make_camera(height=24, width=24).raster_camera()
    parts = activated(*random_gaussians(n=16, seed=7))
    xyz, scales, rots, opac, sh = (jnp.asarray(p) for p in parts)
    target = jnp.zeros((3, 24, 24))

    def loss_fn(o):
        out = rasterize_dense(xyz, scales, rots, o, sh, cam, jnp.zeros(3))
        return ((out.color - target) ** 2).sum()

    g = jax.grad(loss_fn)(opac)
    eps = 1e-3
    for idx in [0, 5, 11]:
        o_p = opac.at[idx, 0].add(eps)
        o_m = opac.at[idx, 0].add(-eps)
        fd = (loss_fn(o_p) - loss_fn(o_m)) / (2 * eps)
        assert float(g[idx, 0]) == pytest.approx(float(fd), rel=0.05, abs=1e-4)
