"""Degenerate-Gaussian stability: culled/pathological rows must never
produce non-finite values OR gradients.

Regression test for a real training collapse: 6157 iterations into a run, a
Gaussian drifted to view-space z == 0.0 (bit-exact) under one camera.
fx/tz = inf made its conic NaN; the forward masked it (visible=False,
renders stayed finite), but the NaN (a) rode along in the binning field
table where the expansion kernel's one-hot MXU matmul (NaN*0=NaN) poisoned
every instance sharing its 128-lane window, and the segmented-sum carry then
poisoned every later Gaussian id; and (b) poisoned jax.grad through the
where(mask, safe, unsafe) trap (zero cotangent x inf partial = NaN). One
step NaN'd the entire model. The CUDA reference is immune because it
early-returns culled Gaussians before any cov2D math (forward.cu:165-171).
preprocess_gaussians now applies safe-where guards; these tests pin that.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.ops import raster_tiles
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
from guidedvd3dgs_tpu.ops.raster_dense import rasterize_dense

from helpers import activated, make_camera, random_gaussians


def degenerate_scene(n=192, seed=11):
    """Normal scene + pathological rows: z==0 plane, behind camera, at the
    camera center, near-zero quaternion, exploding scales."""
    xyz, log_scales, rots, opac, sh = random_gaussians(n=n, seed=seed)
    # camera sits at (0,0,-4) looking +z; view-space z = world z + 4
    xyz[0] = [0.3, 0.1, -4.0]      # view z == 0.0 exactly (the real collapse)
    xyz[1] = [0.0, 0.0, -5.0]      # behind the camera
    xyz[2] = [0.0, 0.0, -4.0]      # exactly at the camera center
    xyz[3] = [0.2, -0.1, -3.9001]  # inside the near clip (0 < z < 0.2)
    rots[4] = [1e-12, 0.0, 0.0, 0.0]  # denormal quaternion
    log_scales[5] = [60.0, 60.0, 60.0]  # exp overflow -> inf cov3d
    return activated(xyz, log_scales, rots, opac, sh)


def test_preprocess_outputs_finite_for_degenerate_rows():
    cam = make_camera(height=64, width=64).raster_camera()
    parts = tuple(jnp.asarray(p) for p in degenerate_scene())
    xyz, scales, rots, opac, sh = parts
    proc = preprocess_gaussians(xyz, scales, rots, opac, sh, cam, sh_degree=3)
    for name in ("means2d", "depths", "conics", "colors", "opacities"):
        a = np.asarray(getattr(proc, name))
        assert np.isfinite(a).all(), f"{name} non-finite"
    # the pathological rows must be culled, not rendered
    radii = np.asarray(proc.radii)
    assert (radii[:4] == 0).all() and radii[5] == 0
    # exact z==0 row: culled with finite conic
    assert not bool(proc.visible[0])


@pytest.mark.parametrize("backend", ["dense", "tiles"])
def test_gradients_finite_with_degenerate_rows(backend):
    cam = make_camera(height=64, width=64).raster_camera()
    parts = tuple(jnp.asarray(p) for p in degenerate_scene())
    target = jnp.full((3, 64, 64), 0.5)
    bg = jnp.zeros(3)

    if backend == "tiles":
        raster_tiles.set_interpret(jax.devices()[0].platform == "cpu")

    def loss_fn(xyz, scales, rots, opac, sh):
        if backend == "dense":
            out = rasterize_dense(xyz, scales, rots, opac, sh, cam, bg)
        else:
            out = raster_tiles.rasterize_tiles(
                xyz, scales, rots, opac, sh, cam, bg, max_instances=8192
            )
        return (
            jnp.abs(out.color - target).mean()
            + 0.1 * out.depth.mean()
            + 0.1 * out.alpha.mean()
        )

    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*parts)
    assert np.isfinite(float(val))
    for i, g in enumerate(grads):
        assert np.isfinite(np.asarray(g)).all(), f"grad[{i}] non-finite"
