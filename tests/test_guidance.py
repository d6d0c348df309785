"""Guidance subsystem tests: pose math properties, morphology vs scipy,
point splatter, LossGuidance semantics."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from guidedvd3dgs_tpu.guidance import morphology as M
from guidedvd3dgs_tpu.guidance import pose_math as P
from guidedvd3dgs_tpu.guidance.loss_guidance import make_guidance_fn, resize_guidance, GuidanceBuffers
from guidedvd3dgs_tpu.ops.point_splat import splat_points


def _random_pose(rng):
    from scipy.spatial.transform import Rotation

    c2w = np.eye(4)
    c2w[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    c2w[:3, 3] = rng.normal(size=3)
    return c2w


def test_sphere2pose_identity():
    rng = np.random.default_rng(0)
    c2w = _random_pose(rng)[None]
    out = P.sphere2pose(c2w, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(out, c2w, atol=1e-12)


def test_sphere2pose_rotation_composition():
    """theta about x then phi about y, applied L-to-R as rot_y @ rot_x @ c2w."""
    c2w = np.eye(4)[None]
    out = P.sphere2pose(c2w, 90.0, 0.0, 1.0)
    # translate z by 1 then rotate 90deg about x: position (0,0,1) -> (0,-1,0)
    np.testing.assert_allclose(out[0, :3, 3], [0, -1, 0], atol=1e-12)


def test_world_to_obj_transform_back_roundtrip():
    rng = np.random.default_rng(1)
    poses = np.stack([_random_pose(rng) for _ in range(3)])
    pts = rng.normal(size=(3, 4, 5, 3))
    new_poses, new_pts, back = P.world_to_obj(poses, pts, k=1, r=2.0, elevation_deg=5.0)
    # transform_back must restore the original poses
    restored = back[None] @ new_poses
    np.testing.assert_allclose(restored, poses, atol=1e-10)
    # pose k in the object frame sits at -R_obj^T [0,0,r]
    el = np.deg2rad(180 - 5.0)
    np.testing.assert_allclose(
        new_poses[1, :3, 3], [0, np.sin(el) * 2.0, -np.cos(el) * 2.0], atol=1e-10
    )


def test_candidate_grid_and_trajectory_shapes():
    c2w = np.eye(4)[None]
    back = np.eye(4)
    cands, offsets = P.candidate_pose_grid(c2w, back, d_phi=[-10, 0, 10], d_theta=[-5, 5])
    assert cands.shape == (6, 4, 4) and len(offsets) == 6
    c2w_r = c2w.copy()
    c2w_r[0, 2, 3] = 1.5
    traj = P.interpolate_trajectory(c2w_r, d_phi=10.0, d_theta=5.0, d_r=0.1, frames=25)
    assert traj.shape == (25, 4, 4)
    np.testing.assert_allclose(traj[0], c2w_r[0], atol=1e-12)  # starts at source
    loop = P.interpolate_trajectory_loopclosure(c2w_r, 10.0, 5.0, 0.1, frames=25)
    np.testing.assert_allclose(loop[0], c2w_r[0], atol=1e-9)
    np.testing.assert_allclose(loop[-1], c2w_r[0], atol=1e-9)  # closes the loop


@pytest.mark.parametrize("size", [3, 5])
def test_morphology_matches_scipy(size):
    rng = np.random.default_rng(2)
    m = (rng.uniform(size=(32, 32)) > 0.6).astype(np.float32)
    ours_e = np.asarray(M.erode(jnp.asarray(m), size))
    ref_e = ndimage.binary_erosion(m, structure=np.ones((size, size))).astype(np.float32)
    np.testing.assert_array_equal(ours_e, ref_e)
    ours_d = np.asarray(M.dilate(jnp.asarray(m), size))
    ref_d = ndimage.binary_dilation(m, structure=np.ones((size, size))).astype(np.float32)
    np.testing.assert_array_equal(ours_d, ref_d)


def test_splat_occlusion_and_mask():
    # two points on the same pixel: nearer one wins; off-screen culled
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0], [100.0, 0.0, 1.0]])
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    out = splat_points(pts, cols, fx=32, fy=32, cx=16, cy=16, height=32, width=32,
                       radius_ndc=0.0)
    np.testing.assert_allclose(np.asarray(out.image[16, 16]), [0, 1, 0], atol=1e-6)
    assert float(out.depth[16, 16]) == 1.0
    assert int(out.mask.sum()) == 1


def test_splat_radius_footprint():
    pts = jnp.asarray([[0.0, 0.0, 1.0]])
    cols = jnp.asarray([[1.0, 1.0, 1.0]])
    out = splat_points(pts, cols, fx=32, fy=32, cx=16, cy=16, height=32, width=32,
                       radius_ndc=0.1)  # r_pix = round(0.1*16) = 2 -> 5x5
    assert int(out.mask.sum()) == 25


def test_loss_guidance_masked_l2():
    t, h, w = 2, 8, 8
    g = jnp.zeros((t, 3, h, w)) + 0.5
    masks = jnp.ones((t, 1, h, w)).at[:, :, :4].set(0.0)
    buf = resize_guidance(g, h, w, masks=masks)
    fn = make_guidance_fn(buf, w_recon=0.5)
    frame = jnp.zeros((h, w, 3)) - 1.0  # decodes to 0.0 in [0,1]
    loss, numel = fn(frame, 0, 0)
    # masked half contributes 0.5 * (0 - 0.5)^2 * (h/2*w*3)
    expect = 0.5 * 0.25 * (h // 2) * w * 3
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)
    assert float(numel) == (h // 2) * w * 3
