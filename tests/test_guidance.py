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


def test_visible_points_mask_occlusion():
    """Single-view visibility (reference pc_render_single_view role): a point
    hidden behind another from the source view is excluded, so it cannot
    appear when the trajectory moves sideways."""
    import jax.numpy as jnp

    from guidedvd3dgs_tpu.ops.point_splat import (
        splat_points_world,
        visible_points_mask,
    )

    K = np.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    w2c = np.eye(4)
    # front point at z=2 and a hidden point directly behind it at z=4;
    # a third point visible off to the side
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0], [0.3, 0.0, 2.0]])
    cols = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])

    vis = visible_points_mask(pts, jnp.asarray(w2c), jnp.asarray(K), 32, 32)
    assert bool(vis[0]) and not bool(vis[1]) and bool(vis[2])

    # sideways camera: without the mask the occluded green point appears
    side = np.eye(4)
    side[0, 3] = -1.5  # shift right in camera x -> sees "around" the front pt
    out_all = splat_points_world(pts, cols, jnp.asarray(side), jnp.asarray(K),
                                 32, 32)
    out_vis = splat_points_world(pts, cols, jnp.asarray(side), jnp.asarray(K),
                                 32, 32, point_mask=vis)
    green_all = float((out_all.image[..., 1] > 0.5).sum())
    green_vis = float((out_vis.image[..., 1] > 0.5).sum())
    assert green_all > 0 and green_vis == 0


def test_guidance_recon_loss_l1_vs_l2():
    """recon_loss flag switches the guidance penalty (reference ctor arg
    viewcrafter_wrapper.py:53): |d-g| vs (d-g)^2 under the same mask."""
    import jax.numpy as jnp

    from guidedvd3dgs_tpu.guidance.loss_guidance import (
        GuidanceBuffers,
        make_guidance_fn,
    )

    g = jnp.zeros((1, 8, 8, 3)) + 0.25
    buffers = GuidanceBuffers(images=g, masks=None, depths=None)
    frame = jnp.zeros((8, 8, 3)) - 1.0  # decodes to 0.0 -> diff 0.25

    l2, n2 = make_guidance_fn(buffers, w_recon=1.0)(frame, 0, 0)
    l1, n1 = make_guidance_fn(buffers, w_recon=1.0, recon_loss="l1")(frame, 0, 0)
    np.testing.assert_allclose(float(l2), 0.25 ** 2 * 8 * 8 * 3, rtol=1e-5)
    np.testing.assert_allclose(float(l1), 0.25 * 8 * 8 * 3, rtol=1e-5)
    assert float(n1) == float(n2) == 8 * 8 * 3

    with pytest.raises(ValueError):
        make_guidance_fn(buffers, recon_loss="huber")


def test_augment_ply_with_depth_tool(tmp_path):
    """Offline ply augmentation (reference inpainted_depth_to_pointcloud.py
    __main__ role): masked inpainted depth unprojects to the expected world
    points and is appended to the base ply."""
    from PIL import Image

    from guidedvd3dgs_tpu.scene.ply import fetch_ply, store_ply
    from tools.augment_ply_with_depth import augment

    sparse = tmp_path / "sparse"
    sparse.mkdir()
    (sparse / "cameras.txt").write_text("1 PINHOLE 16 16 10 10 8 8\n")
    # identity pose camera at origin
    (sparse / "images.txt").write_text("1 1 0 0 0 0 0 0 1 frame_0.png\n\n")

    base_ply = tmp_path / "points3D.ply"
    store_ply(str(base_ply), np.zeros((4, 3)), np.full((4, 3), 128, np.uint8))

    rgb_d, dep_d, msk_d = tmp_path / "rgb", tmp_path / "dep", tmp_path / "msk"
    for d in (rgb_d, dep_d, msk_d):
        d.mkdir()
    depth = np.full((16, 16), 2.0, np.float32)
    np.save(dep_d / "frame_0.npy", depth)
    mask = np.zeros((16, 16), np.uint8)
    mask[8, 8] = 255  # principal point
    mask[8, 13] = 255  # u=13 -> x=(13-8)*2/10=1.0
    Image.fromarray(mask).save(msk_d / "frame_0.png")
    Image.fromarray(np.full((16, 16, 3), 255, np.uint8)).save(rgb_d / "frame_0.png")

    out = tmp_path / "out.ply"
    n = augment(str(base_ply), str(sparse), str(rgb_d), str(dep_d),
                str(msk_d), str(out), every=1, stride=1)
    assert n == 6
    res = fetch_ply(str(out))
    added = np.asarray(res.points[4:])
    expect = {(0.0, 0.0, 2.0), (1.0, 0.0, 2.0)}
    got = {tuple(np.round(p, 6)) for p in added}
    assert got == expect, got
    np.testing.assert_allclose(res.colors[4:], 1.0, atol=1 / 255.0 + 1e-6)
