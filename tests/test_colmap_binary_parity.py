"""COLMAP binary parsers vs the EXECUTED reference colmap_loader over a
hand-constructed binary model (format per COLMAP's write_model): our
read_cameras_binary / read_images_binary / read_points3D_binary must decode
the same cameras, extrinsics, 2D points, point ids, xyz/rgb/errors as
reference scene/colmap_loader.py:113-230."""

import importlib.util
import struct

import numpy as np
import pytest

from guidedvd3dgs_tpu.scene import colmap as C

REF_LOADER = "/root/reference/scene/colmap_loader.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_colmap", REF_LOADER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_model(tmp_path):
    rng = np.random.default_rng(0)
    cam_path = tmp_path / "cameras.bin"
    with open(cam_path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        # PINHOLE (model 1, 4 params), SIMPLE_PINHOLE (model 0, 3 params)
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        f.write(struct.pack("<iiQQ", 2, 0, 320, 240))
        f.write(struct.pack("<3d", 260.0, 160.0, 120.0))

    img_path = tmp_path / "images.bin"
    with open(img_path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        for image_id, cam_id, name in [(1, 1, b"a.png"), (7, 2, b"b.png")]:
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(struct.pack("<idddddddi", image_id, *q, *t, cam_id))
            f.write(name + b"\x00")
            n2d = 3
            f.write(struct.pack("<Q", n2d))
            for j in range(n2d):
                f.write(struct.pack("<ddq", 10.0 * j + image_id, 5.0 * j, j - 1))

    pts_path = tmp_path / "points3D.bin"
    with open(pts_path, "wb") as f:
        f.write(struct.pack("<Q", 3))
        for pid in range(3):
            xyz = rng.normal(size=3)
            rgb = rng.integers(0, 255, 3)
            f.write(struct.pack("<QdddBBBd", pid, *xyz, *rgb, 0.5 * pid))
            track = 2
            f.write(struct.pack("<Q", track))
            for _ in range(track):
                f.write(struct.pack("<ii", 1, 0))
    return cam_path, img_path, pts_path


def test_binary_parsers_match_reference(ref, tmp_path):
    cam_path, img_path, pts_path = _write_model(tmp_path)

    ref_cams = ref.read_intrinsics_binary(str(cam_path))
    our_cams = C.read_cameras_binary(str(cam_path))
    assert set(our_cams) == set(ref_cams)
    for cid in ref_cams:
        r, o = ref_cams[cid], our_cams[cid]
        assert (o.model, o.width, o.height) == (r.model, r.width, r.height)
        np.testing.assert_allclose(o.params, r.params)

    ref_imgs = ref.read_extrinsics_binary(str(img_path))
    our_imgs = C.read_images_binary(str(img_path))
    assert set(our_imgs) == set(ref_imgs)
    for iid in ref_imgs:
        r, o = ref_imgs[iid], our_imgs[iid]
        np.testing.assert_allclose(o.qvec, r.qvec)
        np.testing.assert_allclose(o.tvec, r.tvec)
        assert o.camera_id == r.camera_id and o.name == r.name
        np.testing.assert_allclose(o.xys, r.xys)
        np.testing.assert_array_equal(o.point3D_ids, r.point3D_ids)

    ref_xyz, ref_rgb, ref_err = ref.read_points3D_binary(str(pts_path))
    our_xyz, our_rgb, our_err = C.read_points3D_binary(str(pts_path))
    np.testing.assert_allclose(our_xyz, ref_xyz)
    np.testing.assert_allclose(our_rgb, ref_rgb)
    np.testing.assert_allclose(our_err.reshape(ref_err.shape), ref_err)


def test_qvec2rotmat_matches_reference(ref):
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        np.testing.assert_allclose(
            C.qvec2rotmat(q), ref.qvec2rotmat(q), rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            C.rotmat2qvec(C.qvec2rotmat(q)), ref.rotmat2qvec(ref.qvec2rotmat(q)),
            rtol=1e-8, atol=1e-10,
        )
