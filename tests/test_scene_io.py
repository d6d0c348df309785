"""Scene IO: PLY round trips, COLMAP parsers, camera math, config system."""

import os

import numpy as np

from guidedvd3dgs_tpu.config import (
    ModelParams,
    OptimizationParams,
    build_parser,
    parse_namespace_repr,
)
from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.scene import colmap
from guidedvd3dgs_tpu.scene.dataset_readers import (
    replica_test_indices,
    scannetpp_test_indices,
)
from guidedvd3dgs_tpu.scene.ply import (
    fetch_ply,
    load_gaussian_ply,
    read_ply,
    save_gaussian_ply,
    store_ply,
    write_ply,
)


def test_ply_roundtrip_pointcloud(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    rgb = (np.random.default_rng(1).uniform(size=(50, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    store_ply(p, xyz, rgb)
    pc = fetch_ply(p)
    np.testing.assert_allclose(pc.points, xyz, atol=1e-6)
    np.testing.assert_allclose(pc.colors * 255, rgb, atol=0.51)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    st = G.create_from_pcd(
        rng.normal(size=(20, 3)).astype(np.float32),
        rng.uniform(size=(20, 3)).astype(np.float32),
        capacity=32,
    )
    p = str(tmp_path / "point_cloud.ply")
    save_gaussian_ply(p, st.params, np.asarray(st.active))
    arrs = load_gaussian_ply(p)
    assert arrs["xyz"].shape == (20, 3)
    assert arrs["features_rest"].shape == (20, 15, 3)
    np.testing.assert_allclose(arrs["xyz"], np.asarray(st.params.xyz[:20]), atol=1e-6)
    np.testing.assert_allclose(
        arrs["features_dc"], np.asarray(st.params.features_dc[:20]), atol=1e-6
    )
    np.testing.assert_allclose(arrs["scaling"], np.asarray(st.params.scaling[:20]), atol=1e-6)


def test_ply_ascii(tmp_path):
    p = str(tmp_path / "a.ply")
    write_ply(p, {"x": np.arange(3.0), "y": np.arange(3.0) * 2}, binary=False)
    cols = read_ply(p)
    np.testing.assert_allclose(cols["y"], [0, 2, 4])


def test_colmap_text_roundtrip(tmp_path):
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))
    }
    q = colmap.rotmat2qvec(np.eye(3))
    ims = {
        1: colmap.ColmapImage(
            1, q, np.array([0.1, 0.2, 0.3]), 1, "img_000.png", np.zeros((0, 2)), np.zeros(0, np.int64)
        )
    }
    colmap.write_cameras_text(str(tmp_path / "cameras.txt"), cams)
    colmap.write_images_text(str(tmp_path / "images.txt"), ims)
    cams2 = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
    ims2 = colmap.read_images_text(str(tmp_path / "images.txt"))
    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(ims2[1].qvec, q)
    np.testing.assert_allclose(ims2[1].tvec, [0.1, 0.2, 0.3])
    R = colmap.qvec2rotmat(ims2[1].qvec)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-8)


def test_qvec_rotmat_inverse():
    rng = np.random.default_rng(5)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        q2 = colmap.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-6)


def test_split_synthesis_rules():
    # Replica: every 10th within +/-50 of anchors
    t = replica_test_indices([100], 1000)
    assert 100 not in t
    assert all(50 <= i < 150 for i in t)
    assert len(t) == 10
    # ScanNet++: every 6th in covered range minus train
    t2 = scannetpp_test_indices([20, 50], 100)
    assert all(i not in (20, 50) for i in t2)
    assert min(t2) >= 10 and max(t2) <= 60


def test_config_reflection_and_namespace_parse():
    parser = build_parser()
    args = parser.parse_args(
        ["-s", "/data/x", "--iterations", "5000", "--white_background", "--no_guidance"]
    )
    mp = ModelParams.extract(args)
    op = OptimizationParams.extract(args)
    assert mp.source_path == "/data/x"
    assert mp.white_background is True
    assert op.iterations == 5000
    assert op.no_guidance is True
    assert op.guidance_vd_iter == 260  # default preserved

    ns = parse_namespace_repr(
        "Namespace(sh_degree=3, source_path='/d', eval=True, lr=0.01, names=['a','b'])"
    )
    assert ns["sh_degree"] == 3 and ns["names"] == ["a", "b"]


def test_farthest_point_sampling():
    from guidedvd3dgs_tpu.scene.dataset_readers import farthest_point_sampling

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    out = farthest_point_sampling(pts, 16, seed=1)
    assert out.shape == (16, 3)
    # sampled points are actual input points, all distinct
    assert len({tuple(p) for p in out}) == 16
    d = ((pts[None] - out[:, None]) ** 2).sum(-1).min(axis=0)
    # greedy FPS covers the cloud better than the first-16 prefix
    prefix = ((pts[None] - pts[:16][:, None]) ** 2).sum(-1).min(axis=0)
    assert d.max() < prefix.max()


def test_replica_demo_setting_table():
    from guidedvd3dgs_tpu.scene.dataset_readers import (
        REPLICA_TRAIN_IDX_DEMO,
        replica_test_indices,
    )

    # reference scene/dataset_readers.py:390-398 verbatim, test == train
    assert REPLICA_TRAIN_IDX_DEMO["office3_seq1"] == [22, 98, 187, 315, 504, 581]
    t = replica_test_indices(REPLICA_TRAIN_IDX_DEMO["room0_seq2"], 900)
    assert t and all(i not in REPLICA_TRAIN_IDX_DEMO["room0_seq2"] for i in t)
