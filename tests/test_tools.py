"""Tools tests: dataset->COLMAP converters roundtrip through our reader,
pcd2img projection semantics."""

import os

import numpy as np
import pytest

from guidedvd3dgs_tpu.scene import colmap as C
from guidedvd3dgs_tpu.scene.pcd2img import project_point_cloud_to_image
from tools.dataset_to_colmap import (
    auto_orient_and_center_poses,
    load_replica,
    save_cameras_txt,
    save_images_txt,
)


def test_replica_converter_roundtrip(tmp_path):
    imageio = pytest.importorskip("imageio.v2")
    # synthesize a tiny replica-style scene dir
    scene = tmp_path / "seq"
    (scene / "rgb").mkdir(parents=True)
    imageio.imwrite(str(scene / "rgb" / "rgb_0.png"), np.zeros((12, 16, 3), np.uint8))
    rng = np.random.default_rng(0)
    c2ws = []
    for _ in range(4):
        from scipy.spatial.transform import Rotation

        c2w = np.eye(4)
        c2w[:3, :3] = Rotation.random(random_state=rng).as_matrix()
        c2w[:3, 3] = rng.normal(size=3)
        c2ws.append(c2w)
    with open(scene / "traj_w_c.txt", "w") as f:
        for m in c2ws:
            f.write(" ".join(str(x) for x in m.flatten()) + "\n")

    w2c, Ks, H, W = load_replica(str(scene))
    assert (H, W) == (12, 16)
    sparse = scene / "sparse" / "0"
    os.makedirs(sparse)
    save_cameras_txt(str(sparse), Ks, H, W)
    save_images_txt(str(sparse), w2c)

    cams = C.read_cameras_text(str(sparse / "cameras.txt"))
    imgs = C.read_images_text(str(sparse / "images.txt"))
    assert len(cams) == len(imgs) == 4
    for i, im in imgs.items():
        R = C.qvec2rotmat(im.qvec)
        np.testing.assert_allclose(R, w2c[i, :3, :3], atol=1e-6)
        np.testing.assert_allclose(im.tvec, w2c[i, :3, 3], atol=1e-6)


def test_auto_orient_up_aligns_mean_up_with_z():
    rng = np.random.default_rng(1)
    from scipy.spatial.transform import Rotation

    poses = []
    for _ in range(6):
        p = np.eye(4)
        p[:3, :3] = (
            Rotation.from_euler("x", rng.normal(scale=0.1)).as_matrix()
        )
        p[:3, 3] = rng.normal(size=3)
        poses.append(p)
    poses = np.stack(poses).astype(np.float32)
    oriented, transform = auto_orient_and_center_poses(poses)
    up = oriented[:, :3, 1].mean(0)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-6)


def test_pcd2img_depth_buffering():
    pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]])
    cols = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    K = np.array([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]])
    img, mask = project_point_cloud_to_image(pts, cols, K, np.eye(4), 16, 16)
    assert mask[8, 8] == 1 and mask.sum() == 1
    np.testing.assert_array_equal(img[8, 8], [0, 255, 0])  # nearer green wins


def test_get_avg_results_reproduces_reference_aggregates(tmp_path, monkeypatch):
    """Our aggregate formula vs the reference's shipped results_allscenes.json
    (assets/results/replica_baseline): re-aggregate its per-scene values
    through get_avg_results.evaluate and recover the *_all fields exactly."""
    import json
    import os
    import sys

    ref = json.load(open(
        "/root/reference/assets/results/replica_baseline/results_allscenes.json"
    ))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import get_avg_results as g

    scenes = g.SCENES["replica"]
    assert len(scenes) == len(ref["psnr"])
    root = tmp_path / "output"
    for i, scene in enumerate(scenes):
        d = root / "exp" / scene
        d.mkdir(parents=True)
        (d / "results.json").write_text(json.dumps({
            "ours_10000": {
                "PSNR": ref["psnr"][i], "SSIM": ref["ssim"][i],
                "LPIPS": ref["lpips"][i], "LPIPS_ALEX": ref["lpips_alex"][i],
            }
        }))

    out = g.evaluate("exp", "replica", root=str(root))
    for k in ("psnr_all", "ssim_all", "lpips_all", "lpips_alex_all"):
        assert abs(out[k] - ref[k]) < 1e-9, k
