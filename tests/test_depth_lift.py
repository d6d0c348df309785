"""Depth-lift math: scale/shift recovery, unprojection roundtrip, append path."""

import numpy as np

from guidedvd3dgs_tpu.guidance import depth_lift as DL


def test_scale_shift_recovers_exact_alignment():
    rng = np.random.default_rng(0)
    real = rng.uniform(1.0, 5.0, size=(2, 8, 8))
    # rel depth that is an exact affine fit: 1/real = s*rel + t*(1-rel)
    s_true, t_true = 0.9, 0.05
    rel = (1.0 / real - t_true) / (s_true - t_true)
    mask = np.ones_like(real)
    scale, shift = DL.fit_scale_shift(rel, real, mask)
    metric = DL.rel_to_metric(rel, scale, shift)
    np.testing.assert_allclose(metric, real, rtol=1e-5)


def test_depth_to_point_cloud_roundtrip():
    rng = np.random.default_rng(1)
    h, w = 6, 8
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    c2w = np.eye(4)
    c2w[:3, 3] = [0.3, -0.2, 0.1]
    depth = rng.uniform(1.0, 3.0, size=(h, w))
    rgb = rng.uniform(size=(h, w, 3))
    mask = np.ones((h, w))
    pts, cols = DL.depth_to_point_cloud(depth, K, c2w, mask, rgb)
    assert pts.shape == (h * w, 3)
    # reproject: world -> cam -> pixel must hit the original grid
    w2c = np.linalg.inv(c2w)
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    u = cam[:, 0] / cam[:, 2] * K[0, 0] + K[0, 2]
    v = cam[:, 1] / cam[:, 2] * K[1, 1] + K[1, 2]
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(u, uu.flatten(), atol=1e-9)
    np.testing.assert_allclose(v, vv.flatten(), atol=1e-9)
    np.testing.assert_allclose(cam[:, 2], depth.flatten(), atol=1e-12)


def test_lift_video_filters_and_subsamples():
    rng = np.random.default_rng(2)
    n, h, w = 2, 8, 8
    K = np.array([[20.0, 0, 4], [0, 20.0, 4], [0, 0, 1]])
    real = rng.uniform(1.0, 4.0, size=(n, h, w))
    rel = (1.0 / real - 0.05) / 0.85
    frames = rng.uniform(size=(n, h, w, 3))
    observed = np.zeros((n, h, w))
    observed[:, :, :4] = 1.0  # left half observed -> right half lifted
    trajs = np.stack([np.eye(4)] * n)
    pts, rgbs = DL.lift_video_to_points(frames, rel, real, observed, trajs, K,
                                        frame_gap=2)
    assert pts.shape[0] == rgbs.shape[0] > 0
    assert np.isfinite(pts).all()
    # every-2nd of 32 unobserved pixels per frame
    assert pts.shape[0] == n * 16
