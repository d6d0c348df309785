"""Eval-stack tests: LPIPS structure, pose paths, checkpoint roundtrip."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.metrics.lpips import LPIPSModel, lpips_apply
from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from guidedvd3dgs_tpu.utils import pose_paths as PP


def _fake_alex():
    """Random-weight alex-shaped LPIPS model."""
    k = iter(jax.random.split(jax.random.key(0), 32))
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    idxs = [0, 3, 6, 8, 10]
    backbone = {}
    for idx, (ci, co, ks) in zip(idxs, chans):
        backbone[f"{idx}.weight"] = 0.1 * jax.random.normal(next(k), (co, ci, ks, ks))
        backbone[f"{idx}.bias"] = jnp.zeros((co,))
    lin = {
        f"{i}.weight": jnp.abs(jax.random.normal(next(k), (1, c, 1, 1))) * 0.05
        for i, c in enumerate([64, 192, 384, 256, 256])
    }
    return LPIPSModel(net_type="alex", backbone=backbone, lin=lin)


@pytest.mark.slow
def test_lpips_zero_for_identical_and_positive_for_different():
    m = _fake_alex()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
    d_same = float(lpips_apply(m, x, x)[0])
    d_diff = float(lpips_apply(m, x, y)[0])
    assert abs(d_same) < 1e-6
    assert d_diff > 1e-4


@pytest.mark.slow
def test_lpips_vgg_variant_runs():
    k = iter(jax.random.split(jax.random.key(1), 64))
    blocks = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    chans = [64, 128, 256, 512, 512]
    backbone = {}
    cin = 3
    for b, convs in enumerate(blocks):
        for ci in convs:
            backbone[f"{ci}.weight"] = 0.05 * jax.random.normal(next(k), (chans[b], cin, 3, 3))
            backbone[f"{ci}.bias"] = jnp.zeros((chans[b],))
            cin = chans[b]
    lin = {f"{i}.weight": jnp.ones((1, c, 1, 1)) * 0.01 for i, c in enumerate(chans)}
    m = LPIPSModel(net_type="vgg", backbone=backbone, lin=lin)
    x = jnp.zeros((1, 3, 64, 64))
    y = jnp.ones((1, 3, 64, 64)) * 0.5
    assert float(lpips_apply(m, x, y)[0]) > 0


def test_ellipse_path_points_at_scene():
    class V:
        def __init__(self, R, T):
            self.R, self.T = R, T

    # ring of cameras looking inward
    views = []
    for th in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        pos = np.array([2 * np.cos(th), 2 * np.sin(th), 0.5])
        z = -pos / np.linalg.norm(pos)
        x = np.cross(np.array([0, 0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w_R = np.stack([x, y, z], 1)
        w2c_R = c2w_R.T
        T = -w2c_R @ pos
        views.append(V(w2c_R.T, T))  # Camera stores R = w2c_R.T
    poses = PP.generate_ellipse_path(views, n_frames=24)
    assert len(poses) == 24
    for p in poses:
        assert np.isfinite(p).all()
        # rotation block carries the inverse PCA scale (reference semantics:
        # inv(transform) @ pose, pose_utils.py:196-199) — det nonzero
        assert abs(np.linalg.det(np.asarray(p)[:3, :3])) > 1e-3


def test_sample_np_inverts_uniform_cdf():
    t = np.linspace(0, 1, 11)
    w_logits = np.zeros(10)
    s = PP.sample_np(None, t, w_logits, 5)
    np.testing.assert_allclose(s, np.linspace(0, 1 - np.finfo(np.float32).eps, 5), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=64)
    state = state._replace(step=jnp.int32(17))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state, 1234)
    restored, it = load_checkpoint(p, state)
    assert it == 1234
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plot_images_grid(tmp_path):
    from guidedvd3dgs_tpu.utils.vis import plot_images

    n, h, w = 4, 12, 16
    imgs = np.random.default_rng(0).uniform(size=(n, h, w, 3)).astype(np.float32)
    wm = np.random.default_rng(1).normal(size=(n - 2, h, w)).astype(np.float32)
    out = str(tmp_path / "grid.png")
    plot_images(imgs, wm, out)
    import cv2

    img = cv2.imread(out)
    assert img is not None
    # two rows of (h + 2*pad), n columns of (w + pad) + pad
    assert img.shape == (2 * (h + 4), n * (w + 2) + 2, 3)
