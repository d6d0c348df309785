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


@pytest.mark.slow
def test_lpips_squeeze_features_parity_vs_torch():
    """_squeeze_features vs an executed plain-torch replica of torchvision
    squeezenet1_1.features with the LPIPS 7-slice taps (reference
    networks.py:15-16,70). Input 94x94 hits the ceil_mode maxpool rounding."""
    import torch

    from guidedvd3dgs_tpu.diffusion.convert import convert_state_dict
    from guidedvd3dgs_tpu.metrics.lpips import _squeeze_features

    torch.manual_seed(0)
    net = _torch_squeezenet11_features()
    backbone = convert_state_dict(dict(net.state_dict()))

    x = torch.randn(2, 3, 94, 94)
    slices = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 11), (11, 12), (12, 13)]
    with torch.no_grad():
        feats_ref, h = [], x
        for a, b in slices:
            for i in range(a, b):
                h = net[i](h)
            feats_ref.append(h.numpy())

    ours = _squeeze_features(backbone, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(ours) == 7
    for o, r in zip(ours, feats_ref):
        np.testing.assert_allclose(
            np.transpose(np.asarray(o), (0, 3, 1, 2)), r, rtol=1e-4, atol=1e-5
        )


def _torch_squeezenet11_features():
    """torchvision squeezenet1_1.features, replicated in plain torch with the
    same child names / state-dict keys (torchvision is not in this image)."""
    import torch
    from torch import nn

    class Fire(nn.Module):
        def __init__(self, cin, s, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, s, 1)
            self.squeeze_activation = nn.ReLU(inplace=True)
            self.expand1x1 = nn.Conv2d(s, e1, 1)
            self.expand1x1_activation = nn.ReLU(inplace=True)
            self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)
            self.expand3x3_activation = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x)),
            ], 1)

    return nn.Sequential(
        nn.Conv2d(3, 64, kernel_size=3, stride=2),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
        Fire(64, 16, 64, 64),
        Fire(128, 16, 64, 64),
        nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
        Fire(128, 32, 128, 128),
        Fire(256, 32, 128, 128),
        nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
        Fire(256, 48, 192, 192),
        Fire(384, 48, 192, 192),
        Fire(384, 64, 256, 256),
        Fire(512, 64, 256, 256),
    ).eval()


@pytest.mark.slow
def test_lpips_squeeze_distance_matches_torch_formula():
    """Full lpips_apply on the squeeze backbone vs the reference formula
    (lpips.py:24-36: z-score, unit-normalize, diff^2, 1x1 lin, spatial mean,
    sum) executed in torch."""
    import torch

    from guidedvd3dgs_tpu.diffusion.convert import convert_state_dict
    from guidedvd3dgs_tpu.metrics.lpips import SCALE, SHIFT

    torch.manual_seed(1)
    net = _torch_squeezenet11_features()
    backbone = convert_state_dict(dict(net.state_dict()))
    chans = [64, 128, 256, 384, 384, 512, 512]
    lins = [torch.rand(1, c, 1, 1) * 0.05 for c in chans]
    m = LPIPSModel(
        net_type="squeeze", backbone=backbone,
        lin={f"{i}.weight": jnp.asarray(w.numpy()) for i, w in enumerate(lins)},
    )

    x = torch.rand(2, 3, 64, 64) * 2 - 1
    y = torch.rand(2, 3, 64, 64) * 2 - 1

    shift = torch.tensor(SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(SCALE).view(1, 3, 1, 1)
    slices = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 11), (11, 12), (12, 13)]

    def taps(t):
        feats, h = [], (t - shift) / scale
        for a, b in slices:
            for i in range(a, b):
                h = net[i](h)
            feats.append(h)
        return feats

    def unit(t):
        return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    with torch.no_grad():
        ref = sum(
            ((unit(fx) - unit(fy)).pow(2) * w).sum(1).mean((1, 2))
            for fx, fy, w in zip(taps(x), taps(y), lins)
        ).numpy()

    ours = np.asarray(lpips_apply(m, jnp.asarray(x.numpy()), jnp.asarray(y.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)
