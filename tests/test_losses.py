"""Image-loss unit tests: window-SSIM vs a torch implementation of the
reference formulas (reference: utils/loss_utils.py:46-82), PSNR conventions,
and a TPU-hardware SSIM sanity test.

The hardware test exists because of a real production failure: the TPU
default conv precision rounds f32 operands to bf16, and SSIM's
E[x^2]-mu^2 variance cancellation then produces negative variances larger
than C2 — per-image "SSIM" values of 14.2 were recorded in results.json
while every CPU test stayed green. ssim() now pins conv precision=HIGHEST.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.utils.losses import psnr, ssim


def _torch_ssim(i1: np.ndarray, i2: np.ndarray, window_size: int = 11) -> float:
    """Reference SSIM (utils/loss_utils.py:46-82) in torch, f64-free f32."""
    import torch
    import torch.nn.functional as F

    sigma = 1.5
    g = np.array(
        [np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    c = i1.shape[1]
    w = torch.from_numpy(np.broadcast_to(w2d[None, None], (c, 1, window_size, window_size)).copy())
    t1, t2 = torch.from_numpy(i1), torch.from_numpy(i2)
    pad = window_size // 2
    mu1 = F.conv2d(t1, w, padding=pad, groups=c)
    mu2 = F.conv2d(t2, w, padding=pad, groups=c)
    s1 = F.conv2d(t1 * t1, w, padding=pad, groups=c) - mu1**2
    s2 = F.conv2d(t2 * t2, w, padding=pad, groups=c) - mu2**2
    s12 = F.conv2d(t1 * t2, w, padding=pad, groups=c) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(3)
    # smooth-ish correlated images (realistic SSIM regime, exercises the
    # variance cancellation), plus a hard-noise pair
    base = rng.random((1, 3, 96, 128)).astype(np.float32)
    i1 = np.clip(base + 0.08 * rng.standard_normal(base.shape).astype(np.float32), 0, 1)
    i2 = np.clip(base + 0.08 * rng.standard_normal(base.shape).astype(np.float32), 0, 1)
    for a, b in [(i1, i2), (base, base), (i1, rng.random(base.shape).astype(np.float32))]:
        ours = float(ssim(jnp.asarray(a[0]), jnp.asarray(b[0])))
        ref = _torch_ssim(a, b)
        assert abs(ours - ref) < 2e-4, (ours, ref)
        assert -1.0 <= ours <= 1.0 + 1e-5


def test_psnr_identity_and_scale():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((3, 32, 32), np.float32))
    b = jnp.clip(a + 0.1, 0, 1)
    p = float(psnr(a, b)[0, 0])
    m = float(((np.asarray(a) - np.asarray(b)) ** 2).mean())
    assert abs(p - (-10 * np.log10(m))) < 1e-3


@pytest.mark.tpu
def test_ssim_bounded_on_tpu_hardware():
    """Compiled SSIM on the real chip must stay in [-1, 1] — catches any
    precision regression in the depthwise conv path."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs a real TPU device")
    rng = np.random.default_rng(7)
    base = rng.random((3, 352, 624)).astype(np.float32)
    i1 = np.clip(base + 0.2 * rng.standard_normal(base.shape).astype(np.float32), 0, 1)
    vals = [
        float(ssim(jnp.asarray(i1), jnp.asarray(base))),
        float(ssim(jnp.asarray(base), jnp.asarray(base))),
    ]
    for v in vals:
        assert -1.0 <= v <= 1.0 + 1e-4, vals
    ref = _torch_ssim(i1[None], base[None])
    assert abs(vals[0] - ref) < 1e-3, (vals[0], ref)
