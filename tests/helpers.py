"""Shared test fixtures: synthetic Gaussian scenes and cameras."""

from __future__ import annotations

import numpy as np

from guidedvd3dgs_tpu.scene.cameras import Camera


def make_camera(height=64, width=64, fov=1.0, cam_z=-4.0, look_noise=0.0, seed=0):
    """Camera at (0,0,cam_z) looking down +z toward the origin (identity R)."""
    rng = np.random.default_rng(seed)
    R = np.eye(3)
    T = np.array([0.0, 0.0, -cam_z], dtype=np.float64)
    if look_noise:
        T = T + rng.normal(scale=look_noise, size=3)
    img = np.zeros((3, height, width), dtype=np.float32)
    return Camera(colmap_id=0, R=R, T=T, FoVx=fov, FoVy=fov, image=img)


def random_gaussians(n=500, seed=0, spread=1.5, scale_lo=-4.5, scale_hi=-2.5):
    """Random raw (pre-activation) Gaussian parameters around the origin."""
    rng = np.random.default_rng(seed)
    xyz = rng.normal(scale=spread, size=(n, 3)).astype(np.float32)
    log_scales = rng.uniform(scale_lo, scale_hi, size=(n, 3)).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    opac_logit = rng.uniform(-2.0, 2.0, size=(n, 1)).astype(np.float32)
    sh = np.zeros((n, 16, 3), dtype=np.float32)
    sh[:, 0] = rng.uniform(-1.5, 1.5, size=(n, 3))
    sh[:, 1:] = rng.normal(scale=0.05, size=(n, 15, 3))
    return xyz, log_scales, rots, opac_logit, sh


def activated(xyz, log_scales, rots, opac_logit, sh):
    scales = np.exp(log_scales)
    rotations = rots / np.linalg.norm(rots, axis=-1, keepdims=True)
    opacities = 1.0 / (1.0 + np.exp(-opac_logit))
    return xyz, scales, rotations, opacities, sh
