"""Parity vs the EXECUTED reference math utilities: camera matrix
conventions (graphics_utils), window-SSIM / ssim_noavg (loss_utils), PSNR
(image_utils), and the spiral/ellipse video paths (pose_utils). These are
the load-bearing conventions (transposed GLM layout, simplified projection
matrix with P[3,2]=1, SSIM window construction) — goldens here were
previously hand-derived; this executes the reference modules directly.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load(relpath, name, package_stubs=()):
    for s in package_stubs:
        if s not in sys.modules:
            sys.modules[s] = types.ModuleType(s)
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_graphics():
    return _load("utils/graphics_utils.py", "ref_graphics")


@pytest.fixture(scope="module")
def ref_loss():
    return _load("utils/loss_utils.py", "ref_loss")


@pytest.fixture(scope="module")
def ref_pose():
    # pose_utils does `from utils.stepfun import sample_np`
    sys.path.insert(0, REF)
    return _load("utils/pose_utils.py", "ref_pose")


def test_world2view2_parity(ref_graphics):
    from guidedvd3dgs_tpu.utils.graphics import getWorld2View2

    rng = np.random.default_rng(0)
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    t = rng.normal(size=3)
    translate = np.array([0.1, -0.2, 0.3])
    want = ref_graphics.getWorld2View2(R, t, translate, scale=1.7)
    got = getWorld2View2(R, t, translate, scale=1.7)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_projection_matrix_parity(ref_graphics):
    from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix

    want = ref_graphics.getProjectionMatrix(
        znear=0.01, zfar=100.0, fovX=1.2, fovY=0.9
    ).numpy()
    got = np.asarray(getProjectionMatrix(0.01, 100.0, 1.2, 0.9))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_ssim_parity(ref_loss):
    from guidedvd3dgs_tpu.utils.losses import ssim

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 33, 47)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    want = float(ref_loss.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5, (got, want)


def test_ssim_noavg_parity(ref_loss):
    from guidedvd3dgs_tpu.utils.losses import ssim_noavg

    rng = np.random.default_rng(2)
    a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    b = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    want = ref_loss.ssim_noavg(torch.from_numpy(a), torch.from_numpy(b))
    got = np.asarray(ssim_noavg(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_psnr_parity():
    ref_img = _load("utils/image_utils.py", "ref_image_utils")
    from guidedvd3dgs_tpu.utils.losses import psnr

    rng = np.random.default_rng(3)
    a = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    b = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    want = ref_img.psnr(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b))).reshape(want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # masked variant (reference image_utils.py:20-22)
    mask = (rng.uniform(size=(1, 3, 16, 16)) > 0.5).astype(np.float32)
    want_m = float(ref_img.psnr(torch.from_numpy(a), torch.from_numpy(b),
                                torch.from_numpy(mask)))
    got_m = float(np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask))).squeeze())
    assert abs(got_m - want_m) < 1e-3, (got_m, want_m)


def test_ellipse_path_parity(ref_pose):
    """generate_ellipse_path consumes camera c2ws; the reference version
    takes the camera objects' pose fields — adapt via a tiny namespace."""
    from guidedvd3dgs_tpu.utils.pose_paths import generate_ellipse_path

    rng = np.random.default_rng(4)
    n = 8
    c2ws = np.eye(4, dtype=np.float32)[None].repeat(n, 0)
    # cameras on a ring looking inward (realistic input for the path fit)
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = np.array([2 * np.cos(ang), 0.3 * np.sin(2 * ang), 2 * np.sin(ang)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        c2ws[i, :3, :3] = np.stack([right, upv, fwd], 1)
        c2ws[i, :3, 3] = eye

    class Cam:
        def __init__(self, c2w):
            self.R = c2w[:3, :3]  # reference Camera stores R as c2w rotation
            self.T = (np.linalg.inv(c2w))[:3, 3]

    want = ref_pose.generate_ellipse_path([Cam(c) for c in c2ws], n_frames=40)

    import math

    class View:
        def __init__(self, c2w):
            w2c = np.linalg.inv(c2w)
            self.R = c2w[:3, :3]
            self.T = w2c[:3, 3]
            self.image_width = 64
            self.image_height = 48
            self.FoVx = 1.0
            self.FoVy = 0.8

    got = generate_ellipse_path([View(c) for c in c2ws], n_frames=40)
    assert np.asarray(got).shape == np.asarray(want).shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_spiral_path_parity(ref_pose):
    """generate_spiral_path over a synthetic LLFF poses_bounds array
    (reference pose_utils.py:46-91)."""
    from guidedvd3dgs_tpu.utils.pose_paths import generate_spiral_path

    rng = np.random.default_rng(5)
    n = 6
    rows = []
    for i in range(n):
        ang = 0.3 * (i - n / 2) / n
        c2w = np.eye(4)
        c2w[:3, :3] = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ])
        c2w[:3, 3] = [0.3 * np.sin(ang), 0.05 * i / n, 0.1 * np.cos(ang)]
        hwf = np.array([[48.0], [64.0], [80.0]])
        rows.append(np.concatenate(
            [np.concatenate([c2w[:3, :4], hwf], 1).reshape(-1), [1.0, 10.0]]
        ))
    poses_arr = np.stack(rows).astype(np.float64)

    want = ref_pose.generate_spiral_path(poses_arr.copy(), n_frames=30)
    got = generate_spiral_path(poses_arr.copy(), n_frames=30)
    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_camera_matrix_composition_parity():
    """The full reference Camera pipeline (scene/cameras.py:18-63):
    world_view_transform (transposed GLM layout), projection_matrix,
    full_proj_transform (W2V^T @ P^T), camera_center — executed with
    .cuda() patched to identity (CPU-only torch in this image)."""
    import importlib.util

    sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_cameras", os.path.join(REF, "scene/cameras.py")
        )
        ref_cams = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_cams)

        rng = np.random.default_rng(6)
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        t = rng.normal(size=3)
        img = torch.rand(3, 24, 32)
        cam = ref_cams.Camera(
            colmap_id=0, R=R, T=t, FoVx=1.1, FoVy=0.8, image=img,
            gt_alpha_mask=None, image_name="x", uid=0, fid=0,
            data_device="cpu",
        )
    finally:
        torch.Tensor.cuda = orig_cuda

    from guidedvd3dgs_tpu.scene.cameras import Camera

    ours = Camera(
        colmap_id=0, R=R, T=t, FoVx=1.1, FoVy=0.8,
        image=np.asarray(img), image_name="x", uid=0,
    )
    np.testing.assert_allclose(
        np.asarray(ours.world_view_transform),
        cam.world_view_transform.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.projection_matrix),
        cam.projection_matrix.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours.full_proj_transform),
        cam.full_proj_transform.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours.camera_center),
        cam.camera_center.numpy(), rtol=1e-5, atol=1e-5)


def test_general_utils_parity():
    """LR schedule + rotation builders vs the executed reference
    general_utils (cuda patched to identity; the module-level cv2/matplotlib
    imports exist in this image)."""
    import importlib.util

    sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    orig_zeros = torch.zeros

    def _zeros_cpu(*a, **k):  # reference hardcodes device='cuda' literals
        k.pop("device", None)
        return orig_zeros(*a, **k)

    torch.zeros = _zeros_cpu
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_general", os.path.join(REF, "utils/general_utils.py")
        )
        rg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(rg)

        from guidedvd3dgs_tpu.utils.general import (
            build_rotation,
            build_scaling_rotation,
            get_expon_lr_func,
            inverse_sigmoid,
            strip_symmetric,
        )

        # exponential log-lerp LR schedule incl. delay multiplier
        f_ref = rg.get_expon_lr_func(1.6e-4, 1.6e-6, lr_delay_steps=100,
                                     lr_delay_mult=0.01, max_steps=10_000)
        f_got = get_expon_lr_func(1.6e-4, 1.6e-6, lr_delay_steps=100,
                                  lr_delay_mult=0.01, max_steps=10_000)
        for step in (0, 1, 50, 100, 500, 5000, 10_000, 20_000):
            assert abs(f_got(step) - f_ref(step)) < 1e-12, step

        rng = np.random.default_rng(7)
        q = rng.normal(size=(5, 4)).astype(np.float32)
        s = rng.uniform(0.1, 2.0, size=(5, 3)).astype(np.float32)
        R_ref = rg.build_rotation(torch.from_numpy(q)).numpy()
        np.testing.assert_allclose(np.asarray(build_rotation(jnp.asarray(q))),
                                   R_ref, rtol=1e-5, atol=1e-6)
        L_ref = rg.build_scaling_rotation(torch.from_numpy(s), torch.from_numpy(q)).numpy()
        np.testing.assert_allclose(
            np.asarray(build_scaling_rotation(jnp.asarray(s), jnp.asarray(q))),
            L_ref, rtol=1e-5, atol=1e-6)

        sym = torch.from_numpy(rng.normal(size=(5, 3, 3)).astype(np.float32))
        sym = sym + sym.transpose(1, 2)
        np.testing.assert_allclose(
            np.asarray(strip_symmetric(jnp.asarray(sym.numpy()))),
            rg.strip_symmetric(sym).numpy(), rtol=1e-6, atol=1e-7)

        x = rng.uniform(0.01, 0.99, size=(7,)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(inverse_sigmoid(jnp.asarray(x))),
            rg.inverse_sigmoid(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6)
    finally:
        torch.Tensor.cuda = orig_cuda
        torch.zeros = orig_zeros
