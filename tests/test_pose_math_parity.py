"""Trajectory pose math parity vs the EXECUTED reference pvd_utils.

sphere2pose / world_point_to_kth_my / world_point_to_obj_my /
txt_interpolation (reference utils_vc/pvd_utils.py:89-118, 468-545, 547-557)
drive the trajectory pool, candidate grids, and pseudo-camera poses — a sign
flip here silently degrades every guided run. pvd_utils imports pytorch3d /
trimesh / dust3r at module level; those are stubbed (none of the functions
under test touch them) and the module loaded from the reference tree.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from guidedvd3dgs_tpu.guidance import pose_math as pm  # noqa: E402

PVD = "/root/reference/third_party/ViewCrafter/utils_vc/pvd_utils.py"


def _stub(name, **attrs):
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m


@pytest.fixture(scope="module")
def ref():
    class _Any:  # placeholder for pytorch3d renderer symbols
        def __init__(self, *a, **k):
            pass

    _stub("trimesh")
    _stub("torchvision", utils=None, transforms=None)
    _stub("torchvision.utils", save_image=_Any)
    _stub(
        "torchvision.transforms",
        ToPILImage=_Any, CenterCrop=_Any, Compose=_Any, Resize=_Any,
        Normalize=_Any, ToTensor=_Any,
    )
    _stub("pytorch3d")
    _stub(
        "pytorch3d.renderer",
        PointsRasterizationSettings=_Any, PointsRenderer=_Any,
        PointsRasterizer=_Any, AlphaCompositor=_Any, PerspectiveCameras=_Any,
    )
    _stub("dust3r")
    _stub("dust3r.utils")
    _stub("dust3r.utils.device", to_numpy=lambda x: np.asarray(x))
    try:
        from PIL import ImageGrab  # noqa: F401
    except Exception:
        _stub("PIL.ImageGrab")

    spec = importlib.util.spec_from_file_location("ref_pvd_utils", PVD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sphere2pose_parity(ref):
    rng = np.random.default_rng(0)
    c2ws = np.eye(4, dtype=np.float32)[None].repeat(3, 0)
    c2ws[:, :3, 3] = rng.normal(size=(3, 3)).astype(np.float32)
    c2ws[:, :3, :3] = np.linalg.qr(rng.normal(size=(3, 3, 3)))[0].astype(np.float32)

    for theta, phi, r, x, y in [
        (12.5, -20.0, 0.7, None, None),
        (-30.0, 15.0, 1.3, 0.2, -0.1),
        (0.0, 0.0, 0.0, None, None),
    ]:
        want = ref.sphere2pose(
            torch.from_numpy(c2ws), theta, phi, r, torch.device("cpu"), x=x, y=y
        ).numpy()
        got = pm.sphere2pose(c2ws, theta, phi, r, x=x, y=y)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _random_poses_points(rng, n=4, w=6, h=5):
    poses = np.eye(4, dtype=np.float32)[None].repeat(n, 0)
    poses[:, :3, :3] = np.linalg.qr(rng.normal(size=(n, 3, 3)))[0].astype(np.float32)
    poses[:, :3, 3] = rng.normal(size=(n, 3)).astype(np.float32)
    points = rng.normal(size=(n, w, h, 3)).astype(np.float32)
    return poses, points


def test_world_point_to_kth_parity(ref):
    rng = np.random.default_rng(1)
    poses, points = _random_poses_points(rng)
    for k in (0, 2, -1):
        wp, wpts, wkth, wkinv = ref.world_point_to_kth_my(
            torch.from_numpy(poses), torch.from_numpy(points), k, torch.device("cpu")
        )
        gp, gpts, gkth, gkinv = pm.world_to_kth(poses, points, k)
        np.testing.assert_allclose(gp, wp.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gpts, wpts.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gkth, wkth.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gkinv, wkinv.numpy(), rtol=1e-4, atol=1e-5)


def test_world_point_to_obj_parity(ref):
    rng = np.random.default_rng(2)
    poses, points = _random_poses_points(rng)
    for k, r, elevation in [(1, 1.3, 5.0), (-1, 0.6, 30.0)]:
        wp, wpts, wback = ref.world_point_to_obj_my(
            torch.from_numpy(poses), torch.from_numpy(points), k, r, elevation,
            torch.device("cpu"),
        )
        gp, gpts, gback = pm.world_to_obj(poses, points, k, r, elevation)
        np.testing.assert_allclose(gp, wp.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gpts, wpts.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gback, wback.numpy(), rtol=1e-4, atol=1e-5)


def test_txt_interpolation_parity(ref):
    vals = [0.0, 10.0, 20.0, 5.0, 0.0]
    for mode in ("smooth", "linear"):
        want = ref.txt_interpolation(vals, 25, mode=mode)
        got = pm.txt_interpolation(vals, 25, mode=mode)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
