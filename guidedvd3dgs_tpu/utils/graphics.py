"""Camera / projection math (L0).

Numerical conventions follow the reference implementation exactly
(reference: utils/graphics_utils.py:38-81) — the transposed, GLM row-major
world-to-view layout is load-bearing for the rasterizer, and the projection
matrix is the simplified pinhole form (P[2,2]=1, P[3,2]=1; no near/far
scaling) that the reference uses.

These are host-side (numpy) helpers: cameras are built once per scene and
their matrices fed to jitted code as arrays.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np


class BasicPointCloud(NamedTuple):
    points: np.ndarray  # (N, 3)
    colors: np.ndarray  # (N, 3) in [0, 1]
    normals: np.ndarray  # (N, 3)


def getWorld2View(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """World-to-view 4x4 from COLMAP-style (R, t).

    `R` is stored world-from-camera (COLMAP qvec-derived, transposed on read),
    `t` is the camera-from-world translation — matching the reference's
    storage convention (reference: utils/graphics_utils.py:31-36).
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return np.float32(Rt)


def getWorld2View2(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.array([0.0, 0.0, 0.0]),
    scale: float = 1.0,
) -> np.ndarray:
    """World-to-view with optional recentring of the camera position
    (reference: utils/graphics_utils.py:38-49)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0

    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def getProjectionMatrix(znear: float, zfar: float, fovX: float, fovY: float) -> np.ndarray:
    """Simplified pinhole projection used by the reference rasterizer.

    Deliberately NOT a standard OpenGL projection: rows 2/3 are both the
    z-passthrough (P[2,2]=1, P[3,2]=1) so that after the w-divide the
    projected z equals 1 and only x/y carry information; depth is taken from
    the view transform instead (reference: utils/graphics_utils.py:51-75;
    znear/zfar intentionally unused there too).
    """
    del znear, zfar
    tanHalfFovY = math.tan(fovY / 2)
    tanHalfFovX = math.tan(fovX / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tanHalfFovX
    P[1, 1] = 1.0 / tanHalfFovY
    P[2, 2] = 1.0
    P[3, 2] = 1.0
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def geom_transform_points(points: np.ndarray, transf_matrix: np.ndarray) -> np.ndarray:
    """Apply a 4x4 (stored transposed, i.e. row-vector convention) to points
    with homogeneous divide (reference: utils/graphics_utils.py:22-29)."""
    ones = np.ones((points.shape[0], 1), dtype=points.dtype)
    points_hom = np.concatenate([points, ones], axis=1)
    points_out = points_hom @ transf_matrix
    denom = points_out[..., 3:] + 1e-7
    return points_out[..., :3] / denom
