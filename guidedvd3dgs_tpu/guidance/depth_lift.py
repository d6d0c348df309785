"""Monocular-depth lifting of generated frames to 3D points.

Equivalents of the reference MiDaS alignment + unprojection pipeline used
when append_pcd_from_video_diffusion is on
(reference: utils/midas_depth_estimator.py:46-120 get_scaleshift /
convert_rel_to_real, utils/inpainted_depth_to_pointcloud.py:13-55
depth_to_point_cloud, consumed in train_guidedvd.py:569-612).

The relative-depth ESTIMATOR itself (torch.hub DPT_Hybrid in the reference)
is pluggable: any callable (frames in [-1,1]) -> (N, H, W) relative depth.
The alignment and unprojection math below is the part that defines behavior.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def fit_scale_shift(
    rel_depth: np.ndarray,  # (N, H, W) relative (MiDaS-style inverse) depth
    real_depth: np.ndarray,  # (N, H, W) rendered 3DGS depth
    mask: np.ndarray,  # (N, H, W) in {0,1}: where real_depth is trustworthy
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame least-squares aligning rel depth to 1/real_depth
    (reference midas_depth_estimator.py:46-112, lstsq_strategy='each')."""
    n = rel_depth.shape[0]
    rel = rel_depth.reshape(n, -1)
    real = real_depth.reshape(n, -1)
    m = mask.reshape(n, -1).astype(bool)

    scales, shifts = [], []
    for i in range(n):
        x = rel[i][m[i]]
        y = 1.0 / real[i][m[i]]
        A = np.vstack([x, 1 - x]).T
        s, t = np.linalg.lstsq(A, y, rcond=None)[0]
        min_depth = 1 / s
        max_depth = 1 / t
        scales.append((1 / min_depth) - (1 / max_depth))
        shifts.append(1 / max_depth)
    return np.asarray(scales), np.asarray(shifts)


def rel_to_metric(rel_depth: np.ndarray, scale: np.ndarray, shift: np.ndarray) -> np.ndarray:
    """reference midas_depth_estimator.py:115-120."""
    return 1.0 / (scale[:, None, None] * rel_depth + shift[:, None, None])


def depth_to_point_cloud(
    depth_map: np.ndarray,  # (H, W)
    intrinsic: np.ndarray,  # (3, 3)
    c2w: np.ndarray,  # (4, 4)
    mask: np.ndarray,  # (H, W) in {0,1}: pixels to lift
    rgb_map: np.ndarray,  # (H, W, 3)
) -> Tuple[np.ndarray, np.ndarray]:
    """Unproject masked pixels to world points
    (reference inpainted_depth_to_pointcloud.py:13-55)."""
    h, w = depth_map.shape
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    sel = mask.flatten() == 1
    u = u.flatten()[sel]
    v = v.flatten()[sel]
    depth = depth_map.flatten()[sel]
    rgb = rgb_map.reshape(-1, 3)[sel]

    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    pts_cam = np.vstack([x, y, depth, np.ones_like(depth)])
    pts_world = (c2w @ pts_cam)[:3].T
    return pts_world, rgb


def lift_video_to_points(
    frames: np.ndarray,  # (N, H, W, 3) in [0, 1]
    rel_depth: np.ndarray,  # (N, H, W)
    gs_depth: np.ndarray,  # (N, H, W) rendered 3DGS depth
    observed_mask: np.ndarray,  # (N, H, W) 1 = observed by the baseline
    traj_c2ws: np.ndarray,  # (N, 4, 4)
    intrinsic: np.ndarray,
    frame_gap: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full append path (reference train_guidedvd.py:569-612): align depth on
    observed pixels, unproject the UNOBSERVED pixels (1-mask is where the
    diffusion inpainted), subsample every `frame_gap`-th point, drop
    NaN/Inf."""
    scale, shift = fit_scale_shift(rel_depth, gs_depth, observed_mask)
    metric = rel_to_metric(rel_depth, scale, shift)
    pts, rgbs = [], []
    for i in range(frames.shape[0]):
        p, c = depth_to_point_cloud(
            metric[i], intrinsic, traj_c2ws[i], 1.0 - observed_mask[i], frames[i]
        )
        pts.append(p[::frame_gap])
        rgbs.append(c[::frame_gap])
    pts = np.concatenate(pts, 0).astype(np.float32)
    rgbs = np.concatenate(rgbs, 0).astype(np.float32)
    ok = np.isfinite(pts).all(1) & np.isfinite(rgbs).all(1)
    return pts[ok], rgbs[ok]
