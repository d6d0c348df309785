"""Trajectory pose math for the guidance subsystem (host-side numpy).

Equivalents of the reference pose utilities
(reference: third_party/ViewCrafter/utils_vc/pvd_utils.py:89-118 sphere2pose,
:468-545 world_point_to_kth_my / world_point_to_obj_my, :547-557
txt_interpolation; utils/viewcrafter_wrapper.py:368-424 get_candidate_poses,
:426-467 interpolate_trajectory[_loopclosure]). These run once per diffusion
event on the host — numpy, float64 for pose stability.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.interpolate import UnivariateSpline, interp1d


def sphere2pose(
    c2ws: np.ndarray, theta_deg: float, phi_deg: float, r: float,
    x: Optional[float] = None, y: Optional[float] = None,
) -> np.ndarray:
    """Translate along +z by r then rotate theta about x and phi about y
    (reference pvd_utils.py:89-118)."""
    c2ws = np.array(c2ws, copy=True)
    c2ws[:, 2, 3] += r
    if x is not None:
        c2ws[:, 1, 3] += y
    if y is not None:
        c2ws[:, 0, 3] += x

    th = np.deg2rad(theta_deg)
    rot_x = np.array(
        [[1, 0, 0, 0],
         [0, np.cos(th), -np.sin(th), 0],
         [0, np.sin(th), np.cos(th), 0],
         [0, 0, 0, 1]], c2ws.dtype,
    )
    ph = np.deg2rad(phi_deg)
    rot_y = np.array(
        [[np.cos(ph), 0, np.sin(ph), 0],
         [0, 1, 0, 0],
         [-np.sin(ph), 0, np.cos(ph), 0],
         [0, 0, 0, 1]], c2ws.dtype,
    )
    return rot_y @ (rot_x @ c2ws)


def world_to_kth(
    poses: np.ndarray, points: Optional[np.ndarray], k: int
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, np.ndarray]:
    """Recenter the world frame onto pose k (reference pvd_utils.py:468-480).
    points: (N, W, H, 3) or None. Returns (poses, points, kth, kth_inv)."""
    kth = poses[k]
    kth_inv = np.linalg.inv(kth)
    new_poses = kth_inv[None] @ poses
    new_points = None
    if points is not None:
        pts = points.reshape(points.shape[0], -1, 3)
        homog = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
        new_points = (homog @ kth_inv.T)[..., :3].reshape(points.shape)
    return new_poses, new_points, kth, kth_inv


def world_to_obj(
    poses: np.ndarray, points: Optional[np.ndarray], k: int, r: float,
    elevation_deg: float,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Recenter onto view k, then onto an object frame at [0,0,r] with
    elevation tilt; returns transform_back (reference pvd_utils.py:511-545)."""
    poses, points, kth, _ = world_to_kth(poses, points, k)
    el = np.deg2rad(180.0 - elevation_deg)
    R = np.array(
        [[1, 0, 0],
         [0, np.cos(el), np.sin(el)],
         [0, -np.sin(el), np.cos(el)]], poses.dtype,
    )
    pose_obj = np.eye(4, dtype=poses.dtype)
    pose_obj[:3, :3] = R
    pose_obj[:3, 3] = [0, 0, r]
    inv_obj = np.linalg.inv(pose_obj)
    new_poses = inv_obj[None] @ poses
    new_points = None
    if points is not None:
        pts = points.reshape(points.shape[0], -1, 3)
        homog = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
        new_points = (homog @ inv_obj.T)[..., :3].reshape(points.shape)
    transform_back = kth @ pose_obj
    return new_poses, new_points, transform_back


def txt_interpolation(values: Sequence[float], n: int, mode: str = "smooth") -> np.ndarray:
    """reference pvd_utils.py:547-557."""
    x = np.linspace(0, 1, len(values))
    if mode == "smooth":
        f = UnivariateSpline(x, values, k=3)
    elif mode == "linear":
        f = interp1d(x, values)
    else:
        raise KeyError(f"Invalid txt interpolation mode: {mode}")
    return f(np.linspace(0, 1, n))


def candidate_pose_grid(
    c2w_obj: np.ndarray,  # (1, 4, 4) pose in the object frame
    transform_back: np.ndarray,  # (4, 4)
    d_phi: Sequence[float],
    d_theta: Sequence[float],
) -> Tuple[np.ndarray, List[Tuple[float, float, float]]]:
    """(phi, theta) grid of candidate poses, world frame
    (reference viewcrafter_wrapper.py:404-424)."""
    cands, offsets = [], []
    for ph in d_phi:
        for th in d_theta:
            cands.append(sphere2pose(c2w_obj, float(th), float(ph), 0.0))
            offsets.append((float(ph), float(th), 0.0))
    c2ws = np.concatenate(cands, 0)
    return transform_back[None] @ c2ws, offsets


def interpolate_trajectory(
    c2w_obj: np.ndarray, d_phi: float, d_theta: float, d_r: float, frames: int = 25
) -> np.ndarray:
    """Linear 25-pose path to the offset, object frame
    (reference viewcrafter_wrapper.py:426-440)."""
    thetas = np.linspace(0, d_theta, frames)
    phis = np.linspace(0, d_phi, frames)
    rs = np.linspace(0, d_r * c2w_obj[0, 2, 3], frames)
    return np.concatenate(
        [sphere2pose(c2w_obj, float(t), float(p), float(r)) for t, p, r in zip(thetas, phis, rs)],
        0,
    )


def interpolate_trajectory_loopclosure(
    c2w_obj: np.ndarray, d_phi: float, d_theta: float, d_r: float, frames: int = 25
) -> np.ndarray:
    """Spline out-and-back path (reference viewcrafter_wrapper.py:442-467)."""
    d_r = d_r * c2w_obj[0, 2, 3]
    ths = txt_interpolation([0, d_theta / 2.0, d_theta, 0], frames, "smooth")
    phs = txt_interpolation([0, d_phi / 2.0, d_phi, 0], frames, "smooth")
    rs = txt_interpolation([0, d_r / 2.0, d_r, 0], frames, "smooth")
    ths[0] = phs[0] = rs[0] = 0.0
    ths[-1] = phs[-1] = rs[-1] = 0.0
    return np.concatenate(
        [sphere2pose(c2w_obj, float(t), float(p), float(r)) for t, p, r in zip(ths, phs, rs)],
        0,
    )


# preset trajectory control points (phi / theta / r lines, DATA fixtures from
# the reference release: third_party/ViewCrafter/test/trajs/*.txt)
TRAJ_PRESETS = {
    "loop1": ([0, -3, -15, -20, -17, -5, 0], [0, -2, -5, -10, -8, -5, 0, 2, 5, 3, 0], [0, 0]),
    "loop2": ([0, 3, 10, 20, 17, 10, 0], [0, -2, -8, -6, 0, 2, 5, 3, 0],
              [0, -0.02, -0.09, -0.16, -0.09, 0]),
    "wave1": ([0, 30], [0, -1, -2, -1, 0, 3, 0, -3, 0, 1, 2], [0, 0]),
    "left": ([0, -40], [0, 0], [0.0, -0.2]),
    "zoomin1": ([0, 0], [0, 0], [0.0, -0.3]),
}


def traj_from_txt(
    c2w_obj: np.ndarray, phis: Sequence[float], thetas: Sequence[float],
    rs: Sequence[float], frames: int = 25,
) -> np.ndarray:
    """Preset txt trajectory (3 lines: phi/theta/r lists; e.g. loop2.txt),
    splined to `frames` poses with pinned endpoints (reference
    pvd_utils.py:235-285 generate_traj_txt_my)."""

    def interp(vals):
        if len(vals) > 3:
            out = txt_interpolation(vals, frames, "smooth")
            out[0], out[-1] = vals[0], vals[-1]
        else:
            out = txt_interpolation(vals, frames, "linear")
        return out

    phs, ths, rr = interp(list(phis)), interp(list(thetas)), interp(list(rs))
    rr = rr * c2w_obj[0, 2, 3]
    return np.concatenate(
        [sphere2pose(c2w_obj, float(t), float(p), float(r)) for t, p, r in zip(ths, phs, rr)],
        0,
    )
