"""Camera containers (L3).

Host-side camera objects mirroring the reference `Camera` / `PseudoCamera` /
`MiniCam` (reference: scene/cameras.py:18-108), including the transposed
matrix layout (`world_view_transform = getWorld2View2(R, T).T`) that the
rasterizer depends on. Images are numpy (3, H, W) float32 in [0, 1]; jitted
code receives a `RasterCamera` via `.raster_camera()`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix, getWorld2View2


def _build_matrices(R, T, fovx, fovy, trans, scale):
    world_view = getWorld2View2(R, T, trans, scale).T.astype(np.float32)
    projection = getProjectionMatrix(0.01, 100.0, fovx, fovy).T.astype(np.float32)
    full_proj = (world_view @ projection).astype(np.float32)
    camera_center = np.linalg.inv(world_view)[3, :3].astype(np.float32)
    return world_view, projection, full_proj, camera_center


@dataclasses.dataclass
class Camera:
    """Training/eval camera with ground-truth image
    (reference: scene/cameras.py:18-63)."""

    colmap_id: int
    R: np.ndarray  # (3,3) world-from-camera rotation (COLMAP transposed)
    T: np.ndarray  # (3,) world-to-camera translation
    FoVx: float
    FoVy: float
    image: np.ndarray  # (3, H, W) float32 [0,1]
    image_name: str = ""
    uid: int = 0
    gt_alpha_mask: Optional[np.ndarray] = None
    trans: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    znear: float = 0.01
    zfar: float = 100.0
    # optional project-cam payload (reference: train_replica_baseline_with_project_cam.py)
    projected_image: Optional[np.ndarray] = None
    projected_mask: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.gt_alpha_mask is not None:
            self.image = self.image * self.gt_alpha_mask
        (
            self.world_view_transform,
            self.projection_matrix,
            self.full_proj_transform,
            self.camera_center,
        ) = _build_matrices(self.R, self.T, self.FoVx, self.FoVy, self.trans, self.scale)

    @property
    def image_height(self) -> int:
        return self.image.shape[1]

    @property
    def image_width(self) -> int:
        return self.image.shape[2]

    def raster_camera(self) -> RasterCamera:
        import math

        return RasterCamera(
            viewmatrix=self.world_view_transform,
            projmatrix=self.full_proj_transform,
            campos=self.camera_center,
            tanfovx=math.tan(self.FoVx * 0.5),
            tanfovy=math.tan(self.FoVy * 0.5),
            height=self.image_height,
            width=self.image_width,
        )


@dataclasses.dataclass
class PseudoCamera:
    """Camera with pseudo ground truth from the diffusion model
    (reference: scene/cameras.py:67-93)."""

    R: np.ndarray
    T: np.ndarray
    FoVx: float
    FoVy: float
    width: int
    height: int
    pseudo_gt: Optional[np.ndarray] = None  # (3, H, W)
    mask: Optional[np.ndarray] = None  # (1, H, W)
    depth: Optional[np.ndarray] = None  # (H, W)
    # slot of this camera's pseudo_gt in the trainer's device-resident
    # pseudo-frame pool (chunked guided trainer); -1 = not pooled
    pool_slot: int = -1
    trans: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def __post_init__(self):
        (
            self.world_view_transform,
            self.projection_matrix,
            self.full_proj_transform,
            self.camera_center,
        ) = _build_matrices(self.R, self.T, self.FoVx, self.FoVy, self.trans, self.scale)

    @property
    def image_height(self) -> int:
        return self.height

    @property
    def image_width(self) -> int:
        return self.width

    def raster_camera(self) -> RasterCamera:
        import math

        return RasterCamera(
            viewmatrix=self.world_view_transform,
            projmatrix=self.full_proj_transform,
            campos=self.camera_center,
            tanfovx=math.tan(self.FoVx * 0.5),
            tanfovy=math.tan(self.FoVy * 0.5),
            height=self.height,
            width=self.width,
        )


@dataclasses.dataclass
class MiniCam:
    """Lightweight camera for the network GUI (reference: scene/cameras.py:97-108)."""

    width: int
    height: int
    fovy: float
    fovx: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray
    full_proj_transform: np.ndarray

    def __post_init__(self):
        self.camera_center = np.linalg.inv(self.world_view_transform)[3, :3]

    def raster_camera(self) -> RasterCamera:
        import math

        return RasterCamera(
            viewmatrix=self.world_view_transform,
            projmatrix=self.full_proj_transform,
            campos=self.camera_center,
            tanfovx=math.tan(self.fovx * 0.5),
            tanfovy=math.tan(self.fovy * 0.5),
            height=self.height,
            width=self.width,
        )


def camera_from_w2c_K(w2c: np.ndarray, K: np.ndarray, height: int, width: int) -> PseudoCamera:
    """Build a PseudoCamera from an OpenCV-style w2c and intrinsics — the
    EasyRenderer entry convention (reference: utils/easy_renderer.py:59-70)."""
    import math

    fovx = 2 * math.atan(width / (2 * K[0, 0]))
    fovy = 2 * math.atan(height / (2 * K[1, 1]))
    R = w2c[:3, :3].T  # stored transposed, as COLMAP readers do
    T = w2c[:3, 3]
    return PseudoCamera(R=R, T=T, FoVx=fovx, FoVy=fovy, width=width, height=height)
