"""CameraInfo -> Camera loading with the reference resolution policy (L3).

Role of reference utils/camera_utils.py: images wider than 1600px are
downscaled (when resolution == -1); -r in {1,2,4,8} divides directly.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from guidedvd3dgs_tpu.scene.cameras import Camera
from guidedvd3dgs_tpu.scene.dataset_readers import CameraInfo
from guidedvd3dgs_tpu.utils.graphics import fov2focal

_WARNED = [False]


def pil_to_chw(image, resolution) -> np.ndarray:
    """Resize and convert to (C, H, W) float32 in [0,1]
    (role of reference utils/general_utils.py PILtoTorch)."""
    resized = image.resize(resolution)
    arr = np.asarray(resized, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr.transpose(2, 0, 1)


def compute_resolution(orig_w: int, orig_h: int, args_resolution: int, resolution_scale: float):
    if args_resolution in (1, 2, 4, 8):
        return (
            round(orig_w / (resolution_scale * args_resolution)),
            round(orig_h / (resolution_scale * args_resolution)),
        )
    if args_resolution == -1:
        if orig_w > 1600:
            if not _WARNED[0]:
                print(
                    "[ INFO ] Large input images (>1.6K width) rescaled to 1.6K; "
                    "pass --resolution 1 to disable."
                )
                _WARNED[0] = True
            global_down = orig_w / 1600
        else:
            global_down = 1
    else:
        global_down = orig_w / args_resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_cam(args, uid: int, info: CameraInfo, resolution_scale: float) -> Camera:
    from PIL import Image

    image = Image.open(info.image_path)
    resolution = compute_resolution(image.size[0], image.size[1], args.resolution, resolution_scale)
    rgb = pil_to_chw(image, resolution)
    gt_alpha = None
    if rgb.shape[0] == 4:
        gt_alpha = rgb[3:4]
        rgb = rgb[:3]

    projected_image = projected_mask = None
    if info.projected_image_path and os.path.exists(info.projected_image_path):
        projected_image = pil_to_chw(Image.open(info.projected_image_path), resolution)[:3]
    if info.projected_mask_path and os.path.exists(info.projected_mask_path):
        m = np.load(info.projected_mask_path).astype(np.float32)
        # nearest resize
        ys = (np.arange(resolution[1]) * m.shape[0] / resolution[1]).astype(int)
        xs = (np.arange(resolution[0]) * m.shape[1] / resolution[0]).astype(int)
        projected_mask = m[np.ix_(ys, xs)]

    return Camera(
        colmap_id=info.uid,
        R=info.R,
        T=info.T,
        FoVx=info.FovX,
        FoVy=info.FovY,
        image=rgb,
        gt_alpha_mask=gt_alpha,
        image_name=info.image_name,
        uid=uid,
        projected_image=projected_image,
        projected_mask=projected_mask,
    )


def camera_list_from_infos(cam_infos: List[CameraInfo], resolution_scale: float, args):
    return [load_cam(args, i, c, resolution_scale) for i, c in enumerate(cam_infos)]


def camera_to_json(uid: int, camera) -> dict:
    """Serialize camera for cameras.json (role of reference
    utils/camera_utils.py:62-82)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = camera.R.transpose()
    Rt[:3, 3] = camera.T
    Rt[3, 3] = 1.0
    w2c = np.linalg.inv(Rt)
    pos = w2c[:3, 3]
    rot = w2c[:3, :3]
    return {
        "id": uid,
        "img_name": camera.image_name,
        "width": camera.image_width,
        "height": camera.image_height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": fov2focal(camera.FoVy, camera.image_height),
        "fx": fov2focal(camera.FoVx, camera.image_width),
    }
