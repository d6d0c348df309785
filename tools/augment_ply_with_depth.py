#!/usr/bin/env python
"""Offline ply augmentation from inpainted depth (role of reference
utils/inpainted_depth_to_pointcloud.py:119-185 __main__).

The reference tool unprojects externally-inpainted (rgb, depth, mask)
triplets at every-6th camera into world points and appends them to the
DUSt3R points3D.ply. Its camera source is a personal cam_poses.pt; here the
cameras come from the scene's COLMAP model (sparse/0), so the tool works on
any converted dataset:

    python tools/augment_ply_with_depth.py \
        --ply  <in>/sparse/0/points3D.ply \
        --sparse <in>/sparse/0 \
        --rgb_dir ... --depth_dir ... --mask_dir ... \
        --out <out>/sparse/0/points3D.ply

File lookup per COLMAP image name stem S: rgb `{rgb_dir}/{S}.png`,
depth `{depth_dir}/{S}.npy`, mask `{mask_dir}/{S}.png` (white = lift).
Images without all three files are skipped. --every/--stride mirror the
reference's every-6th-camera and ::10 point subsampling.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guidedvd3dgs_tpu.guidance.depth_lift import depth_to_point_cloud
from guidedvd3dgs_tpu.scene import colmap as C
from guidedvd3dgs_tpu.scene.ply import fetch_ply, store_ply


def _intrinsic_of(cam: C.ColmapCamera) -> np.ndarray:
    p = np.asarray(cam.params, np.float64)
    if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
        f, cx, cy = p[0], p[1], p[2]
        fx = fy = f
    else:  # PINHOLE / OPENCV-style leading params
        fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def load_colmap(sparse_dir: str):
    for read_c, read_i, ext in (
        (C.read_cameras_binary, C.read_images_binary, ".bin"),
        (C.read_cameras_text, C.read_images_text, ".txt"),
    ):
        cpath = os.path.join(sparse_dir, "cameras" + ext)
        ipath = os.path.join(sparse_dir, "images" + ext)
        if os.path.exists(cpath) and os.path.exists(ipath):
            return read_c(cpath), read_i(ipath)
    raise FileNotFoundError(f"no cameras/images .bin or .txt in {sparse_dir}")


def augment(ply_path, sparse_dir, rgb_dir, depth_dir, mask_dir, out_path,
            every=1, stride=10):
    from PIL import Image

    cams, images = load_colmap(sparse_dir)
    base = fetch_ply(ply_path)

    pts_all, cols_all = [], []
    ordered = sorted(images.values(), key=lambda im: im.name)[::every]
    used = 0
    for im in ordered:
        stem = os.path.splitext(os.path.basename(im.name))[0]
        rgb_f = os.path.join(rgb_dir, stem + ".png")
        dep_f = os.path.join(depth_dir, stem + ".npy")
        msk_f = os.path.join(mask_dir, stem + ".png")
        if not (os.path.exists(rgb_f) and os.path.exists(dep_f)
                and os.path.exists(msk_f)):
            continue
        R = C.qvec2rotmat(im.qvec)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = im.tvec
        c2w = np.linalg.inv(w2c)
        K = _intrinsic_of(cams[im.camera_id])
        depth = np.load(dep_f)
        mask = (np.asarray(Image.open(msk_f).convert("L")) / 255.0 > 0.5)
        rgb = np.asarray(Image.open(rgb_f).convert("RGB")) / 255.0
        pts, cols = depth_to_point_cloud(
            depth, K, c2w, mask.astype(np.float64), rgb
        )
        pts_all.append(pts[::stride])
        cols_all.append(cols[::stride])
        used += 1
        print(f"  {im.name}: +{pts[::stride].shape[0]} points")

    if not pts_all:
        raise RuntimeError("no (rgb, depth, mask) triplets matched any camera")
    add_pts = np.concatenate(pts_all, 0)
    add_cols = np.concatenate(cols_all, 0)
    all_pts = np.concatenate([np.asarray(base.points), add_pts], 0)
    all_cols = np.concatenate(
        [np.asarray(base.colors), add_cols], 0
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    store_ply(out_path, all_pts, (all_cols * 255).astype(np.uint8))
    print(f"{used} views lifted; {base.points.shape[0]} -> {all_pts.shape[0]} "
          f"points -> {out_path}")
    return all_pts.shape[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--sparse", required=True, help="COLMAP sparse/0 dir")
    ap.add_argument("--rgb_dir", required=True)
    ap.add_argument("--depth_dir", required=True)
    ap.add_argument("--mask_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--every", type=int, default=1,
                    help="take every N-th camera (reference used 6)")
    ap.add_argument("--stride", type=int, default=10,
                    help="keep every N-th lifted point (reference ::10)")
    args = ap.parse_args()
    augment(args.ply, args.sparse, args.rgb_dir, args.depth_dir,
            args.mask_dir, args.out, args.every, args.stride)


if __name__ == "__main__":
    main()
