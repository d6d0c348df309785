#!/usr/bin/env python
"""Project a scene point cloud to every k-th camera -> projected_dir/.

Role of the reference tools/get_replica_dust3r_project_2d.py:1-62: reads the
DUSt3R points3D.ply and the COLMAP cameras, projects the cloud to every 6th
view, writes <projected_dir>/{i}.png and {i}_mask.png consumed by the
project-cam trainer (scene.getProjectCameras()).

    python tools/project_pcd_to_views.py --source <scene_path> \
        --ply <points3D.ply> [--every 6] [--out projected_dir]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guidedvd3dgs_tpu.scene import colmap as C
from guidedvd3dgs_tpu.scene.pcd2img import project_point_cloud_to_image
from guidedvd3dgs_tpu.scene.ply import fetch_ply


def main():
    from guidedvd3dgs_tpu.utils.video import save_image

    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True)
    p.add_argument("--ply", required=True)
    p.add_argument("--every", type=int, default=6)
    p.add_argument("--out", default="projected_dir")
    a = p.parse_args()

    sparse = os.path.join(a.source, "sparse/0")
    if os.path.exists(os.path.join(sparse, "images.bin")):
        images = C.read_images_binary(os.path.join(sparse, "images.bin"))
        cams = C.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    else:
        images = C.read_images_text(os.path.join(sparse, "images.txt"))
        cams = C.read_cameras_text(os.path.join(sparse, "cameras.txt"))

    pcd = fetch_ply(a.ply)
    pts, cols = np.asarray(pcd.points), np.asarray(pcd.colors)
    out_dir = os.path.join(a.source, a.out)
    os.makedirs(out_dir, exist_ok=True)

    for img_id in sorted(images.keys())[:: a.every]:
        im = images[img_id]
        cam = cams[im.camera_id]
        K = np.array(
            [[cam.params[0], 0, cam.params[2]], [0, cam.params[1], cam.params[3]], [0, 0, 1]]
        )
        w2c = np.eye(4)
        w2c[:3, :3] = C.qvec2rotmat(im.qvec)
        w2c[:3, 3] = im.tvec
        image, mask = project_point_cloud_to_image(
            pts, cols, K, w2c, cam.width, cam.height
        )
        save_image(image.astype(np.float32) / 255.0, os.path.join(out_dir, f"{img_id}.png"))
        save_image(mask.astype("float32"), os.path.join(out_dir, f"{img_id}_mask.png"))
        print(f"view {img_id}: {int(mask.sum())} px covered")


if __name__ == "__main__":
    main()
