#!/usr/bin/env python
"""COLMAP converter for custom captures (role of reference convert.py:1-124).

Runs COLMAP feature extraction -> exhaustive matching -> mapping -> image
undistortion over `<source_path>/input/*.jpg|png`, producing the
`sparse/0` + `images/` layout the scene readers consume (then train with
`--dataset colmap`). Requires the `colmap` binary on PATH (not bundled);
subprocess-based (no shell interpolation), with optional downscaled image
pyramids via OpenCV instead of ImageMagick.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: list[str]) -> None:
    print("=>", " ".join(cmd), flush=True)
    r = subprocess.run(cmd)
    if r.returncode != 0:
        sys.exit(f"command failed ({r.returncode}): {' '.join(cmd)}")


def main():
    ap = argparse.ArgumentParser("Colmap converter")
    ap.add_argument("--no_gpu", action="store_true")
    ap.add_argument("--skip_matching", action="store_true")
    ap.add_argument("--source_path", "-s", required=True, type=str)
    ap.add_argument("--camera", default="OPENCV", type=str)
    ap.add_argument("--colmap_executable", default="colmap", type=str)
    ap.add_argument("--resize", action="store_true",
                    help="also write images_2/ images_4/ images_8/ pyramids")
    args = ap.parse_args()

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        sys.exit(
            f"'{colmap}' not found on PATH — install COLMAP or pass "
            "--colmap_executable (this tool only orchestrates it, like the "
            "reference convert.py)"
        )
    src = args.source_path
    use_gpu = "0" if args.no_gpu else "1"

    if not args.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance=0.000001"])

    run([colmap, "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src,
         "--output_type", "COLMAP"])

    # undistorter writes sparse/* — move into sparse/0 (reference :92-104)
    sparse = f"{src}/sparse"
    os.makedirs(f"{sparse}/0", exist_ok=True)
    for f in os.listdir(sparse):
        if f == "0":
            continue
        shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if args.resize:
        import cv2

        for scale, name in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
            out_dir = f"{src}/{name}"
            os.makedirs(out_dir, exist_ok=True)
            for f in os.listdir(f"{src}/images"):
                img = cv2.imread(os.path.join(src, "images", f))
                if img is None:
                    continue
                h, w = img.shape[:2]
                cv2.imwrite(os.path.join(out_dir, f),
                            cv2.resize(img, (w // scale, h // scale),
                                       interpolation=cv2.INTER_AREA))
    print("Done.")


if __name__ == "__main__":
    main()
