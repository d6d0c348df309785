#!/usr/bin/env python
"""Evaluation CLI: SSIM / PSNR / LPIPS over rendered test sets
(role of reference metrics.py:36-112, same CLI and JSON artifacts).

Conventions preserved (reference metrics.py:71-80): LPIPS-vgg on [0,1]
inputs, LPIPS-alex on [-1,1] inputs (the paper's reported number). When
LPIPS weights are unavailable in the environment the lpips fields are
reported as null and a warning is printed — never silently zero.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def read_images(renders_dir: Path, gt_dir: Path):
    from guidedvd3dgs_tpu.utils.video import load_image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(load_image(str(renders_dir / fname)), np.float32) / 255.0
        g = np.asarray(load_image(str(gt_dir / fname)), np.float32) / 255.0
        renders.append(np.transpose(r[..., :3], (2, 0, 1))[None])
        gts.append(np.transpose(g[..., :3], (2, 0, 1))[None])
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, quiet=False):
    import jax.numpy as jnp

    from guidedvd3dgs_tpu.metrics.lpips import load_lpips, lpips_apply
    from guidedvd3dgs_tpu.utils.losses import psnr as psnr_fn
    from guidedvd3dgs_tpu.utils.losses import ssim as ssim_fn

    lpips_vgg = load_lpips("vgg")
    lpips_alex = load_lpips("alex")
    if lpips_vgg is None or lpips_alex is None:
        print("WARNING: LPIPS weights not found (set LPIPS_WEIGHTS_DIR); "
              "lpips fields will be null")

    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict, per_view_dict = {}, {}
        test_dir = Path(scene_dir) / "test"
        for method in sorted(os.listdir(test_dir)):
            print("Method:", method)
            method_dir = test_dir / method
            renders, gts, names = read_images(method_dir / "renders", method_dir / "gt")

            ssims, psnrs, lpipss, lpipss_alex = [], [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r[0]), jnp.asarray(g[0])
                ssims.append(float(ssim_fn(rj, gj)))
                psnrs.append(float(psnr_fn(rj, gj)[0, 0]))
                if lpips_vgg is not None:
                    lpipss.append(float(lpips_apply(lpips_vgg, jnp.asarray(r), jnp.asarray(g))[0]))
                if lpips_alex is not None:
                    # alex convention: inputs in [-1, 1] (reference metrics.py:75)
                    lpipss_alex.append(float(
                        lpips_apply(lpips_alex, jnp.asarray(r * 2 - 1), jnp.asarray(g * 2 - 1))[0]
                    ))

            mean = lambda xs: float(np.mean(xs)) if xs else None
            print(f"  SSIM : {mean(ssims):.7f}")
            print(f"  PSNR : {mean(psnrs):.7f}")
            if lpipss:
                print(f"  LPIPS: {mean(lpipss):.7f}")
            full_dict[method] = {
                "SSIM": mean(ssims),
                "PSNR": mean(psnrs),
                "LPIPS": mean(lpipss),
                "LPIPS_ALEX": mean(lpipss_alex),
            }
            per_view_dict[method] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
                "LPIPS": dict(zip(names, lpipss)) if lpipss else {},
                "LPIPS_ALEX": dict(zip(names, lpipss_alex)) if lpipss_alex else {},
            }

        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict, f, indent=2)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view_dict, f, indent=2)


if __name__ == "__main__":
    import argparse
    from guidedvd3dgs_tpu.utils.general import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_paths", "-m", required=True, nargs="+", type=str)
    args = parser.parse_args()
    evaluate(args.model_paths)
