#!/usr/bin/env python
"""Render trained models to renders/ + gt/ pngs and optional video
(role of reference render.py:34-124, same CLI)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _save_png(path: str, img: np.ndarray):
    """img: (3, H, W) float [0,1]."""
    from guidedvd3dgs_tpu.utils.video import save_image

    save_image(img, path)


def render_set(model_path, name, iteration, views, trainer_like, save_depth=False):
    """reference render.py:34-52."""
    import jax.numpy as jnp

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)
    depth_path = os.path.join(model_path, name, f"ours_{iteration}", "depth")
    if save_depth:
        os.makedirs(depth_path, exist_ok=True)

    from guidedvd3dgs_tpu.train.baseline import eval_render

    for idx, view in enumerate(views):
        r = eval_render(
            trainer_like["state"], view.raster_camera(), trainer_like["bg"],
            trainer_like["sh_degree"], backend=trainer_like["backend"],
        )
        _save_png(os.path.join(render_path, f"{idx:05d}.png"), np.asarray(r.color))
        _save_png(os.path.join(gts_path, f"{idx:05d}.png"), np.asarray(view.image))
        if save_depth:
            np.save(os.path.join(depth_path, f"{idx:05d}.npy"), np.asarray(r.depth))


def render_video(model_path, iteration, views, trainer_like, fps=30,
                 path_type="auto", source_path=""):
    """reference render.py:55-81: spiral (llff poses_bounds) or ellipse mp4."""
    import math

    from guidedvd3dgs_tpu.scene.cameras import camera_from_w2c_K
    from guidedvd3dgs_tpu.train.baseline import eval_render
    from guidedvd3dgs_tpu.utils.pose_paths import (
        generate_ellipse_path,
        generate_spiral_path,
    )
    from guidedvd3dgs_tpu.utils.video import save_video

    out_dir = os.path.join(model_path, "video", f"ours_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    view0 = views[0]
    h, w = view0.image_height, view0.image_width
    fx = w / (2 * math.tan(view0.FoVx / 2))
    fy = h / (2 * math.tan(view0.FoVy / 2))
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])

    # path selection mirrors the reference (render.py:60-63): spiral for
    # llff-style captures with poses_bounds.npy, ellipse otherwise
    pb = os.path.join(source_path, "poses_bounds.npy") if source_path else ""
    if path_type == "spiral" or (path_type == "auto" and "llff" in source_path and os.path.exists(pb)):
        w2cs = generate_spiral_path(np.load(pb), n_frames=240)
    else:
        w2cs = generate_ellipse_path(views, n_frames=240)

    frames = []
    for w2c in w2cs:
        cam = camera_from_w2c_K(np.asarray(w2c), K, h, w)
        r = eval_render(
            trainer_like["state"], cam.raster_camera(), trainer_like["bg"],
            trainer_like["sh_degree"], backend=trainer_like["backend"],
        )
        frames.append(np.clip(np.transpose(np.asarray(r.color), (1, 2, 0)), 0, 1))
    save_video(np.stack(frames), os.path.join(out_dir, "final_video.mp4"), fps=fps)


def main():
    from guidedvd3dgs_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    import argparse

    import jax.numpy as jnp

    from guidedvd3dgs_tpu.config import (
        ModelParams,
        PipelineParams,
        build_parser,
        get_combined_args,
    )
    from guidedvd3dgs_tpu.scene.scene import Scene

    parser = build_parser(fill_none=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--path_type", default="auto", choices=["auto", "spiral", "ellipse"])
    parser.add_argument("--fps", default=30, type=int)
    parser.add_argument("--save_depth", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser.parse_args())

    dataset = ModelParams.extract(args)
    pipe = PipelineParams.extract(args)

    scene = Scene(dataset, load_iteration=args.iteration)
    state = scene.create_gaussians(max_sh_degree=dataset.sh_degree)
    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])
    tl = {
        "state": state,
        "bg": bg,
        "sh_degree": dataset.sh_degree,
        "backend": getattr(pipe, "raster_backend", "auto"),
    }

    it = scene.loaded_iter
    if not args.skip_train:
        render_set(dataset.model_path, "train", it, scene.getTrainCameras(), tl,
                   save_depth=args.save_depth)
    if not args.skip_test:
        render_set(dataset.model_path, "test", it, scene.getTestCameras(), tl,
                   save_depth=args.save_depth)
    if args.video:
        render_video(dataset.model_path, it, scene.getTrainCameras(), tl,
                     fps=args.fps, path_type=args.path_type,
                     source_path=dataset.source_path)


if __name__ == "__main__":
    main()
