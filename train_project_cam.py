#!/usr/bin/env python
"""Project-cam baseline trainer CLI (role of reference
train_replica_baseline_with_project_cam.py:199-239).

Baseline 3DGS that, with probability project_cam_prob per epoch, supervises
on PROJECTION cameras: every-6th full-trajectory view whose pseudo image is
the DUSt3R point cloud projected to that view (+ validity mask), produced by
tools/project_pcd_to_views.py. Usage:

    python train_project_cam.py -s <source> -m <model_path> \
        --projected_dir <dir with NNNNN.png / NNNNN_mask.png>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from guidedvd3dgs_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    from guidedvd3dgs_tpu.config import (
        ModelParams,
        OptimizationParams,
        PipelineParams,
        build_parser,
        save_cfg_args,
    )

    parser = build_parser()
    parser.add_argument("--projected_dir", type=str, required=True,
                        help="directory of projected images + masks")
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[10_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[10_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args()

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)
    np.random.seed(args.seed)

    from guidedvd3dgs_tpu.scene.scene import Scene
    from guidedvd3dgs_tpu.train.logging import MetricsLogger
    from guidedvd3dgs_tpu.train.project_cam import ProjectCamTrainer

    os.makedirs(dataset.model_path, exist_ok=True)
    save_cfg_args(dataset.model_path, args)

    scene = Scene(dataset, replica_use_project_cam=True,
                  projected_dir=args.projected_dir)
    state = scene.create_gaussians(capacity=getattr(opt, "gaussian_capacity", 0),
                                   max_sh_degree=dataset.sh_degree)

    trainer = ProjectCamTrainer(scene, state, opt, pipe, dataset)
    trainer.attach_logger(MetricsLogger(dataset.model_path))
    trainer.train(
        iterations=opt.iterations,
        test_iterations=set(args.test_iterations),
        saving_iterations=set(args.save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        checkpoint_dir=dataset.model_path,
    )
    print("\nProject-cam training complete.")


if __name__ == "__main__":
    main()
