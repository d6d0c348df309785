#!/usr/bin/env python
"""Baseline 3DGS trainer CLI (role of reference train_baseline.py:199-229).

Usage mirrors the reference:
    python train_baseline.py -s <source_path> -m <model_path> \
        --iterations 10000 --test_iterations 10000 --save_iterations 10000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse

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
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[10_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[10_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--nan_debug", action="store_true",
                        help="halt on first non-finite parameter, dumping a "
                             "replayable pre-chunk bundle (detect_anomaly role)")
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of steps 50-60 here")
    parser.add_argument("--no_scan", action="store_true",
                        help="per-step host loop instead of the chunked scan")
    args = parser.parse_args()

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)

    np.random.seed(args.seed)

    from guidedvd3dgs_tpu.scene.scene import Scene
    from guidedvd3dgs_tpu.train.baseline import BaselineTrainer
    from guidedvd3dgs_tpu.train.checkpoint import load_checkpoint

    os.makedirs(dataset.model_path, exist_ok=True)
    save_cfg_args(dataset.model_path, args)

    scene = Scene(dataset)
    state = scene.create_gaussians(capacity=getattr(opt, "gaussian_capacity", 0),
                                   max_sh_degree=dataset.sh_degree)
    first_iter = 0
    if args.start_checkpoint:
        state, first_iter = load_checkpoint(args.start_checkpoint, state)
        print(f"Restored checkpoint at iteration {first_iter}")

    from guidedvd3dgs_tpu.train.logging import MetricsLogger

    trainer = BaselineTrainer(scene, state, opt, pipe, dataset)
    trainer.attach_logger(MetricsLogger(dataset.model_path))
    kwargs = dict(
        iterations=opt.iterations,
        test_iterations=set(args.test_iterations),
        saving_iterations=set(args.save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        checkpoint_dir=dataset.model_path,
        start_iteration=first_iter,
    )
    if args.no_scan or args.profile_dir:
        trainer.train(profile_dir=args.profile_dir, **kwargs)
    else:
        trainer.train_scan(nan_debug=args.nan_debug, **kwargs)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
