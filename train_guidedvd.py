#!/usr/bin/env python
"""Guided 3DGS trainer CLI (role of reference train_guidedvd.py:639-743).

Two-stage workflow preserved: first train the baseline
(train_baseline.py -m <baseline_path>), then

    python train_guidedvd.py -s <source> -m <model_path> \
        --baseline_path <baseline_path> [--viewcrafter_ckpt model.ckpt]

Without --viewcrafter_ckpt the trainer uses the mock diffusion engine
(pseudo ground truth = mask-blended frozen renders) — clearly announced,
for smoke runs and environments without the ViewCrafter weights.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def guidance_device(opt):
    """reference guidance_gpu_id (arguments/__init__.py:129): index into the
    local device list; the diffusion engine is pinned there so pipelined
    generation overlaps 3DGS optimization on a multi-chip slice."""
    import jax

    idx = int(getattr(opt, "guidance_gpu_id", 0))
    devs = jax.devices()
    return devs[idx] if 0 <= idx < len(devs) else None


def guidance_mesh(opt):
    """--guidance_tp N > 1: tensor-parallel mesh for the diffusion engine
    over N chips starting at guidance_gpu_id (the TPU-native upgrade of the
    reference's second-GPU placement, SURVEY §2.5)."""
    import jax

    tp = int(getattr(opt, "guidance_tp", 1))
    if tp <= 1:
        return None
    from guidedvd3dgs_tpu.parallel.mesh import make_mesh

    idx = int(getattr(opt, "guidance_gpu_id", 0))
    devs = jax.devices()
    if idx + tp > len(devs):
        print(f"WARNING: guidance_tp={tp} from device {idx} exceeds the "
              f"{len(devs)}-device slice; engine falls back to single-device")
        return None
    return make_mesh(n_data=1, n_model=tp, devices=devs[idx : idx + tp])


def build_engine(args, opt, height, width):
    device = guidance_device(opt)
    mesh = guidance_mesh(opt)
    if args.viewcrafter_ckpt:
        import jax.numpy as jnp

        from guidedvd3dgs_tpu.diffusion.convert import load_viewcrafter_checkpoint
        from guidedvd3dgs_tpu.diffusion.model import DiffusionParams, LatentDiffusionConfig
        from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import GuidedSampleConfig
        from guidedvd3dgs_tpu.diffusion.synthesis import SynthesisConfig
        from guidedvd3dgs_tpu.train.guided import ViewCrafterEngine

        print(f"Loading ViewCrafter checkpoint {args.viewcrafter_ckpt} ...")
        split = load_viewcrafter_checkpoint(args.viewcrafter_ckpt)
        params = DiffusionParams(
            unet=split["unet"], vae=split["vae"], resampler=split["resampler"],
            clip_text=split["clip_text"], clip_image=split["clip_image"],
        )
        import dataclasses

        # block-level UNet remat is mandatory at the production shape on a
        # 16 GB v5e: the guided step recomputes the UNet pair in its backward
        # (samplers/ddim_guidance.py), and that recompute's own backward must
        # be block-chunked or it OOMs (tools/diffusion_fullsize_smoke.py)
        mcfg = LatentDiffusionConfig()
        mcfg = dataclasses.replace(
            mcfg, unet=dataclasses.replace(mcfg.unet, remat=True)
        )
        scfg = SynthesisConfig(ddim_steps=opt.guidance_ddim_steps)
        # diffusion runs at 320 x (448 | 512): 576-base resize convention
        # (reference viewcrafter_wrapper.py:251-281 hard_code_vc_opts);
        # --scannetpp_newres forces 512 (reference train_guidedvd.py:97-98)
        if getattr(opt, "scannetpp_newres", False):
            d_w = 512
        else:
            d_w = 448 if abs(width / height - 1.4) < 0.2 else 512
        if getattr(opt, "guidance_mean_loss", False):
            # reference viewcrafter_wrapper.py:86 asserts this off
            raise ValueError("guidance_mean_loss must stay False "
                             "(reference LossGuidance asserts it)")
        return ViewCrafterEngine(
            params, mcfg, scfg,
            guided_cfg=GuidedSampleConfig(recur_steps=opt.guidance_recur_steps),
            video_length=25, height=320, width=d_w, device=device,
            recon_loss=opt.guidance_recon_loss, mesh=mesh,
        )
    if args.oracle_gt_npz:
        from guidedvd3dgs_tpu.train.guided import OracleDiffusionEngine

        print(f"Using ORACLE diffusion engine (GT gaussians from "
              f"{args.oracle_gt_npz}) — guided-machinery validation mode.")
        return OracleDiffusionEngine(
            args.oracle_gt_npz, video_length=25, height=height, width=width,
            backend=args.oracle_backend, device=device,
        )
    from guidedvd3dgs_tpu.train.guided import MockDiffusionEngine

    print("WARNING: no --viewcrafter_ckpt given; using the MOCK diffusion "
          "engine (pseudo-GT = mask-blended frozen renders).")
    return MockDiffusionEngine(video_length=25, height=height, width=width,
                               device=device)


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
    parser.add_argument("--baseline_path", type=str, required=True,
                        help="model_path of the trained baseline (frozen renderer)")
    parser.add_argument("--baseline_iteration", type=int, default=10_000)
    parser.add_argument("--viewcrafter_ckpt", type=str, default=None)
    parser.add_argument("--oracle_gt_npz", type=str, default=None,
                        help="validation mode: pseudo-GT rendered from these "
                             "ground-truth gaussians (make_synthetic_scene.py "
                             "output) instead of a diffusion model")
    parser.add_argument("--oracle_backend", type=str, default="auto")
    parser.add_argument("--vgg19_weights", type=str, default=None)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[10_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[10_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None,
                        help="resume a guided checkpoint written at "
                             "--checkpoint_iterations (restores pseudo pool, "
                             "trajectory pool, and RNG streams exactly)")
    parser.add_argument("--quiet", action="store_true")
    # two-renderer variant: a SECOND frozen baseline decides the guidance
    # mask while --baseline_path provides rgb/depth (reference
    # train_replica_guidedvd_tworenderer.py:60-74)
    parser.add_argument("--mask_baseline_path", type=str, default=None)
    parser.add_argument("--mask_baseline_iteration", type=int, default=10_000)
    # hybrid-traj variant: first epoch of diffusion events uses the fixed
    # loop2 txt trajectory (reference train_scannetpp_guidedvd_hybrid_traj.py:318)
    parser.add_argument("--hybrid_traj", action="store_true")
    # DPT (MiDaS) weights for the append_pcd_from_video_diffusion path
    # (reference utils/midas_depth_estimator.py:9-39; HF DPTForDepthEstimation
    # checkpoint, .safetensors or .bin — e.g. Intel/dpt-large)
    parser.add_argument("--dpt_weights", type=str, default=None)
    parser.add_argument("--profile_dir", type=str, default=None)
    parser.add_argument("--no_scan", action="store_true",
                        help="per-step host loop instead of the chunked scan")
    parser.add_argument("--pseudo_pool_cap", type=int, default=256,
                        help="device pseudo-frame pool all-time capacity (scan mode)")
    parser.add_argument("--pipeline_guidance", action="store_true",
                        help="overlap diffusion generation with training "
                             "(one-event pseudo-stack lag; engine on the "
                             "guidance_gpu_id device)")
    args = parser.parse_args()

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)
    np.random.seed(args.seed)

    from guidedvd3dgs_tpu.scene.scene import Scene
    from guidedvd3dgs_tpu.train.guided import FrozenRenderer, GuidedTrainer
    from guidedvd3dgs_tpu.utils.vgg_loss import make_vgg_loss_fn

    os.makedirs(dataset.model_path, exist_ok=True)
    save_cfg_args(dataset.model_path, args)

    scene = Scene(dataset)
    # init from the BASELINE snapshot like the reference guided trainer
    # (train_guidedvd.py loads the baseline ply through EasyRenderer and
    # trains a fresh model from the same DUSt3R init)
    state = scene.create_gaussians(capacity=getattr(opt, "gaussian_capacity", 0),
                                   max_sh_degree=dataset.sh_degree)

    import dataclasses

    base_args = dataclasses.replace(dataset, model_path=args.baseline_path)
    base_scene = Scene(base_args, load_iteration=args.baseline_iteration)
    frozen_state = base_scene.create_gaussians(max_sh_degree=dataset.sh_degree)
    frozen = FrozenRenderer(frozen_state, sh_degree=dataset.sh_degree,
                            backend=getattr(pipe, "raster_backend", "auto"))
    frozen_mask = None
    if args.mask_baseline_path:
        mask_args = dataclasses.replace(dataset, model_path=args.mask_baseline_path)
        mask_scene = Scene(mask_args, load_iteration=args.mask_baseline_iteration)
        mask_state = mask_scene.create_gaussians(max_sh_degree=dataset.sh_degree)
        frozen_mask = FrozenRenderer(mask_state, sh_degree=dataset.sh_degree,
                                     backend=getattr(pipe, "raster_backend", "auto"))
        print(f"Two-renderer variant: guidance mask from {args.mask_baseline_path}")

    cams = scene.getTrainCameras()
    h, w = cams[0].image_height, cams[0].image_width
    fx = w / (2 * math.tan(cams[0].FoVx / 2))
    fy = h / (2 * math.tan(cams[0].FoVy / 2))
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])

    engine = build_engine(args, opt, h, w)
    vgg_fn = make_vgg_loss_fn(args.vgg19_weights) if opt.pseudo_cam_lpips else None
    if opt.pseudo_cam_lpips and vgg_fn is None:
        print("WARNING: pseudo_cam_lpips requested but VGG19 weights not found "
              "(set VGG19_WEIGHTS); the perceptual pseudo term is DISABLED.")

    # guidance-side LPIPS term (reference LossGuidance lpips_guidance,
    # viewcrafter_wrapper.py:85-88,158-160)
    import jax.numpy as jnp

    if getattr(opt, "guidance_with_lpips", False) and vgg_fn is not None:
        if hasattr(engine, "lpips_fn"):
            engine.lpips_fn = lambda d, g, m: vgg_fn(
                jnp.transpose(d, (2, 0, 1))[None], jnp.transpose(g, (2, 0, 1))[None]
            )
    if hasattr(engine, "ssim_guidance"):
        engine.ssim_guidance = getattr(opt, "guidance_with_ssim", False)
    if hasattr(engine, "verbose"):
        engine.verbose = getattr(opt, "guidance_verbose", False)
    if hasattr(engine, "w_recon"):
        engine.w_recon = opt.w_guidance_recon_loss
    if hasattr(engine, "scale_weight_mode"):
        engine.scale_weight_mode = getattr(opt, "scale_guidance_weight", False)

    depth_estimator = None
    if getattr(opt, "append_pcd_from_video_diffusion", False):
        if args.dpt_weights:
            from guidedvd3dgs_tpu.guidance.dpt import (
                DPTConfig, load_hf_dpt_weights, make_depth_estimator,
            )

            depth_estimator = make_depth_estimator(
                {k: jnp.asarray(v) for k, v in load_hf_dpt_weights(args.dpt_weights).items()},
                DPTConfig(),
            )
        else:
            print("WARNING: append_pcd_from_video_diffusion needs --dpt_weights "
                  "(HF DPTForDepthEstimation ckpt); the append path is DISABLED.")

    pcd = scene.scene_info.point_cloud
    trainer = GuidedTrainer(
        scene, state, opt, pipe, dataset,
        frozen=frozen, engine=engine,
        pcd_points=np.asarray(pcd.points, np.float32),
        pcd_colors=np.asarray(pcd.colors, np.float32),
        guidance_intrinsic=K,
        vgg_loss_fn=vgg_fn,
        seed=args.seed,
        frozen_mask=frozen_mask,
        hybrid_traj=args.hybrid_traj,
        depth_estimator=depth_estimator,
        pipeline_guidance=args.pipeline_guidance,
    )
    from guidedvd3dgs_tpu.train.logging import MetricsLogger

    trainer.attach_logger(MetricsLogger(dataset.model_path))
    start_iteration = 0
    if args.start_checkpoint:
        # exact resume incl. pseudo pool / trajectory pool / RNG streams —
        # the reference cannot resume guided runs at all (its
        # --start_checkpoint is only wired in train_baseline.py)
        from guidedvd3dgs_tpu.train.guided_checkpoint import load_guided_checkpoint

        start_iteration = load_guided_checkpoint(args.start_checkpoint, trainer)
        print(f"Resumed guided checkpoint {args.start_checkpoint} "
              f"at iteration {start_iteration}")
    elif getattr(opt, "use_trajectory_pool", True):
        print("Building trajectory pool ...")
        trainer.init_trajectory_pool()
    else:
        # txt-preset trajectory mode (reference use_trajectory_pool=False
        # path, train_guidedvd.py:434-452) — no pool to build, but the view
        # geometry (DUSt3R poses/depths) is still needed for pc renders
        trainer.init_view_geometry()
    kwargs = dict(
        iterations=opt.iterations,
        test_iterations=set(args.test_iterations),
        saving_iterations=set(args.save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        checkpoint_dir=dataset.model_path,
        start_iteration=start_iteration,
    )
    if args.no_scan or args.profile_dir:
        trainer.train(profile_dir=args.profile_dir, **kwargs)
    else:
        # chunked trainer: one device dispatch per span between schedule
        # events (per-step host dispatch costs ~0.25 s through a
        # remotely-attached TPU)
        trainer.train_scan(alltime_cap=args.pseudo_pool_cap, **kwargs)
    print("\nGuided training complete.")


if __name__ == "__main__":
    main()
