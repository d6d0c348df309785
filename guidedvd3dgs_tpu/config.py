"""Typed config tree + reflection CLI (L5).

Replaces the reference's three config sources (ParamGroup argparse
reflection, ViewCrafter argparse, OmegaConf YAML — reference:
arguments/__init__.py:19-211, SURVEY.md section 5.6) with one dataclass tree.
Every dataclass field auto-becomes a CLI flag (bools become store_true pairs,
fields listed in SHORTHANDS also get one-letter flags), mirroring the
reference's reflection behavior so reference command lines keep working.

Persistence: configs are saved as `cfg_args.json`; for drop-in compatibility
with models trained by the reference we can also parse its `cfg_args` file
(a repr'd argparse.Namespace) WITHOUT eval() via the AST.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Any, Optional

# one-letter shorthands, mirroring the reference's leading-underscore names
SHORTHANDS = {
    "source_path": "s",
    "model_path": "m",
    "images": "i",
    "resolution": "r",
    "white_background": "w",
}


@dataclass
class ParamGroup:
    """Base: reflection between dataclass fields and argparse flags
    (role of reference arguments/__init__.py:19-45)."""

    @classmethod
    def add_to_parser(cls, parser: argparse.ArgumentParser, fill_none: bool = False):
        group = parser.add_argument_group(cls.__name__)
        for f in fields(cls):
            default = None if fill_none else f.default
            names = [f"--{f.name}"]
            if f.name in SHORTHANDS:
                names.append(f"-{SHORTHANDS[f.name]}")
            if f.type in ("bool", bool):
                group.add_argument(*names, default=default, action="store_true")
                # reference ParamGroup can never switch a True-default bool
                # off from the CLI (arguments/__init__.py:30-33); provide a
                # --no_ counterpart (SUPPRESS keeps the pair's default intact)
                group.add_argument(
                    f"--no_{f.name}", dest=f.name, action="store_false",
                    default=argparse.SUPPRESS, help=argparse.SUPPRESS,
                )
            else:
                ftype = {"int": int, "float": float, "str": str}.get(f.type, None)
                if ftype is None:
                    ftype = f.type if callable(f.type) else str
                group.add_argument(*names, default=default, type=ftype)

    @classmethod
    def extract(cls, args: argparse.Namespace):
        kwargs = {}
        for f in fields(cls):
            v = getattr(args, f.name, None)
            if v is None:
                v = f.default if f.default is not dataclasses.MISSING else f.default_factory()
            kwargs[f.name] = v
        return cls(**kwargs)

    def to_dict(self):
        return dataclasses.asdict(self)


@dataclass
class ModelParams(ParamGroup):
    """Scene/data parameters (reference: arguments/__init__.py:48-72)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"  # CLI compat; images live on host, device_put per step
    eval: bool = True
    n_views: int = 6
    dataset: str = "replica"  # replica | scannetpp | re10k | blender
    train_bg: bool = False  # CLI compat; reference-only experiment (learned bg, gaussian_model.py:170)
    use_dust3r_init: bool = True  # CLI compat; dead upstream (only defined, arguments/__init__.py)
    # project-page visualization split: Replica demo 6-view tables with
    # test == train anchors (reference arguments/__init__.py:62,
    # dataset_readers.py:390-398)
    demo_setting: bool = False
    # path to a precomputed DUSt3R points3D.ply (overrides dataset default)
    dust3r_ply: str = ""

    def post_extract(self):
        self.source_path = os.path.abspath(self.source_path) if self.source_path else ""
        return self


@dataclass
class PipelineParams(ParamGroup):
    """Render pipeline toggles (reference: arguments/__init__.py:75-83)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    use_confidence: bool = False
    use_color: bool = True
    # TPU-specific: rasterizer backend selection
    raster_backend: str = "auto"  # auto | dense | tiles


@dataclass
class OptimizationParams(ParamGroup):
    """All 3DGS + guidance hyperparameters, defaults matching the reference
    (reference: arguments/__init__.py:86-161)."""

    iterations: int = 10_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 10_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    prune_from_iter: int = 500
    densify_until_iter: int = 10_000
    densify_grad_threshold: float = 0.0005
    prune_threshold: float = 0.005
    start_sample_pseudo: int = 2000
    end_sample_pseudo: int = 9500
    sample_pseudo_interval: int = 1
    dist_thres: float = 10.0

    project_cam_prob: float = 0.8
    project_cam_weight: float = 0.05

    pseudo_cam_weight: float = 0.05
    pseudo_cam_ssim: bool = False
    pseudo_cam_lpips: bool = True
    pseudo_cam_lpips_weight: float = 0.1
    pseudo_cam_weight_decay: bool = False
    pseudo_cam_weight_start: float = 10.0
    pseudo_cam_weight_end: float = 0.05

    use_trajectory_pool: bool = True

    # guidance parameters
    guidance_recon_loss: str = "l2"
    w_guidance_recon_loss: float = 0.5
    guidance_gpu_id: int = 1  # kept for CLI compat; on TPU selects mesh slice
    # TPU extension: shard the diffusion engine tensor-parallel over this
    # many chips starting at guidance_gpu_id (1 = reference-style single-
    # device placement). parallel/model_parallel.py shard_params over a
    # Mesh model axis; SURVEY §2.5 design target.
    guidance_tp: int = 1
    guidance_vd_iter: int = 260
    guidance_ddim_steps: int = 50
    guidance_pc_render_all_views: bool = False
    guidance_recur_steps: int = 1
    guidance_vc_center_scale: float = 1.0

    no_guidance: bool = False
    guidance_random_traj: bool = False
    guidance_no_wave_traj: bool = False
    guidance_with_training_gs: bool = False
    guidance_with_training_gs_startiter: int = 5999
    guidance_with_training_gs_decide_mask: bool = False
    guidance_with_ssim: bool = False
    guidance_mean_loss: bool = False
    guidance_with_lpips: bool = False
    guidance_verbose: bool = False
    guidance_videos_from_file: bool = False
    guidance_save_videos: bool = True
    # per-DDIM-step pred_x0 debug videos into the event dir (reference
    # LossGuidance.save_pred_x0, viewcrafter_wrapper.py:174-192)
    save_pred_x0: bool = False
    append_pcd_from_video_diffusion: bool = False
    scale_guidance_weight: bool = False
    scannetpp_newres: bool = False
    replace_diffusion_input_with_gsrender: bool = False  # CLI compat; dead upstream (never read)

    # txt-trajectory warmup for the hybrid-traj ScanNet++ variant
    txt_traj_warmup: bool = False

    # TPU additions
    gaussian_capacity: int = 0  # 0 => auto (next pow2 headroom over init count)
    seed: int = 1


def build_parser(fill_none: bool = False) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    ModelParams.add_to_parser(parser, fill_none)
    PipelineParams.add_to_parser(parser, fill_none)
    OptimizationParams.add_to_parser(parser, fill_none)
    return parser


def save_cfg_args(model_path: str, merged: argparse.Namespace):
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(vars(merged), f, indent=1, default=str)


def parse_namespace_repr(text: str) -> dict:
    """Safely parse a reference-style cfg_args file — the repr of an
    argparse.Namespace — without eval()
    (reference persists via str(Namespace), arguments/__init__.py:175-181)."""
    text = text.strip()
    tree = ast.parse(text, mode="eval")
    call = tree.body
    if not isinstance(call, ast.Call):
        raise ValueError("cfg_args is not a Namespace repr")
    out = {}
    for kw in call.keywords:
        out[kw.arg] = ast.literal_eval(kw.value)
    return out


def load_persisted_cfg(model_path: str) -> dict:
    """Load cfg from a model dir: ours (cfg_args.json) or the reference's
    (cfg_args Namespace repr)."""
    jpath = os.path.join(model_path, "cfg_args.json")
    if os.path.exists(jpath):
        with open(jpath) as f:
            return json.load(f)
    npath = os.path.join(model_path, "cfg_args")
    if os.path.exists(npath):
        with open(npath) as f:
            return parse_namespace_repr(f.read())
    raise FileNotFoundError(f"no cfg_args[.json] under {model_path}")


def get_combined_args(parser_args: argparse.Namespace, model_path: Optional[str] = None):
    """Merge CLI args with the persisted training config, CLI winning
    (role of reference arguments/__init__.py:164-187)."""
    mp = model_path or parser_args.model_path
    merged = dict(load_persisted_cfg(mp))
    for k, v in vars(parser_args).items():
        if v is not None:
            merged[k] = v
    return argparse.Namespace(**merged)


def get_combined_args_without_cmdline(model_path: str):
    """Config-only variant used by EasyRenderer
    (reference: arguments/__init__.py:190-211)."""
    defaults = build_parser().parse_args([])
    merged = vars(defaults)
    merged.update(load_persisted_cfg(model_path))
    merged["model_path"] = model_path
    return argparse.Namespace(**merged)
