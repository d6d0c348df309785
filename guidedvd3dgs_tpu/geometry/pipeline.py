"""DUSt3R inference pipeline: pairs -> network -> global alignment -> scene.

Equivalents of the reference glue
(reference: extern/dust3r/dust3r/image_pairs.py make_pairs (complete graph,
symmetrized), dust3r/inference.py inference, tools/dust3r_to_colmap.py:196-341
process_dust3r/convert_dust3r_to_colmap, tools/get_replica_dust3r_pcd.py:1-53
known-pose pointcloud extraction, dust3r/utils/image.py load_images resize
convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.geometry import global_aligner as GA
from guidedvd3dgs_tpu.geometry.dust3r import Dust3rConfig, dust3r_apply


def make_pairs(n_images: int, scene_graph: str = "complete",
               symmetrize: bool = True) -> List[Tuple[int, int]]:
    """reference image_pairs.py: complete graph -> n*(n-1)/2 pairs,
    symmetrized to n*(n-1) directed edges."""
    pairs = []
    if scene_graph == "complete":
        for i in range(n_images):
            for j in range(i):
                pairs.append((i, j))
    elif scene_graph.startswith("swin"):
        winsize = int(scene_graph.split("-")[1]) if "-" in scene_graph else 3
        for i in range(n_images):
            for k in range(1, winsize + 1):
                pairs.append((i, (i + k) % n_images))
    else:
        raise ValueError(scene_graph)
    if symmetrize:
        pairs = pairs + [(j, i) for i, j in pairs]
    return pairs


def resize_for_dust3r(img: np.ndarray, size: int = 512) -> np.ndarray:
    """Resize so the long side is `size`, crop H/W to multiples of 16
    (reference dust3r/utils/image.py load_images; for the guidedvd 576x1024
    convention this yields 288x512 or 336x512)."""
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = round(h * scale), round(w * scale)
    out = np.asarray(
        jax.image.resize(jnp.asarray(img, jnp.float32), (nh, nw, 3), "bilinear")
    )
    ch, cw = (nh // 16) * 16, (nw // 16) * 16
    oy, ox = (nh - ch) // 2, (nw - cw) // 2
    return out[oy : oy + ch, ox : ox + cw]


def normalize_images(imgs: np.ndarray) -> np.ndarray:
    """ImgNorm: mean .5 / std .5 -> [-1, 1]."""
    return (np.asarray(imgs, np.float32) - 0.5) / 0.5


@dataclass
class Dust3rScene:
    c2ws: np.ndarray  # (V, 4, 4)
    focals: np.ndarray  # (V,)
    pts3d: np.ndarray  # (V, H, W, 3)
    depths: np.ndarray  # (V, H, W)
    confs: np.ndarray  # (V, H, W)
    imgs: np.ndarray  # (V, H, W, 3) in [0, 1]


def run_dust3r_scene(
    params: dict,
    cfg: Dust3rConfig,
    images: np.ndarray,  # (V, H, W, 3) in [0, 1], dust3r-resized
    known_c2w: Optional[np.ndarray] = None,
    known_focals: Optional[np.ndarray] = None,
    niter: int = 300,
    lr: float = 0.01,
    batch_pairs: int = 4,
    seed: int = 0,
) -> Dust3rScene:
    """Full reference pipeline (viewcrafter_wrapper.py:291-343
    run_dust3r_train_views): all-pairs inference + global alignment with
    preset COLMAP poses/focals."""
    v, h, w, _ = images.shape
    edges = make_pairs(v)
    norm = jnp.asarray(normalize_images(images))

    # params is a jit ARGUMENT: closing the ViT-L weights (~1.3 GB) into
    # the lambda would embed them as lowering constants (oversized
    # executables; breaks the remote-compile transport — same class as the
    # diffusion-synthesis capture fixed in train/guided.py)
    apply_fn = jax.jit(lambda p, a, b: dust3r_apply(p, cfg, a, b))

    pred_i, pred_j, conf_i, conf_j = [], [], [], []
    for s in range(0, len(edges), batch_pairs):
        chunk = edges[s : s + batch_pairs]
        i1 = norm[jnp.asarray([i for i, j in chunk])]
        i2 = norm[jnp.asarray([j for i, j in chunk])]
        o1, o2 = apply_fn(params, i1, i2)
        pred_i.append(np.asarray(o1["pts3d"]))
        pred_j.append(np.asarray(o2["pts3d"]))
        conf_i.append(np.asarray(o1["conf"]))
        conf_j.append(np.asarray(o2["conf"]))
    pred_i = np.concatenate(pred_i).reshape(len(edges), h * w, 3)
    pred_j = np.concatenate(pred_j).reshape(len(edges), h * w, 3)
    conf_i = np.concatenate(conf_i).reshape(len(edges), h * w)
    conf_j = np.concatenate(conf_j).reshape(len(edges), h * w)

    acfg = GA.AlignerConfig(
        height=h, width=w,
        pose_preset=known_c2w is not None,
        focal_preset=known_focals is not None,
    )
    rng = np.random.default_rng(seed)
    state = GA.init_state(acfg, v, edges, pred_i, rng,
                          preset_c2w=known_c2w, preset_focals=known_focals)
    state, loss = GA.global_align(
        state, acfg, jnp.asarray(pred_i), jnp.asarray(pred_j),
        jnp.asarray(conf_i), jnp.asarray(conf_j), edges, niter=niter, lr=lr,
    )
    out = GA.aligner_outputs(state, acfg)

    im_conf = np.zeros((v, h, w), np.float32)
    for eidx, (i, j) in enumerate(edges):
        im_conf[i] = np.maximum(im_conf[i], conf_i[eidx].reshape(h, w))
        im_conf[j] = np.maximum(im_conf[j], conf_j[eidx].reshape(h, w))

    return Dust3rScene(
        c2ws=np.asarray(out["c2w"]),
        focals=np.asarray(out["focals"]),
        pts3d=np.asarray(out["pts3d"]),
        depths=np.asarray(out["depth"]),
        confs=im_conf,
        imgs=np.asarray(images),
    )


def scene_to_pointcloud(
    scene: Dust3rScene, min_conf_thr: float = 3.0, every: int = 3
) -> Tuple[np.ndarray, np.ndarray]:
    """Masked, subsampled world point cloud for points3D.ply
    (reference tools/dust3r_to_colmap.py:299-316: every-3rd point)."""
    mask = scene.confs > min_conf_thr
    pts = scene.pts3d[mask]
    cols = scene.imgs[mask]
    return pts[::every].astype(np.float32), cols[::every].astype(np.float32)


def export_colmap(scene: Dust3rScene, out_dir: str, min_conf_thr: float = 3.0):
    """sparse/0 export with the AVERAGED focal
    (reference tools/dust3r_to_colmap.py convert_dust3r_to_colmap)."""
    import os

    from guidedvd3dgs_tpu.scene.ply import store_ply
    from tools.dataset_to_colmap import save_cameras_txt, save_images_txt

    os.makedirs(out_dir, exist_ok=True)
    v, h, w = scene.confs.shape
    favg = float(np.mean(scene.focals))
    K = np.array([[favg, 0, w / 2.0], [0, favg, h / 2.0], [0, 0, 1]])
    w2c = np.stack([np.linalg.inv(c) for c in scene.c2ws])
    save_cameras_txt(out_dir, np.repeat(K[None], v, 0), h, w)
    save_images_txt(out_dir, w2c)
    pts, cols = scene_to_pointcloud(scene, min_conf_thr)
    store_ply(os.path.join(out_dir, "points3D.ply"), pts, (cols * 255).astype(np.uint8))
