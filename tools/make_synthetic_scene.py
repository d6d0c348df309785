#!/usr/bin/env python
"""Generate a full-scale synthetic indoor scene in COLMAP layout for
end-to-end pipeline validation (train_baseline -> render -> metrics).

No real Replica/ScanNet++ data ships in this environment, so this builds a
Replica-shaped stand-in: a textured room interior, 60 cameras on a smooth
interior orbit, 6 spread train views + held-out test views, a noisy
point-cloud init standing in for DUSt3R output, and ground-truth images
rendered from a dense procedural Gaussian set at full resolution. Everything
downstream (readers, trainer, eval CLIs) treats it exactly like a real
capture (dataset="colmap").

Usage:
    python tools/make_synthetic_scene.py --out /path/scene [--height 352]
        [--width 624] [--n_gt 150000] [--n_init 30000] [--n_cams 60]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def texture(p: np.ndarray, seed_vecs: np.ndarray) -> np.ndarray:
    """Multi-octave procedural color for points (N, 3) -> (N, 3) in [0, 1]."""
    c = np.zeros((p.shape[0], 3), np.float32)
    for k, v in enumerate(seed_vecs):
        phase = p @ v[:3]
        c[:, k % 3] += 0.5 + 0.5 * np.sin(phase * v[3] + v[4])
    c /= max(len(seed_vecs) / 3.0, 1.0)
    return np.clip(c, 0.02, 0.98)


def sample_room(rng, n_gt: int):
    """GT surface points + colors for a box room with interior objects."""
    # room half-extents
    hx, hy, hz = 2.0, 1.4, 2.0
    walls = []
    # 6 walls: (fixed axis, sign)
    per_wall = n_gt // 10
    for axis, sign, frac in [
        (0, -1, 1.0), (0, 1, 1.0), (1, -1, 1.5), (1, 1, 1.5), (2, -1, 1.0), (2, 1, 1.0),
    ]:
        k = int(per_wall * frac)
        pts = rng.uniform(-1, 1, (k, 3)).astype(np.float32)
        pts[:, 0] *= hx
        pts[:, 1] *= hy
        pts[:, 2] *= hz
        pts[:, axis] = sign * (hx, hy, hz)[axis]
        walls.append(pts)
    # interior objects: spheres + a box
    objs = []
    n_obj = n_gt - sum(w.shape[0] for w in walls)
    centers = np.array(
        [[-0.8, -0.9, -0.6], [0.9, -0.8, 0.5], [0.0, -1.0, 1.1], [-0.3, -0.5, 0.9]],
        np.float32,
    )
    radii = np.array([0.45, 0.35, 0.3, 0.25], np.float32)
    per_obj = n_obj // len(centers)
    for c, r in zip(centers, radii):
        d = rng.normal(size=(per_obj, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        objs.append(c + d * r)
    pts = np.concatenate(walls + objs, 0)
    seed_vecs = rng.uniform(-1, 1, (9, 5)).astype(np.float32)
    seed_vecs[:, 3] = rng.uniform(2.0, 9.0, 9)  # spatial frequencies
    cols = texture(pts, seed_vecs)
    return pts, cols


def orbit_cameras(n_cams: int, rng):
    """Smooth interior orbit: positions on a small ellipse near the room
    center, look directions sweeping the walls (c2w, OpenCV convention)."""
    c2ws = []
    for i in range(n_cams):
        t = i / n_cams * 2 * math.pi
        pos = np.array(
            [0.9 * math.cos(t), -0.15 + 0.25 * math.sin(2 * t), 0.9 * math.sin(t)],
            np.float32,
        )
        # look outward toward the walls with a slow vertical nod
        look = np.array(
            [2.2 * math.cos(t + 0.35), 0.2 * math.sin(t * 3), 2.2 * math.sin(t + 0.35)],
            np.float32,
        )
        fwd = look - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0, -1, 0], np.float32)  # OpenCV y-down
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, upv, fwd, pos
        c2ws.append(c2w)
    return np.stack(c2ws)


def build_gt_state(pts, cols, rng):
    import jax.numpy as jnp

    from guidedvd3dgs_tpu.utils.sh import RGB2SH

    n = pts.shape[0]
    # spacing-derived isotropic scales with mild anisotropy jitter
    vol = 2 * 2.0 * 2 * 1.4 * 2 * 2.0
    spacing = (vol / n) ** (1 / 3) * 1.2
    scales = np.log(spacing * np.exp(rng.uniform(-0.4, 0.4, (n, 3)))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    opac_p = rng.uniform(0.75, 0.97, (n, 1)).astype(np.float32)
    opacity = np.log(opac_p / (1 - opac_p)).astype(np.float32)
    f_dc = np.asarray(RGB2SH(cols))[:, None, :]  # (N, 1, 3)
    f_rest = (rng.normal(size=(n, 15, 3)) * 0.02).astype(np.float32)
    return dict(
        xyz=jnp.asarray(pts),
        f_dc=jnp.asarray(f_dc),
        f_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scales),
        rotation=jnp.asarray(rots),
        opacity=jnp.asarray(opacity),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=624)
    ap.add_argument("--n_gt", type=int, default=150_000)
    ap.add_argument("--n_init", type=int, default=30_000)
    ap.add_argument("--n_cams", type=int, default=60)
    ap.add_argument("--n_train", type=int, default=6)
    ap.add_argument("--fov_deg", type=float, default=70.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--backend", type=str, default="tiles",
                    help="rasterizer for GT renders (dense for CPU-sized scenes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from guidedvd3dgs_tpu.ops.projection import RasterCamera
    from guidedvd3dgs_tpu.ops.raster import rasterize
    from guidedvd3dgs_tpu.scene import colmap
    from guidedvd3dgs_tpu.scene.ply import store_ply
    from guidedvd3dgs_tpu.utils.graphics import getProjectionMatrix
    from guidedvd3dgs_tpu.utils.video import save_image

    rng = np.random.default_rng(args.seed)
    pts, cols = sample_room(rng, args.n_gt)
    gt = build_gt_state(pts, cols, rng)
    c2ws = orbit_cameras(args.n_cams, rng)

    H, W = args.height, args.width
    fovx = math.radians(args.fov_deg)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    fx = W / (2 * math.tan(fovx / 2))
    fy = H / (2 * math.tan(fovy / 2))
    proj = np.asarray(getProjectionMatrix(0.01, 100.0, fovx, fovy)).T

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    sparse = os.path.join(args.out, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)

    @jax.jit
    def render_one(viewmatrix, projmatrix, campos):
        cam = RasterCamera(
            viewmatrix, projmatrix, campos,
            math.tan(fovx / 2), math.tan(fovy / 2), H, W,
        )
        out = rasterize(
            gt["xyz"],
            jnp.exp(gt["scaling"]),
            gt["rotation"] / jnp.linalg.norm(gt["rotation"], axis=1, keepdims=True),
            jax.nn.sigmoid(gt["opacity"])[:, 0],
            jnp.concatenate([gt["f_dc"], gt["f_rest"]], axis=1),
            cam,
            jnp.zeros((3,), jnp.float32),
            sh_degree=3,
            backend=args.backend,
        )
        return jnp.clip(out.color, 0.0, 1.0)

    cams_txt = {1: colmap.ColmapCamera(1, "PINHOLE", W, H, np.array([fx, fy, W / 2, H / 2]))}
    images_txt = {}
    for i in range(args.n_cams):
        w2c = np.linalg.inv(c2ws[i])
        view = w2c.T.astype(np.float32)  # transposed GLM convention
        img = np.asarray(render_one(jnp.asarray(view), jnp.asarray(view @ proj),
                                    jnp.asarray(c2ws[i][:3, 3])))
        name = f"frame_{i:05d}.png"
        save_image(img, os.path.join(args.out, "images", name))
        images_txt[i + 1] = colmap.ColmapImage(
            i + 1, colmap.rotmat2qvec(w2c[:3, :3]), w2c[:3, 3], 1, name,
            np.zeros((0, 2)), np.zeros((0,), np.int64),
        )
        if (i + 1) % 10 == 0:
            print(f"rendered {i + 1}/{args.n_cams}", flush=True)

    colmap.write_cameras_text(os.path.join(sparse, "cameras.txt"), cams_txt)
    colmap.write_images_text(os.path.join(sparse, "images.txt"), images_txt)
    with open(os.path.join(sparse, "points3D.txt"), "w") as f:
        f.write("# empty\n")

    # noisy init standing in for the DUSt3R point cloud
    sel = rng.choice(pts.shape[0], size=args.n_init, replace=False)
    init_pts = pts[sel] + rng.normal(scale=0.01, size=(args.n_init, 3)).astype(np.float32)
    init_cols = np.clip(
        cols[sel] + rng.normal(scale=0.05, size=(args.n_init, 3)).astype(np.float32), 0, 1
    )
    store_ply(os.path.join(sparse, "points3D.ply"), init_pts, (init_cols * 255).astype(np.uint8))

    # 6 spread train views + every-10th test views away from train
    train_ids = list(np.linspace(0, args.n_cams, args.n_train, endpoint=False).astype(int))
    test_ids = [i for i in range(0, args.n_cams, 5) if i not in train_ids]
    with open(os.path.join(args.out, f"train_test_split_{args.n_train}.json"), "w") as f:
        json.dump({"train_ids": [int(i) for i in train_ids],
                   "test_ids": [int(i) for i in test_ids]}, f)

    np.savez(os.path.join(args.out, "gt_gaussians.npz"),
             **{k: np.asarray(v) for k, v in gt.items()})
    print(f"scene written to {args.out}: {args.n_cams} cams @ {W}x{H}, "
          f"train={train_ids}, test={len(test_ids)} views")


if __name__ == "__main__":
    main()
