"""DUSt3R global alignment (PointCloudOptimizer) — jitted JAX rebuild.

Equivalent of the reference gradient-descent alignment
(reference: third_party/ViewCrafter/extern/dust3r/dust3r/cloud_opt/
optimizer.py:16-211 PointCloudOptimizer, base_opt.py:146-202 pose
parameterization, :346-375 global_alignment_loop). Parameters:

  pw_poses     (E, 8)  per-edge quat(xyzw) + signed-log T + log scale
  im_poses     (V, 7)  per-image quat(xyzw) + signed-log T
  im_depthmaps (V, H*W) log depth
  im_focals    (V,)    focal_break * log(focal)

Loss (optimizer.py:188-202): per-edge confidence-weighted L1 between the
global points (depth unprojected through each image's pose/focal) and the
pairwise network predictions rigidly aligned by the edge pose.

The guidedvd pipeline presets all poses and focals from COLMAP
(reference utils/viewcrafter_wrapper.py:303-312), so preset masks freeze
those parameters; the whole 300-iteration Adam loop runs as one lax.scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) in XYZW (roma convention) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def rotmat_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    from guidedvd3dgs_tpu.scene.colmap import rotmat2qvec

    w, x, y, z = rotmat2qvec(R)
    return np.array([x, y, z, w])


def signed_expm1(x):
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def signed_log1p(x):
    return np.sign(x) * np.log1p(np.abs(x))


class AlignerState(NamedTuple):
    pw_poses: jnp.ndarray  # (E, 8)
    im_poses: jnp.ndarray  # (V, 7)
    im_depth: jnp.ndarray  # (V, H*W) log depth
    im_focals: jnp.ndarray  # (V,)


@dataclass(frozen=True)
class AlignerConfig:
    height: int
    width: int
    focal_break: float = 20.0
    base_scale: float = 0.5
    min_conf_thr: float = 3.0
    pose_preset: bool = False  # freeze im_poses
    focal_preset: bool = False  # freeze im_focals


def poses_to_rt(poses: jnp.ndarray) -> jnp.ndarray:
    """(N, >=7) -> (N, 4, 4) cam2world (reference base_opt.py:146-151)."""
    R = quat_to_rotmat(poses[:, :4])
    T = signed_expm1(poses[:, 4:7])
    rt = jnp.zeros(poses.shape[:1] + (4, 4)).at[:, :3, :3].set(R)
    rt = rt.at[:, :3, 3].set(T).at[:, 3, 3].set(1.0)
    return rt


def pw_rt_scaled(pw_poses: jnp.ndarray, base_scale: float,
                 norm_pw_scale: bool = True) -> jnp.ndarray:
    """Edge poses with normalized scale baked into the upper 3x4
    (reference base_opt.py:174-191; norm disabled when poses are preset,
    base_opt preset_pose semantics)."""
    rt = poses_to_rt(pw_poses)
    log_scale = pw_poses[:, -1]
    scale = jnp.exp(log_scale)
    if norm_pw_scale:
        scale = scale * jnp.exp(jnp.log(base_scale) - log_scale.mean())
    return rt.at[:, :3].multiply(scale[:, None, None])


def depth_to_pts3d(state: AlignerState, cfg: AlignerConfig) -> jnp.ndarray:
    """(V, H*W, 3) world-frame points (reference optimizer.py:170-186)."""
    v = state.im_depth.shape[0]
    focals = jnp.exp(state.im_focals / cfg.focal_break)[:, None, None]
    pp = jnp.asarray([[cfg.width / 2.0, cfg.height / 2.0]])[:, None, :]
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height), jnp.arange(cfg.width), indexing="ij")
    grid = jnp.stack([xx, yy], -1).reshape(1, -1, 2).astype(jnp.float32)
    depth = jnp.exp(state.im_depth)[..., None]
    rel = jnp.concatenate([depth * (grid - pp) / focals, depth], -1)  # (V, HW, 3)
    c2w = poses_to_rt(state.im_poses)
    # HIGHEST: TPU default matmul precision rounds f32 to bf16 — the
    # aligner optimizes metric point positions, 0.2% rotation error is real
    return jnp.einsum("vij,vpj->vpi", c2w[:, :3, :3], rel,
                      precision=jax.lax.Precision.HIGHEST) + c2w[:, None, :3, 3]


def alignment_loss(
    state: AlignerState,
    cfg: AlignerConfig,
    pred_i: jnp.ndarray,  # (E, H*W, 3) view-i pointmaps (edge frame)
    pred_j: jnp.ndarray,  # (E, H*W, 3) view-j pointmaps (in view-i frame)
    weight_i: jnp.ndarray,  # (E, H*W) log-conf weights
    weight_j: jnp.ndarray,
    edges_i: jnp.ndarray,  # (E,) int
    edges_j: jnp.ndarray,
) -> jnp.ndarray:
    """reference optimizer.py:188-202 (dist='l1', conf='log')."""
    pts = depth_to_pts3d(state, cfg)
    pw = pw_rt_scaled(state.pw_poses, cfg.base_scale,
                      norm_pw_scale=not cfg.pose_preset)

    def aligned(pred):
        return jnp.einsum("eij,epj->epi", pw[:, :3, :3], pred,
                          precision=jax.lax.Precision.HIGHEST) + pw[:, None, :3, 3]

    area = pred_i.shape[1]
    li = (jnp.linalg.norm(pts[edges_i] - aligned(pred_i), axis=-1) * weight_i).sum()
    lj = (jnp.linalg.norm(pts[edges_j] - aligned(pred_j), axis=-1) * weight_j).sum()
    total_i = edges_i.shape[0] * area
    total_j = edges_j.shape[0] * area
    return li / total_i + lj / total_j


def init_state(
    cfg: AlignerConfig,
    n_imgs: int,
    edges: List[Tuple[int, int]],
    pred_i: np.ndarray,
    rng: np.random.Generator,
    preset_c2w: np.ndarray = None,  # (V, 4, 4)
    preset_focals: np.ndarray = None,  # (V,)
) -> AlignerState:
    """Random init (reference optimizer.py:29-37) + preset pose/focal
    support (optimizer.py:66-99); depth initialized from the per-edge
    predictions of each image's first outgoing edge."""
    e = len(edges)
    pw = rng.standard_normal((e, 8)).astype(np.float32)
    ip = rng.standard_normal((n_imgs, 7)).astype(np.float32)
    if preset_c2w is not None:
        for v in range(n_imgs):
            ip[v, :4] = rotmat_to_quat_xyzw(preset_c2w[v][:3, :3])
            ip[v, 4:7] = signed_log1p(preset_c2w[v][:3, 3])
        # edge frame == first view's camera frame: seed pw poses there
        for eidx, (i, j) in enumerate(edges):
            pw[eidx, :4] = rotmat_to_quat_xyzw(preset_c2w[i][:3, :3])
            pw[eidx, 4:7] = signed_log1p(preset_c2w[i][:3, 3])
            pw[eidx, 7] = 0.0  # log scale 1
    focals = np.full((n_imgs,), cfg.focal_break * np.log(max(cfg.height, cfg.width)),
                     np.float32)
    if preset_focals is not None:
        focals = cfg.focal_break * np.log(np.asarray(preset_focals, np.float32))

    depth = rng.standard_normal((n_imgs, cfg.height * cfg.width)).astype(np.float32) / 10 - 3
    # seed log-depth with the z of each image's first prediction as view i
    for v in range(n_imgs):
        for eidx, (i, j) in enumerate(edges):
            if i == v:
                z = np.clip(np.asarray(pred_i[eidx][..., 2]).reshape(-1), 1e-4, None)
                depth[v] = np.log(z)
                break
    return AlignerState(
        pw_poses=jnp.asarray(pw),
        im_poses=jnp.asarray(ip),
        im_depth=jnp.asarray(depth),
        im_focals=jnp.asarray(focals),
    )


def global_align(
    state: AlignerState,
    cfg: AlignerConfig,
    pred_i: jnp.ndarray,
    pred_j: jnp.ndarray,
    conf_i: jnp.ndarray,  # (E, H*W) raw confidences
    conf_j: jnp.ndarray,
    edges: List[Tuple[int, int]],
    niter: int = 300,
    lr: float = 0.01,
    lr_min: float = 1e-6,
) -> Tuple[AlignerState, jnp.ndarray]:
    """Adam(0.9, 0.9) + cosine LR loop as one scan (reference
    base_opt.py:346-375). Returns (state, final loss)."""
    weight_i = jnp.log(conf_i)
    weight_j = jnp.log(conf_j)
    ei = jnp.asarray([i for i, j in edges], jnp.int32)
    ej = jnp.asarray([j for i, j in edges], jnp.int32)

    grad_mask = AlignerState(
        pw_poses=jnp.float32(1.0),
        im_poses=jnp.float32(0.0 if cfg.pose_preset else 1.0),
        im_depth=jnp.float32(1.0),
        im_focals=jnp.float32(0.0 if cfg.focal_preset else 1.0),
    )

    opt = optax.adam(learning_rate=1.0, b1=0.9, b2=0.9)
    opt_state = opt.init(state)

    def loss_fn(s):
        return alignment_loss(s, cfg, pred_i, pred_j, weight_i, weight_j, ei, ej)

    def step(carry, it):
        s, os = carry
        t = it / niter
        cur_lr = lr_min + 0.5 * (lr - lr_min) * (1 + jnp.cos(t * jnp.pi))
        loss, grads = jax.value_and_grad(loss_fn)(s)
        grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
        updates, os = opt.update(grads, os, s)
        updates = jax.tree.map(lambda u: u * cur_lr, updates)
        s = optax.apply_updates(s, updates)
        return (s, os), loss

    (state, _), losses = jax.lax.scan(step, (state, opt_state), jnp.arange(niter))
    return state, losses[-1]


def aligner_outputs(state: AlignerState, cfg: AlignerConfig):
    """get_im_poses / get_focals / get_pts3d / get_depthmaps equivalents."""
    c2w = poses_to_rt(state.im_poses)
    focals = jnp.exp(state.im_focals / cfg.focal_break)
    pts = depth_to_pts3d(state, cfg)
    v = pts.shape[0]
    return {
        "c2w": c2w,
        "focals": focals,
        "pts3d": pts.reshape(v, cfg.height, cfg.width, 3),
        "depth": jnp.exp(state.im_depth).reshape(v, cfg.height, cfg.width),
    }
