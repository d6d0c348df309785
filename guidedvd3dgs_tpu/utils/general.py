"""General math helpers (L0) — activations, LR schedule, quaternion algebra.

Mirrors reference utils/general_utils.py. Quaternion order is (w, x, y, z)
throughout, matching the reference and the CUDA `computeCov3D`
(reference: forward.cu:120-152).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def get_expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    """Log-linear LR interpolation with optional sine delay
    (reference: utils/general_utils.py:33-66). Returns a host-side callable;
    `step` may be a python int or array."""

    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        out = delay_rate * log_lerp
        return np.where(np.asarray(step) < 0, 0.0, out) if np.ndim(step) else (
            0.0 if step < 0 else float(out)
        )

    return helper


def learning_rate_decay(
    step, lr_init, lr_final, max_steps, lr_delay_steps=0, lr_delay_mult=1
):
    """mip-NeRF style log-lerp decay (reference: utils/viewcrafter_wrapper.py
    :663-691 learning_rate_decay/log_lerp; used for the optional
    guidance-weight warmup)."""
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = np.clip(step / max_steps, 0, 1)
    return delay_rate * np.exp(t * (np.log(lr_final) - np.log(lr_init)) + np.log(lr_init))


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (…, 4) in (w,x,y,z) → rotation matrices (…, 3, 3),
    normalizing first (reference: utils/general_utils.py:78-98)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(*q.shape[:-1], 3, 3)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): covariance factor such that Sigma = L L^T
    (reference: utils/general_utils.py:100-109)."""
    R = build_rotation(q)
    return R * s[..., None, :]


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) symmetric → (…, 6) upper-triangular packing
    [xx, xy, xz, yy, yz, zz] (reference: utils/general_utils.py:68-76)."""
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def covariance_from_scaling_rotation(scaling, scale_modifier, rotation):
    """Actual 3D covariance Σ = R S S^T R^T packed to 6 values — matches both
    the python path (reference: scene/gaussian_model.py:29-37) and the CUDA
    computeCov3D."""
    L = build_scaling_rotation(scale_modifier * scaling, rotation)
    Sigma = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(Sigma)


def chamfer_dist(array1: jnp.ndarray, array2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric mean nearest-neighbor distance (O(N*M); reference:
    utils/general_utils.py:179-181)."""
    d = jnp.linalg.norm(array1[:, None, :] - array2[None, :, :], axis=-1)
    return d.min(axis=1).mean() + d.min(axis=0).mean()


def vis_depth_turbo(depth: np.ndarray, near=None, far=None) -> np.ndarray:
    """Depth → turbo-style colormap uint8 image for debugging artifacts
    (role of reference utils/general_utils.py:157-176)."""
    d = np.asarray(depth, dtype=np.float64)
    lo = np.percentile(d, 1) if near is None else near
    hi = np.percentile(d, 99) if far is None else far
    t = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    # compact polynomial fit of the turbo colormap
    r = np.clip(0.1357 + t * (4.5974 - t * (42.3277 - t * (130.5887 - t * (150.5666 - t * 58.1375)))), 0, 1)
    g = np.clip(0.0914 + t * (2.1856 + t * (4.8052 - t * (14.0195 - t * (4.2109 + t * 2.7747)))), 0, 1)
    b = np.clip(0.1067 + t * (12.5925 - t * (60.1097 - t * (109.0745 - t * (88.5066 - t * 26.8183)))), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def enable_compile_cache() -> None:
    """Persistent XLA compile cache for the CLIs (first compiles through the
    remote-TPU tunnel take 30-60s; re-runs then start instantly).

    Deliberately NOT enabled when xla_force_host_platform_device_count is in
    XLA_FLAGS: cache entries produced under that flag have been observed to
    be served to later flagless runs with corrupted executables (see
    tests/conftest.py note), so virtual-mesh test/dryrun processes must never
    share the cache with production runs."""
    import os

    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
