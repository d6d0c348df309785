"""Approximate 3-nearest-neighbor distances via Morton-sorted windows (L1).

TPU-native replacement for the reference `simple-knn` CUDA extension
(reference: submodules/simple-knn/simple_knn.cu:192-228, spatial.cu:15-27):
`distCUDA2(points) -> (mean_sq_dists, nearest_3_indices)`. The reference is
itself approximate (Morton sort + 1024-point box culling); here we Morton-sort
and search a +/-WINDOW neighborhood in the sorted order — static shapes, no
atomics, XLA sort + top_k. Accuracy is comparable (both can miss a true NN
across distant Morton blocks, which does not matter for the scale-init /
densify-threshold use cases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WINDOW = 32  # candidates on each side in Morton order


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (standard Morton magic numbers)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes of points normalized into the active bounding box."""
    big = jnp.float32(1e30)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    pmax = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    extent = jnp.maximum(pmax - pmin, 1e-9)
    q = jnp.clip((points - pmin) / extent, 0.0, 1.0)
    cells = jnp.minimum((q * 1024.0).astype(jnp.uint32), 1023)
    ex = _expand_bits(cells[:, 0])
    ey = _expand_bits(cells[:, 1])
    ez = _expand_bits(cells[:, 2])
    return (ex << 2) | (ey << 1) | ez


def knn3(points: jnp.ndarray, mask: jnp.ndarray | None = None, window: int = WINDOW):
    """Return (mean_sq_dist, indices) of the 3 approximate nearest neighbors.

    points: (N, 3); mask: (N,) bool of valid rows (padding rows get 0 / self
    indices). Matches the `distCUDA2` contract used by the reference at
    scene/gaussian_model.py:156 (scale init), :450 (split criterion) and
    :421 (proximity).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)

    codes = morton_codes(points, mask)
    # push masked-out points to the end of the sorted order
    sort_key = jnp.where(mask, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(sort_key)
    sorted_pts = points[order]
    sorted_mask = mask[order]

    # window of candidate neighbors in sorted order (excluding self)
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    pos = jnp.arange(n)[:, None] + offs[None, :]  # (N, 2W)
    pos = jnp.clip(pos, 0, n - 1)
    cand_pts = sorted_pts[pos]  # (N, 2W, 3)
    cand_mask = sorted_mask[pos] & (pos != jnp.arange(n)[:, None])

    d2 = jnp.sum((cand_pts - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_mask, d2, jnp.inf)
    neg_top, top_idx = jax.lax.top_k(-d2, 3)  # (N, 3)
    best_d2 = -neg_top
    best_pos = jnp.take_along_axis(pos, top_idx, axis=1)  # sorted-index space
    best_orig = order[best_pos]  # original indexing

    finite = jnp.isfinite(best_d2)
    mean_d2_sorted = jnp.where(
        finite.any(-1), jnp.where(finite, best_d2, 0.0).sum(-1) / jnp.maximum(finite.sum(-1), 1), 0.0
    )

    # scatter back to original order
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    mean_d2 = mean_d2_sorted[inv] * mask
    nn_idx = best_orig[inv]
    nn_idx = jnp.where(mask[:, None], nn_idx, jnp.arange(n)[:, None])
    return mean_d2, nn_idx


def dist_knn3(points: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Alias with the reference name semantics: clamped mean 3-NN squared
    distance (reference: scene/gaussian_model.py:156 clamp_min 1e-7)."""
    d2, idx = knn3(points, mask)
    return jnp.maximum(d2, 1e-7), idx
