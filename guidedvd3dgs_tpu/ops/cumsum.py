"""Exact blocked cumulative sum for integer-valued arrays (L1 helper).

`jnp.cumsum` lowers to an O(n log n) pass structure on TPU (~3.3 ms at
N=1M); the binner runs it every render to turn per-Gaussian instance
counts into slot offsets (reference analogue: cub::DeviceScan::InclusiveSum,
rasterizer_impl.cu:278). This replaces it with a two-level matmul scan on
the MXU (~0.3 ms at N=1M):

  reshape (B, 128) -> row-inclusive scan = x @ U (upper-tri ones)
  row totals -> recursive scan of B totals -> broadcast add

Exactness: HIGHEST-precision matmuls are exact f32, and f32 addition of
integers is exact below 2^24 — which ops/tiling.py asserts for the
instance capacity (the only caller at scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LANE = 128


def _inclusive_f32(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    if n <= _LANE * _LANE // 4:
        return jnp.cumsum(x)
    b = -(-n // _LANE)
    xp = jnp.zeros((b * _LANE,), jnp.float32).at[:n].set(x).reshape(b, _LANE)
    tri = jnp.triu(jnp.ones((_LANE, _LANE), jnp.float32))
    rows = jax.lax.dot(
        xp, tri, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    totals = rows[:, -1]
    offs = _inclusive_f32(totals) - totals  # exclusive offsets per row
    return (rows + offs[:, None]).reshape(-1)[:n]


def cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inclusive cumsum of non-negative int32 x (total < 2^24)."""
    return _inclusive_f32(x.astype(jnp.float32)).astype(jnp.int32)
