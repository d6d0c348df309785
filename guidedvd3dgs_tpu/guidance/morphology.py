"""Binary mask morphology (erosion/dilation) on TPU.

Equivalent of the reference's scipy.ndimage binary_erosion/dilation calls
(reference: utils/viewcrafter_wrapper.py:602-651: decide_unobserved_regions =
(render sum == 0) -> erode(3) -> dilate(5); process_mask = erode(5);
process_mask2 = erode(5) -> dilate(10)), rebuilt as reduce_window min/max —
jit-friendly, no host round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _window(x: jnp.ndarray, size: int, op, init):
    # scipy pads with border_value=0 for both erosion and dilation — pad
    # explicitly with 0 and use a VALID window
    pad = size // 2
    lo, hi = pad, size - 1 - pad
    xp = jnp.pad(x, ((lo, hi), (lo, hi)))
    return lax.reduce_window(xp, init, op, (size, size), (1, 1), "VALID")


def erode(mask: jnp.ndarray, size: int = 3) -> jnp.ndarray:
    """Binary erosion with an all-ones structuring element, scipy
    border_value=0 semantics. mask: (H, W) float or bool in {0, 1}."""
    m = mask.astype(jnp.float32)
    return _window(m, size, lax.min, jnp.float32(1.0))


def dilate(mask: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return _window(m, size, lax.max, jnp.float32(0.0))


def unobserved_regions(renders: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, H, W) renders in [0,1] -> (N, 1, H, W) masks of unobserved
    pixels: (sum==0) eroded(3) then dilated(5)
    (reference viewcrafter_wrapper.py:602-617)."""
    empty = (renders.sum(axis=1) == 0.0).astype(jnp.float32)  # (N, H, W)

    def per(m):
        return dilate(erode(m, 3), 5)

    import jax

    return jax.vmap(per)(empty)[:, None]


def process_mask(masks: jnp.ndarray, erode_size: int = 5) -> jnp.ndarray:
    """(N, 1, H, W) -> eroded masks (reference :633-645)."""
    import jax

    return jax.vmap(lambda m: erode(m, erode_size))(masks[:, 0])[:, None]


def process_mask2(masks: jnp.ndarray) -> jnp.ndarray:
    """erode(5) then dilate(10) (reference :647-658)."""
    import jax

    return jax.vmap(lambda m: dilate(erode(m, 5), 10))(masks[:, 0])[:, None]
