"""Scene-grounding guidance loss (Eq. 6 of the paper).

Equivalent of the reference LossGuidance
(reference: utils/viewcrafter_wrapper.py:47-192): holds the frozen-baseline
3DGS renderings (rgb/mask/depth) resized to the diffusion resolution; per
DDIM step and frame computes the masked reconstruction loss

    L = w_recon * (x_hat0 - guide)^2 * mask        (summed, NOT meaned —
        the reference normalizes by numel outside, see the sampler)

optionally mixed with 0.2 * per-pixel SSIM and numel*0.001*VGG-LPIPS.
Functional: buffers are a NamedTuple, __call__ is a pure function usable as
the sampler's GuidanceFn.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.utils.general import learning_rate_decay
from guidedvd3dgs_tpu.utils.losses import ssim_noavg


class GuidanceBuffers(NamedTuple):
    images: jnp.ndarray  # (T, H, W, 3) in [0, 1], resized to diffusion res
    masks: Optional[jnp.ndarray]  # (T, H, W, 1) or None
    depths: Optional[jnp.ndarray]  # (T, H, W, 1) or None


def resize_guidance(
    images: jnp.ndarray,  # (T, 3, H0, W0) in [0, 1]
    height: int,
    width: int,
    masks: Optional[jnp.ndarray] = None,  # (T, 1, H0, W0)
    depths: Optional[jnp.ndarray] = None,
) -> GuidanceBuffers:
    """Bilinear (images) / nearest (masks, depths) resize to diffusion res
    (reference viewcrafter_wrapper.py:104-121)."""
    t = images.shape[0]
    img = jnp.transpose(images, (0, 2, 3, 1))
    img = jax.image.resize(img, (t, height, width, 3), method="bilinear")
    img = jnp.clip(img, 0.0, 1.0)
    m = d = None
    if masks is not None:
        m = jnp.transpose(masks, (0, 2, 3, 1))
        m = jax.image.resize(m, (t, height, width, 1), method="nearest")
    if depths is not None:
        d = jnp.transpose(depths, (0, 2, 3, 1))
        d = jax.image.resize(d, (t, height, width, 1), method="nearest")
    return GuidanceBuffers(images=img, masks=m, depths=d)


def make_guidance_fn(
    buffers: GuidanceBuffers,
    w_recon: float = 0.5,
    ssim_guidance: bool = False,
    lpips_fn: Optional[Callable] = None,
    recon_loss: str = "l2",
):
    """Build the sampler GuidanceFn
    (reference viewcrafter_wrapper.py:123-165 __call__; recon_loss mirrors
    the --guidance_recon_loss flag — the reference ctor takes it at :53 but
    hardcodes square at :89, so "l2" is the behavioral default and "l1" is
    the honest implementation of the advertised option).

    The returned fn takes (decoded frame (H, W, 3) in [-1, 1], ddim_index,
    frame_idx) and returns (summed loss, numel)."""
    if recon_loss not in ("l1", "l2"):
        raise ValueError(f"recon_loss must be 'l1' or 'l2', got {recon_loss!r}")
    recon_fn = jnp.abs if recon_loss == "l1" else jnp.square

    def guidance_fn(frame: jnp.ndarray, ddim_index, frame_idx):
        d = jnp.clip((frame + 1.0) / 2.0, 0.0, 1.0)  # (H, W, 3) [0,1]
        g = buffers.images[frame_idx]
        if buffers.masks is None:
            mask = jnp.ones_like(d)
        else:
            mask = jnp.broadcast_to(buffers.masks[frame_idx], d.shape)
        loss = (w_recon * recon_fn(d - g) * mask).sum()
        numel = mask.sum()
        if ssim_guidance:
            # per-pixel SSIM map on (3, H, W) layout (reference :134-140)
            sm = 1.0 - ssim_noavg(
                jnp.transpose(d, (2, 0, 1)), jnp.transpose(g, (2, 0, 1)),
                mask=jnp.transpose(mask, (2, 0, 1)),
            )
            loss = 0.8 * loss + 0.2 * sm.sum()
        if lpips_fn is not None:
            loss = loss + numel * lpips_fn(d, g, mask) * 0.001
        return loss, numel

    return guidance_fn


def guidance_weight_schedule(step: int, max_steps: int = 2500) -> float:
    """Optional guidance-weight warmup 0.01 -> 1.0
    (reference viewcrafter_wrapper.py:92-99 + :654-691)."""
    return float(learning_rate_decay(step, lr_init=0.01, lr_final=1.0, max_steps=max_steps))
