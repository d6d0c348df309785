"""Data-parallel 3DGS training step over a device mesh.

The reference trains on ONE camera per iteration on one GPU
(reference: train_baseline.py:58-126). The TPU-native scaling strategy is
camera-batch data parallelism: each chip renders a different camera against
the replicated Gaussian state, the loss is averaged and the parameter
gradients are all-reduced over ICI (XLA inserts the psum from the sharding
annotations), then one masked Adam step updates the replicated state.
Densification statistics are the per-camera sums, matching B sequential
reference iterations that share one optimizer step.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.models.render import render_gaussians
from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.parallel.mesh import DATA_AXIS
from guidedvd3dgs_tpu.utils.losses import l1_loss, psnr, ssim


def stack_cameras(cams: Sequence[RasterCamera]) -> RasterCamera:
    """Stack per-camera pytrees along a new leading batch axis.

    All cameras must share (height, width) — static metadata of the pytree.
    """
    hw = {(c.height, c.width) for c in cams}
    if len(hw) != 1:
        raise ValueError(f"batched cameras must share resolution, got {hw}")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def train_step_dp(
    state: G.GaussianState,
    cams: RasterCamera,  # batched: leaves have leading axis B
    gt_images: jnp.ndarray,  # (B, 3, H, W)
    bg: jnp.ndarray,  # (3,)
    lrs: G.LearningRates,
    sh_degree: int,
    lambda_dssim: float,
    use_confidence: bool = False,
    backend: str = "auto",
    apply_adam: bool = True,
    update_stats: bool = True,
):
    """One data-parallel step: B cameras -> mean loss -> one Adam step."""
    batch = gt_images.shape[0]
    offsets0 = jnp.zeros((batch, state.capacity, 2), jnp.float32)

    def per_cam_loss(params, cam, gt, offset):
        r = render_gaussians(
            params,
            state.active,
            state.confidence,
            cam,
            bg,
            sh_degree,
            means2d_offset=offset,
            use_confidence=use_confidence,
            backend=backend,
        )
        ll1 = l1_loss(r.color, gt)
        loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(r.color, gt))
        return loss, (ll1, psnr(r.color, gt)[0, 0], r.radii, r.visibility_filter)

    def loss_fn(params, offsets):
        losses, aux = jax.vmap(per_cam_loss, in_axes=(None, 0, 0, 0))(
            params, cams, gt_images, offsets
        )
        return losses.mean(), aux

    (loss, (l1s, psnrs, radii_b, vis_b)), (gparams, goffsets) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, offsets0)

    if update_stats:
        # per-camera viewspace grad norms summed over the batch; the loss mean
        # scales each camera's grads by 1/B vs the reference's per-camera
        # backward, so rescale before accumulating the densify statistic
        gnorm = jnp.linalg.norm(goffsets[..., :2], axis=-1) * batch  # (B, C)
        gsum = jnp.sum(jnp.where(vis_b, gnorm, 0.0), axis=0, keepdims=False)
        dsum = jnp.sum(vis_b, axis=0).astype(state.denom.dtype)
        state = state._replace(
            xyz_gradient_accum=state.xyz_gradient_accum + gsum[:, None],
            denom=state.denom + dsum[:, None],
            max_radii2d=jnp.maximum(
                state.max_radii2d,
                jnp.max(jnp.where(vis_b, radii_b.astype(jnp.float32), 0.0), axis=0),
            ),
        )
    if apply_adam:
        state = G.adam_step(state, gparams, lrs)

    metrics = {"loss": loss, "l1": l1s.mean(), "psnr": psnrs.mean()}
    return state, metrics


def make_dp_train_step(
    mesh: Mesh,
    sh_degree: int,
    lambda_dssim: float,
    use_confidence: bool = False,
    backend: str = "auto",
):
    """Jit train_step_dp with explicit shardings over `mesh`:
    state/bg/lrs replicated, camera batch + gt images sharded on DATA_AXIS.
    """
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(DATA_AXIS))

    step = partial(
        train_step_dp,
        sh_degree=sh_degree,
        lambda_dssim=lambda_dssim,
        use_confidence=use_confidence,
        backend=backend,
    )
    return jax.jit(
        step,
        in_shardings=(repl, batched, batched, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
