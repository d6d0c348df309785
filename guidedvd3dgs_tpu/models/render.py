"""Render API (L2): Gaussian state -> image dict.

Functional equivalent of the reference `gaussian_renderer.render()`
(reference: gaussian_renderer/__init__.py:19-132): activations, confidence
gradient rescaling, rasterizer call, returning color/depth/alpha/radii and
the screen-space gradient hook used for densification statistics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.ops.raster import rasterize
from guidedvd3dgs_tpu.ops.raster_dense import RenderOutput


@jax.custom_vjp
def _confidence_grad_scale(x: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """Identity whose cotangent is multiplied by per-Gaussian confidence —
    exactly the reference's backward-only grad rescaling
    (reference: diff_gaussian_rasterization/__init__.py:147-156)."""
    return x


def _cgs_fwd(x, conf):
    return x, (conf, x.ndim)


def _cgs_bwd(res, g):
    conf, ndim = res
    c = conf.reshape(conf.shape[:1] + (1,) * (ndim - 1))
    return (g * c, None)


_confidence_grad_scale.defvjp(_cgs_fwd, _cgs_bwd)


class RenderResult(NamedTuple):
    color: jnp.ndarray  # (3, H, W)
    depth: jnp.ndarray  # (H, W)
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (C,)
    visibility_filter: jnp.ndarray  # (C,) bool == radii > 0
    overflow: Optional[jnp.ndarray] = None  # () int32, tile-backend instance drop count
    num_instances: Optional[jnp.ndarray] = None  # () int32, tile-backend instance demand


def render_gaussians(
    params: G.GaussianParams,
    active: jnp.ndarray,
    confidence: jnp.ndarray,
    cam: RasterCamera,
    bg: jnp.ndarray,
    active_sh_degree: int,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    use_confidence: bool = False,
    backend: str = "auto",
    max_instances: int = 0,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Differentiable render of the (possibly capacity-padded) Gaussian set.

    `means2d_offset`: pass zeros (C, 2) and take grad w.r.t. it to obtain the
    viewspace gradients for densification (same contract as the reference's
    `screenspace_points` with retain_grad,
    reference: gaussian_renderer/__init__.py:28-32).
    """
    if use_confidence:
        conf = confidence[:, 0]
        p = G.GaussianParams(
            xyz=_confidence_grad_scale(params.xyz, conf),
            features_dc=_confidence_grad_scale(params.features_dc, conf),
            features_rest=_confidence_grad_scale(params.features_rest, conf),
            scaling=_confidence_grad_scale(params.scaling, conf),
            rotation=_confidence_grad_scale(params.rotation, conf),
            opacity=_confidence_grad_scale(params.opacity, conf),
        )
    else:
        p = params

    shs = None if override_color is not None else G.get_features(p)
    out: RenderOutput = rasterize(
        p.xyz,
        G.get_scaling(p),
        G.get_rotation(p),
        G.get_opacity(p),
        shs,
        cam,
        bg,
        sh_degree=active_sh_degree,
        scale_modifier=scaling_modifier,
        colors_precomp=override_color,
        means2d_offset=means2d_offset,
        active_mask=active,
        backend=backend,
        max_instances=max_instances,
        active_degree=active_degree,
    )
    return RenderResult(
        color=out.color,
        depth=out.depth,
        alpha=out.alpha,
        radii=out.radii,
        visibility_filter=out.radii > 0,
        overflow=out.overflow,
        num_instances=out.num_instances,
    )


def render_state(
    state: G.GaussianState,
    cam: RasterCamera,
    bg: jnp.ndarray,
    active_sh_degree: int,
    **kwargs,
) -> RenderResult:
    return render_gaussians(
        state.params, state.active, state.confidence, cam, bg, active_sh_degree, **kwargs
    )


def render_gaussians_multi(
    params: G.GaussianParams,
    active: jnp.ndarray,
    confidence: jnp.ndarray,
    cams: RasterCamera,  # leaves stacked (B, ...)
    bg: jnp.ndarray,
    active_sh_degree: int,
    scaling_modifier: float = 1.0,
    means2d_offset: Optional[jnp.ndarray] = None,  # (B, C, 2)
    use_confidence: bool = False,
    backend: str = "auto",
    max_instances: int = 0,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Render B cameras of the SAME Gaussian set through one kernel chain
    (ops/raster.rasterize_multi). RenderResult leaves carry a leading B;
    overflow/num_instances are totals across the batch. Parameter gradients
    sum over the cameras — exactly what a multi-view loss needs (the
    reference accumulates train-view + pseudo-view backward passes into the
    same .grad buffers, train_guidedvd.py:383)."""
    from guidedvd3dgs_tpu.ops.raster import rasterize_multi

    if use_confidence:
        conf = confidence[:, 0]
        p = G.GaussianParams(
            xyz=_confidence_grad_scale(params.xyz, conf),
            features_dc=_confidence_grad_scale(params.features_dc, conf),
            features_rest=_confidence_grad_scale(params.features_rest, conf),
            scaling=_confidence_grad_scale(params.scaling, conf),
            rotation=_confidence_grad_scale(params.rotation, conf),
            opacity=_confidence_grad_scale(params.opacity, conf),
        )
    else:
        p = params

    out: RenderOutput = rasterize_multi(
        p.xyz,
        G.get_scaling(p),
        G.get_rotation(p),
        G.get_opacity(p),
        G.get_features(p),
        cams,
        bg,
        sh_degree=active_sh_degree,
        scale_modifier=scaling_modifier,
        means2d_offset=means2d_offset,
        active_mask=active,
        backend=backend,
        max_instances=max_instances,
        active_degree=active_degree,
    )
    return RenderResult(
        color=out.color,
        depth=out.depth,
        alpha=out.alpha,
        radii=out.radii,
        visibility_filter=out.radii > 0,
        overflow=out.overflow,
        num_instances=out.num_instances,
    )
