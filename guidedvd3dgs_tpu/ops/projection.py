"""Per-Gaussian preprocessing: EWA projection, conic, SH color (L1).

This is the pure-JAX, fully differentiable equivalent of the reference CUDA
`preprocessCUDA` (reference: cuda_rasterizer/forward.cu:156-258), shared by
the dense oracle rasterizer and the Pallas tile rasterizer. All matrix-layout
conventions follow the reference: `viewmatrix`/`projmatrix` are stored
TRANSPOSED (row-vector convention, points multiply from the left), exactly as
`Camera.world_view_transform` / `full_proj_transform` in the reference
(reference: scene/cameras.py:56-62).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.utils import sh as sh_utils
from guidedvd3dgs_tpu.utils.general import covariance_from_scaling_rotation

NEAR_CLIP = 0.2  # reference: auxiliary.h in_frustum (p_view.z <= 0.2 culled)
COV2D_DILATION = 0.3  # low-pass filter, reference: forward.cu:229-231
ALPHA_EPS = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


class RasterCamera(NamedTuple):
    """Static-per-compilation camera for the rasterizer.

    viewmatrix: (4,4) transposed world-to-view (row-vector convention)
    projmatrix: (4,4) transposed full projection (world -> NDC), i.e.
        world_view_transform @ projection_matrix in reference layout
    campos: (3,) camera center in world space
    tanfovx/tanfovy: scalars (may be traced)
    height/width: python ints (static)
    """

    viewmatrix: jnp.ndarray
    projmatrix: jnp.ndarray
    campos: jnp.ndarray
    tanfovx: float
    tanfovy: float
    height: int
    width: int


# height/width are static metadata
jax.tree_util.register_pytree_node(
    RasterCamera,
    lambda c: ((c.viewmatrix, c.projmatrix, c.campos, c.tanfovx, c.tanfovy), (c.height, c.width)),
    lambda aux, ch: RasterCamera(*ch, aux[0], aux[1]),
)


class ProcessedGaussians(NamedTuple):
    means2d: jnp.ndarray  # (N, 2) pixel coordinates
    depths: jnp.ndarray  # (N,) view-space z
    conics: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    radii: jnp.ndarray  # (N,) int32 screen radius; 0 => culled
    colors: jnp.ndarray  # (N, 3)
    opacities: jnp.ndarray  # (N,)
    visible: jnp.ndarray  # (N,) bool


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    # reference: auxiliary.h ndc2Pix
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: RasterCamera,
) -> jnp.ndarray:
    """EWA projection of 3D covariance to 2D (reference: forward.cu:75-118).

    cov3d: (N, 6) packed [xx, xy, xz, yy, yz, zz]. Returns (N, 3)
    [cov_xx, cov_xy, cov_yy] with the +0.3 dilation applied.
    """
    ones = jnp.ones((*means3d.shape[:-1], 1), means3d.dtype)
    t = (jnp.concatenate([means3d, ones], -1) @ cam.viewmatrix)[..., :3]

    focal_x = cam.width / (2.0 * cam.tanfovx)
    focal_y = cam.height / (2.0 * cam.tanfovy)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tz = t[..., 2]
    txtz = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    zeros = jnp.zeros_like(tz)
    # J rows follow the glm column-major construction in the reference
    J = jnp.stack(
        [
            jnp.stack([focal_x / tz, zeros, zeros], -1),
            jnp.stack([zeros, focal_y / tz, zeros], -1),
            jnp.stack([-(focal_x * txtz) / (tz * tz), -(focal_y * tytz) / (tz * tz), zeros], -1),
        ],
        axis=-2,
    )  # (N, 3, 3)

    W = cam.viewmatrix[:3, :3]  # math-layout W of the reference glm code
    T = jnp.einsum("rc,ncd->nrd", W, J)

    c = cov3d
    Vrk = jnp.stack(
        [
            jnp.stack([c[..., 0], c[..., 1], c[..., 2]], -1),
            jnp.stack([c[..., 1], c[..., 3], c[..., 4]], -1),
            jnp.stack([c[..., 2], c[..., 4], c[..., 5]], -1),
        ],
        axis=-2,
    )
    cov = jnp.einsum("nrc,nrd,nde->nce", T, Vrk, T)  # T^T Vrk T
    return jnp.stack(
        [cov[..., 0, 0] + COV2D_DILATION, cov[..., 0, 1], cov[..., 1, 1] + COV2D_DILATION],
        axis=-1,
    )


def preprocess_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    cam: RasterCamera,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
) -> ProcessedGaussians:
    """Project N Gaussians to screen space (differentiable).

    Inputs are post-activation (scales exp'd, rotations normalized, opacities
    sigmoided) as handed to the reference rasterizer by `render()`
    (reference: gaussian_renderer/__init__.py:93-101). `active_mask` excludes
    capacity-padding rows of the fixed-size Gaussian state (TPU addition; in
    the reference all rows are real).
    """
    ones = jnp.ones((*means3d.shape[:-1], 1), means3d.dtype)
    homog = jnp.concatenate([means3d, ones], -1)
    p_view = (homog @ cam.viewmatrix)[..., :3]
    p_hom = homog @ cam.projmatrix
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]

    in_front = p_view[..., 2] > NEAR_CLIP

    if cov3d_precomp is None:
        cov3d = covariance_from_scaling_rotation(scales, scale_modifier, rotations)
    else:
        cov3d = cov3d_precomp
    cov2d = compute_cov2d(means3d, cov3d, cam)

    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv], axis=-1
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    means2d = jnp.stack(
        [ndc2pix(p_proj[..., 0], cam.width), ndc2pix(p_proj[..., 1], cam.height)], axis=-1
    )

    if colors_precomp is None:
        dirs = means3d - cam.campos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        # shs: (N, K, 3) -> eval per channel; reference stores (K, 3) per point
        color = sh_utils.eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5
        color = jnp.maximum(color, 0.0)
    else:
        color = colors_precomp

    visible = in_front & det_ok
    if active_mask is not None:
        visible = visible & active_mask
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    return ProcessedGaussians(
        means2d=means2d,
        depths=p_view[..., 2],
        conics=conic,
        radii=radii,
        colors=color,
        opacities=jnp.reshape(opacities, opacities.shape[: means3d.ndim - 1] + (-1,))[..., 0],
        visible=visible,
    )
