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
    # Tight per-axis binning extents (pixels): half-widths of the axis-
    # aligned bbox of the alpha >= 1/255 level set {d : d^T conic d <= 2L},
    # L = ln(255*op) — sqrt(2L*Sigma_xx), sqrt(2L*Sigma_yy) — capped at the
    # reference 3-sigma radius so rects are never larger than the
    # reference's (auxiliary.h getRect). Pixels outside the bbox satisfy
    # alpha < 1/255 and are dropped by the blend threshold, so tightening
    # the rect is output-identical while shrinking instance demand (the
    # dominant cost scale of the sort/blend pipeline). -TILE marks
    # never-visible splats (op < 1/255): their rect degenerates to w = 0.
    ext_x: jnp.ndarray  # (N,) f32
    ext_y: jnp.ndarray  # (N,) f32


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    # reference: auxiliary.h ndc2Pix
    return ((v + 1.0) * size - 1.0) * 0.5


def _cov3d_components_t(s_t, scale_modifier, q_t):
    """Σ = R S Sᵀ Rᵀ from COMPONENT TUPLES s_t = (sx, sy, sz) and
    q_t = (qr, qx, qy, qz) of identically-shaped arrays — the shared core of
    `_cov3d_components` and the fused Pallas preprocess kernel (which holds
    per-component (1, BLK) rows, never (N, k) tensors)."""
    norm = jnp.sqrt(
        jnp.maximum(
            q_t[0] * q_t[0] + q_t[1] * q_t[1] + q_t[2] * q_t[2] + q_t[3] * q_t[3],
            1e-20,
        )
    )
    r = q_t[0] / norm
    x = q_t[1] / norm
    y = q_t[2] / norm
    z = q_t[3] / norm
    R = (
        (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)),
        (2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)),
        (2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)),
    )
    # clamp: activated scales are exp(raw) and a runaway raw scale (inf s2)
    # would NaN the VJP of every quantity touching cov3d (0 cotangent x inf
    # partial) even though the Gaussian itself gets culled downstream
    s = (
        jnp.minimum(scale_modifier * s_t[0], 1e9),
        jnp.minimum(scale_modifier * s_t[1], 1e9),
        jnp.minimum(scale_modifier * s_t[2], 1e9),
    )
    # L = R diag(s); Σ_ab = Σ_j L[a][j] L[b][j] = Σ_j s_j² R[a][j] R[b][j]
    s2 = (s[0] * s[0], s[1] * s[1], s[2] * s[2])

    def sig(a, b):
        return (
            s2[0] * R[a][0] * R[b][0]
            + s2[1] * R[a][1] * R[b][1]
            + s2[2] * R[a][2] * R[b][2]
        )

    return (sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2))


def _cov3d_components(scales, scale_modifier, rotations):
    """Σ = R S Sᵀ Rᵀ as six (…,) component arrays [xx, xy, xz, yy, yz, zz]
    (reference computeCov3D, forward.cu:118-154; scalarized so XLA keeps
    everything elementwise on the VPU — (N, 3, 3) intermediates would be
    lane-padded ~14x and batched-matmul'd on TPU)."""
    return _cov3d_components_t(
        tuple(scales[..., i] for i in range(3)),
        scale_modifier,
        tuple(rotations[..., i] for i in range(4)),
    )


def compute_cov2d_components_t(
    tx, ty, tz, cov3d, W, tanfovx, tanfovy, width: int, height: int
):
    """EWA projection of 3D covariance to 2D (reference: forward.cu:75-118),
    scalarized. (tx, ty, tz) is the view-space position; cov3d is the
    6-tuple of component arrays; W is a 3x3 nested tuple of scalars (the
    view rotation — tuple form so the Pallas kernel can pass (1,1) slices).
    Returns (cov_xx, cov_xy, cov_yy) with the +0.3 dilation applied."""
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = jnp.clip(tx / tz, -limx, limx) * tz
    tytz = jnp.clip(ty / tz, -limy, limy) * tz

    # J columns 0/1 (column 2 is all zero and never contributes):
    # J[0][0] = fx/tz, J[1][1] = fy/tz,
    # J[2][0] = -fx·tx/tz², J[2][1] = -fy·ty/tz²
    j00 = focal_x / tz
    j11 = focal_y / tz
    j20 = -(focal_x * txtz) / (tz * tz)
    j21 = -(focal_y * tytz) / (tz * tz)

    u = tuple(W[r][0] * j00 + W[r][2] * j20 for r in range(3))  # T[:,0]
    v = tuple(W[r][1] * j11 + W[r][2] * j21 for r in range(3))  # T[:,1]

    c0, c1, c2, c3, c4, c5 = cov3d  # xx xy xz yy yz zz

    def quad(a, b):
        return (
            c0 * a[0] * b[0]
            + c3 * a[1] * b[1]
            + c5 * a[2] * b[2]
            + c1 * (a[0] * b[1] + a[1] * b[0])
            + c2 * (a[0] * b[2] + a[2] * b[0])
            + c4 * (a[1] * b[2] + a[2] * b[1])
        )

    return (quad(u, u) + COV2D_DILATION, quad(u, v), quad(v, v) + COV2D_DILATION)


def compute_cov2d_components(tx, ty, tz, cov3d, cam: RasterCamera):
    """Array-camera wrapper of `compute_cov2d_components_t`."""
    W = cam.viewmatrix[:3, :3]
    Wt = tuple(tuple(W[r, c] for c in range(3)) for r in range(3))
    return compute_cov2d_components_t(
        tx, ty, tz, cov3d, Wt, cam.tanfovx, cam.tanfovy, cam.width, cam.height
    )


def _eval_sh_channels(deg: int, sh48, dx, dy, dz, active_degree=None):
    """Scalarized SH evaluation: sh48 is a list of (deg+1)² basis slots, each
    a 3-tuple of (…,) channel arrays; returns 3 channel arrays
    (reference utils/sh_utils.py:22-80 / forward.cu:20-71; the rasterizer
    caps at degree 3 like the CUDA path).

    `active_degree` (optional traced f32 scalar <= deg) masks whole bands
    dynamically, so the SH-degree warmup schedule (reference
    train_baseline.py:65-67, +1 every 500 iters) does NOT change the traced
    program — one compile serves all warmup stages. Masked bands get zero
    basis, hence zero gradients, exactly like the static lower-degree path."""
    from guidedvd3dgs_tpu.utils.sh import C0, C1, C2, C3

    assert 0 <= deg <= 3
    if active_degree is None:
        bs = [1.0, 1.0, 1.0, 1.0]
    else:
        bs = [1.0] + [
            (active_degree >= b).astype(jnp.float32) for b in (1.0, 2.0, 3.0)
        ]
    basis = [jnp.full_like(dx, C0)]
    if deg > 0:
        basis += [bs[1] * -C1 * dy, bs[1] * C1 * dz, bs[1] * -C1 * dx]
        if deg > 1:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            xy, yz, xz = dx * dy, dy * dz, dx * dz
            basis += [
                bs[2] * C2[0] * xy, bs[2] * C2[1] * yz,
                bs[2] * C2[2] * (2.0 * zz - xx - yy),
                bs[2] * C2[3] * xz, bs[2] * C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    bs[3] * C3[0] * dy * (3 * xx - yy),
                    bs[3] * C3[1] * xy * dz,
                    bs[3] * C3[2] * dy * (4 * zz - xx - yy),
                    bs[3] * C3[3] * dz * (2 * zz - 3 * xx - 3 * yy),
                    bs[3] * C3[4] * dx * (4 * zz - xx - yy),
                    bs[3] * C3[5] * dz * (xx - yy),
                    bs[3] * C3[6] * dx * (xx - 3 * yy),
                ]
    out = []
    for ch in range(3):
        acc = basis[0] * sh48[0][ch]
        for k in range(1, len(basis)):
            acc = acc + basis[k] * sh48[k][ch]
        out.append(acc)
    return out


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: RasterCamera,
) -> jnp.ndarray:
    """(N, 6)-packed cov3d -> (N, 3) [cov_xx, cov_xy, cov_yy] (kept for the
    dense-oracle API; delegates to the scalarized implementation)."""
    ones = jnp.ones((*means3d.shape[:-1], 1), means3d.dtype)
    t = jnp.matmul(
        jnp.concatenate([means3d, ones], -1), cam.viewmatrix,
        precision=jax.lax.Precision.HIGHEST,
    )[..., :3]
    comps = compute_cov2d_components(
        t[..., 0], t[..., 1], t[..., 2],
        tuple(cov3d[..., i] for i in range(6)), cam,
    )
    return jnp.stack(comps, axis=-1)


def preprocess_field_rows(
    m_t,
    s_t,
    q_t,
    op_row,
    sh48,
    V,
    Pm,
    campos_t,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    sh_degree: int,
    scale_modifier: float,
    active_degree=None,
    color_t=None,
    cov3d_t=None,
):
    """Shape-agnostic preprocess core over COMPONENT arrays (each argument a
    tuple of identically-shaped arrays; V/Pm are 4x4 nested tuples of scalar
    arrays, campos_t a 3-tuple). Shared verbatim by the XLA path
    (`preprocess_gaussians`) and the fused Pallas kernels
    (ops/preprocess_pallas.py), which trace it — and jax.vjp of it — on
    (1, BLK) row vectors inside the kernel body.

    Returns (fields10, radius, visible, ext_x, ext_y):
      fields10 = (mx2d, my2d, conic_a, conic_b, conic_c, op, r, g, b, depth)
      — the differentiable render-field rows in ops/tiling.py F_* order;
      radius/ext are binning-only (not differentiated); visible is bool
      WITHOUT the active_mask (applied by callers).
    """
    mx, my, mz = m_t

    def xform(mat, col):
        return mx * mat[0][col] + my * mat[1][col] + mz * mat[2][col] + mat[3][col]

    tvx, tvy, tvz = xform(V, 0), xform(V, 1), xform(V, 2)
    ph_x, ph_y, ph_w = xform(Pm, 0), xform(Pm, 1), xform(Pm, 3)

    in_front = tvz > NEAR_CLIP

    # Safe-where guards, load-bearing for training stability: the CUDA
    # reference EARLY-RETURNS culled Gaussians before any cov2D math
    # (reference forward.cu:165-171), but this masked whole-array compute
    # evaluates every row. A Gaussian drifting to view-space z == 0 (one hit
    # a bit-exact 0.0 in a real run) makes fx/tz = inf -> NaN conic; the
    # forward masks it (visible=False) but (a) the NaN rides along in the
    # binning field table, where the expansion kernel's windowed one-hot
    # matmul turns NaN*0 into NaN for every instance sharing the window, and
    # the segsum carry then poisons every later Gaussian id; (b) jax.grad of
    # where(mask, safe, unsafe) is NaN whenever the unsafe branch is
    # non-finite (0 cotangent * inf partial). One poisoned step NaN'd the
    # whole model 6k iterations into a real training run.
    tz_safe = jnp.where(in_front, tvz, jnp.ones_like(tvz))
    p_w = 1.0 / jnp.where(in_front, ph_w + 1e-7, jnp.ones_like(ph_w))

    if cov3d_t is None:
        cov3d = _cov3d_components_t(s_t, scale_modifier, q_t)
    else:
        cov3d = cov3d_t
    W3 = tuple(tuple(V[r][c] for c in range(3)) for r in range(3))
    cxx, cxy, cyy = compute_cov2d_components_t(
        tvx, tvy, tz_safe, cov3d, W3, tanfovx, tanfovy, width, height
    )

    det = cxx * cyy - cxy * cxy
    # isfinite: exploding scales (exp overflow) must cull, not NaN the conic
    det_ok = (det != 0.0) & jnp.isfinite(det)
    cxx_s = jnp.where(det_ok, cxx, jnp.ones_like(cxx))
    cxy_s = jnp.where(det_ok, cxy, jnp.zeros_like(cxy))
    cyy_s = jnp.where(det_ok, cyy, jnp.ones_like(cyy))
    det_s = cxx_s * cyy_s - cxy_s * cxy_s
    det_inv = 1.0 / det_s
    conic = (cyy_s * det_inv, -cxy_s * det_inv, cxx_s * det_inv)

    mid = 0.5 * (cxx_s + cyy_s)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_s))
    # cap below int32 range: a visible whole-screen Gaussian clamps to the
    # tile grid in binning anyway, but the int32 cast must not wrap
    radius = jnp.minimum(
        jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12))), 2.0**30
    )

    # tight binning extents (see ProcessedGaussians.ext_x): per-axis bbox of
    # the alpha >= 1/255 level set, capped at the reference radius. The
    # 1.001 factor absorbs f32 rounding so the bbox stays conservative.
    lvl = jnp.log(jnp.maximum(op_row, 1e-12) * 255.0)
    ever_visible = lvl > 0.0
    ext_x = jnp.minimum(jnp.sqrt(jnp.maximum(2.0 * lvl * cxx_s, 0.0)) * 1.001, radius)
    ext_y = jnp.minimum(jnp.sqrt(jnp.maximum(2.0 * lvl * cyy_s, 0.0)) * 1.001, radius)
    ext_x = jnp.where(ever_visible, ext_x, -16.0)
    ext_y = jnp.where(ever_visible, ext_y, -16.0)

    mx2d = ndc2pix(ph_x * p_w, width)
    my2d = ndc2pix(ph_y * p_w, height)

    if color_t is None:
        dx = mx - campos_t[0]
        dy = my - campos_t[1]
        dz = mz - campos_t[2]
        # max-guard: a mean coinciding with the camera center would give
        # 1/sqrt(0) = inf (NaN gradients); such a Gaussian is behind the
        # near plane and culled, but its row must stay finite (see above)
        inv_n = 1.0 / jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20))
        dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n
        r, g, b = _eval_sh_channels(sh_degree, sh48, dx, dy, dz, active_degree)
        cr = jnp.maximum(r + 0.5, 0.0)
        cg = jnp.maximum(g + 0.5, 0.0)
        cb = jnp.maximum(b + 0.5, 0.0)
    else:
        cr, cg, cb = color_t

    visible = in_front & det_ok
    fields10 = (mx2d, my2d, conic[0], conic[1], conic[2], op_row, cr, cg, cb, tvz)
    return fields10, radius, visible, ext_x, ext_y


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
    active_degree: Optional[jnp.ndarray] = None,
) -> ProcessedGaussians:
    """Project N Gaussians to screen space (differentiable).

    Inputs are post-activation (scales exp'd, rotations normalized, opacities
    sigmoided) as handed to the reference rasterizer by `render()`
    (reference: gaussian_renderer/__init__.py:93-101). `active_mask` excludes
    capacity-padding rows of the fixed-size Gaussian state (TPU addition; in
    the reference all rows are real).
    """
    # Scalarized throughout: every quantity is a (…,) component array so XLA
    # keeps the whole preprocess a single fused elementwise pass (packing
    # into (N, 3)/(N, 3, 3) intermediates would lane-pad 14-42x on TPU and
    # turn the tiny per-Gaussian matmuls into batched dots).
    V, P = cam.viewmatrix, cam.projmatrix
    Vt = tuple(tuple(V[r, c] for c in range(4)) for r in range(4))
    Pt = tuple(tuple(P[r, c] for c in range(4)) for r in range(4))
    op_row = jnp.reshape(opacities, opacities.shape[: means3d.ndim - 1] + (-1,))[..., 0]
    sh48 = None
    if colors_precomp is None:
        n_coef = (sh_degree + 1) ** 2
        # One layout change instead of 3*n_coef strided slices: pulling
        # coefficient columns directly out of the (..., K, 3) tensor makes
        # XLA stream the whole 192 MB (at 1M Gaussians) table once PER
        # COEFFICIENT — and the VJP scatter back is as bad (measured: SH
        # accounted for ~30 of 36 ms of the preprocess backward,
        # tools/profile_preproc.py). moveaxis gives (3K, ...) with each
        # coefficient a contiguous row; its transpose-VJP is one pass too.
        sh_rows = jnp.moveaxis(
            shs.reshape(*shs.shape[:-2], shs.shape[-2] * 3), -1, 0
        )
        sh48 = [
            (sh_rows[3 * k], sh_rows[3 * k + 1], sh_rows[3 * k + 2])
            for k in range(n_coef)
        ]
    fields10, radius, visible, ext_x, ext_y = preprocess_field_rows(
        tuple(means3d[..., i] for i in range(3)),
        tuple(scales[..., i] for i in range(3)),
        tuple(rotations[..., i] for i in range(4)),
        op_row,
        sh48,
        Vt,
        Pt,
        tuple(cam.campos[i] for i in range(3)),
        cam.tanfovx,
        cam.tanfovy,
        cam.width,
        cam.height,
        sh_degree,
        scale_modifier,
        active_degree=active_degree,
        color_t=(
            None if colors_precomp is None
            else tuple(colors_precomp[..., i] for i in range(3))
        ),
        cov3d_t=(
            None if cov3d_precomp is None
            else tuple(cov3d_precomp[..., i] for i in range(6))
        ),
    )
    (mx2d, my2d, ca, cb, cc, op_row, cr, cg, cbl, depths) = fields10
    if active_mask is not None:
        visible = visible & active_mask
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    return ProcessedGaussians(
        means2d=jnp.stack([mx2d, my2d], axis=-1),
        depths=depths,
        conics=jnp.stack([ca, cb, cc], axis=-1),
        radii=radii,
        colors=jnp.stack([cr, cg, cbl], axis=-1),
        opacities=op_row,
        visible=visible,
        ext_x=ext_x,
        ext_y=ext_y,
    )
