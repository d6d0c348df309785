"""Dense (all-Gaussians-vs-all-pixels) differentiable rasterizer — the oracle.

Implements exactly the blending semantics of the reference CUDA `renderCUDA`
(reference: cuda_rasterizer/forward.cu:263-381): depth-sorted front-to-back
alpha compositing with alpha clamp 0.99, contribution threshold 1/255,
transmittance termination at 1e-4, and the extra depth/alpha outputs of the
confidence fork. The sequential per-pixel recurrence is rewritten as a
closed-form masked cumulative product so plain JAX autodiff reproduces the
hand-written CUDA backward (reference: backward.cu:416-601) — inclusion
decisions are treated as constants, as the CUDA replay does.

O(N*P) work per chunk; used as the correctness oracle for the Pallas tile
kernel and as the execution path for tiny scenes/tests.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.ops.projection import (
    ALPHA_EPS,
    ALPHA_MAX,
    T_EPS,
    ProcessedGaussians,
    RasterCamera,
    preprocess_gaussians,
)


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # (3, H, W)
    depth: jnp.ndarray  # (H, W) accumulated (unnormalized) depth
    alpha: jnp.ndarray  # (H, W) accumulated alpha weight
    radii: jnp.ndarray  # (N,) int32
    visibility: jnp.ndarray  # (N,) bool, radii > 0
    # tile-backend capacity diagnostics (None for the dense oracle): number
    # of (gaussian, tile) instances dropped because the fixed instance buffer
    # was too small, and the true instance demand. The reference never drops
    # (rasterizer_impl.cu:278-309) — trainers must check overflow and regrow.
    overflow: Optional[jnp.ndarray] = None  # () int32
    num_instances: Optional[jnp.ndarray] = None  # () int32


def _pixel_grid(height: int, width: int, dtype) -> jnp.ndarray:
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (P, 2) as (x, y)


def _chunk_alphas(
    means2d: jnp.ndarray,  # (K, 2)
    conics: jnp.ndarray,  # (K, 3)
    opacities: jnp.ndarray,  # (K,)
    active: jnp.ndarray,  # (K,) bool
    pix: jnp.ndarray,  # (P, 2)
    radii: jnp.ndarray,  # (K,)
    grid_wh: tuple,  # (grid_x, grid_y) in tiles
) -> jnp.ndarray:
    # tile-coverage mask: a Gaussian only touches pixels whose 16x16 tile
    # overlaps its radius rect, exactly like the CUDA binning
    # (reference: auxiliary.h getRect + renderCUDA tile ranges)
    from guidedvd3dgs_tpu.ops.tiling import TILE

    gx, gy = grid_wh
    r = radii.astype(means2d.dtype)
    rminx = jnp.clip(((means2d[:, 0] - r) / TILE).astype(jnp.int32), 0, gx)
    rminy = jnp.clip(((means2d[:, 1] - r) / TILE).astype(jnp.int32), 0, gy)
    rmaxx = jnp.clip(((means2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, gx)
    rmaxy = jnp.clip(((means2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, gy)
    ptx = (pix[:, 0] / TILE).astype(jnp.int32)
    pty = (pix[:, 1] / TILE).astype(jnp.int32)
    in_rect = (
        (ptx[None, :] >= rminx[:, None])
        & (ptx[None, :] < rmaxx[:, None])
        & (pty[None, :] >= rminy[:, None])
        & (pty[None, :] < rmaxy[:, None])
    )

    d = means2d[:, None, :] - pix[None, :, :]  # (K, P, 2)
    dx, dy = d[..., 0], d[..., 1]
    a, b, c = conics[:, 0:1], conics[:, 1:2], conics[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    # exp(power + log(op)) rather than op * exp(power): bit-identical to the
    # tiles kernels' fused single-transcendental form, so threshold
    # comparisons (araw >= 1/255) can't flip between the two backends
    araw = jnp.exp(power + jnp.log(jnp.maximum(opacities[:, None], 1e-37)))
    # 0.99 clamp with pass-through gradient, matching the CUDA backward which
    # differentiates as if unclamped (reference: backward.cu dL_dG path)
    alpha = araw - jax.lax.stop_gradient(jnp.maximum(araw - ALPHA_MAX, 0.0))
    alpha = jnp.where(
        (power <= 0.0) & (araw >= ALPHA_EPS) & active[:, None] & in_rect, alpha, 0.0
    )
    return alpha  # (K, P)


def blend_chunk(carry, chunk_vals, pix, grid_wh):
    """One scan step: composite a depth-ordered chunk of Gaussians onto all
    pixels, honoring the sequential termination rule of the CUDA kernel."""
    T_in, done_in, acc_c, acc_d, acc_a = carry
    means2d, conics, opacities, colors, depths, active, radii = chunk_vals

    alpha = _chunk_alphas(means2d, conics, opacities, active, pix, radii, grid_wh)
    one_minus = 1.0 - alpha
    # exclusive cumulative transmittance within the chunk
    log_om = jnp.log(jnp.maximum(one_minus, 1e-12))
    cum = jnp.cumsum(log_om, axis=0)
    T_before = T_in[None, :] * jnp.exp(cum - log_om)  # shift to exclusive
    T_after = T_before * one_minus

    trigger = (alpha > 0.0) & (T_after < T_EPS)
    done_before = jnp.concatenate(
        [done_in[None, :], done_in[None, :] | jnp.cumsum(trigger, axis=0)[:-1].astype(bool)],
        axis=0,
    )
    include = (alpha > 0.0) & (~done_before) & (~trigger)
    include = jax.lax.stop_gradient(include)

    w = jnp.where(include, alpha * T_before, 0.0)  # (K, P)
    acc_c = acc_c + w.T @ colors  # (P, 3)
    acc_d = acc_d + w.T @ depths[:, None]  # (P, 1)
    acc_a = acc_a + w.sum(0)  # (P,)

    T_out = T_in * jnp.exp(jnp.where(include, log_om, 0.0).sum(0))
    done_out = done_in | trigger.any(0)
    return (T_out, done_out, acc_c, acc_d, acc_a)


def rasterize_dense_processed(
    proc: ProcessedGaussians,
    cam: RasterCamera,
    bg: jnp.ndarray,
    chunk: int = 256,
) -> RenderOutput:
    """Blend already-preprocessed Gaussians. Sorts by view depth then scans
    depth-ordered chunks (differentiable)."""
    n = proc.means2d.shape[0]
    height, width = cam.height, cam.width
    pix = _pixel_grid(height, width, proc.means2d.dtype)
    p = pix.shape[0]

    active = proc.visible & (proc.radii > 0)
    # sort by depth; inactive pushed to the back so they never affect order
    sort_depth = jnp.where(active, proc.depths, jnp.inf)
    order = jnp.argsort(sort_depth)

    means2d = proc.means2d[order]
    conics = proc.conics[order]
    opac = proc.opacities[order]
    colors = proc.colors[order]
    depths = proc.depths[order]
    act = active[order]
    radii = proc.radii[order]

    pad = (-n) % chunk
    if pad:
        means2d = jnp.pad(means2d, ((0, pad), (0, 0)))
        conics = jnp.pad(conics, ((0, pad), (0, 0)), constant_values=1.0)
        opac = jnp.pad(opac, (0, pad))
        colors = jnp.pad(colors, ((0, pad), (0, 0)))
        depths = jnp.pad(depths, (0, pad))
        act = jnp.pad(act, (0, pad))
        radii = jnp.pad(radii, (0, pad))
    num_chunks = (n + pad) // chunk

    def reshape(x):
        return x.reshape(num_chunks, chunk, *x.shape[1:])

    chunks = tuple(
        reshape(x) for x in (means2d, conics, opac, colors, depths, act, radii)
    )

    init = (
        jnp.ones((p,), means2d.dtype),
        jnp.zeros((p,), bool),
        jnp.zeros((p, 3), means2d.dtype),
        jnp.zeros((p, 1), means2d.dtype),
        jnp.zeros((p,), means2d.dtype),
    )

    from guidedvd3dgs_tpu.ops.tiling import TILE

    grid_wh = ((width + TILE - 1) // TILE, (height + TILE - 1) // TILE)

    def step(carry, vals):
        return blend_chunk(carry, vals, pix, grid_wh), None

    (T, _done, acc_c, acc_d, acc_a), _ = jax.lax.scan(step, init, chunks)

    color = (acc_c + T[:, None] * bg[None, :]).T.reshape(3, height, width)
    depth = acc_d[:, 0].reshape(height, width)
    alpha = acc_a.reshape(height, width)
    return RenderOutput(color, depth, alpha, proc.radii, proc.radii > 0)


def rasterize_dense(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    cam: RasterCamera,
    bg: jnp.ndarray,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    chunk: int = 256,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Full dense rasterization: preprocess + blend.

    `means2d_offset` is the differentiable hook for densification statistics:
    a zeros tensor whose gradient equals the CUDA `dL_dmean2D` — i.e. the
    pixel-space screen gradient scaled by (0.5*W, 0.5*H), matching
    reference backward.cu:490,589-590 and the viewspace_points grad consumed
    by `add_densification_stats` (reference: scene/gaussian_model.py:524-544).
    """
    proc = preprocess_gaussians(
        means3d,
        scales,
        rotations,
        opacities,
        shs,
        cam,
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        active_mask=active_mask,
        active_degree=active_degree,
    )
    if means2d_offset is not None:
        scale = jnp.array([0.5 * cam.width, 0.5 * cam.height], proc.means2d.dtype)
        proc = proc._replace(means2d=proc.means2d + means2d_offset * scale)
    return rasterize_dense_processed(proc, cam, bg, chunk=chunk)
