"""Public rasterization API (L1→L2 boundary).

`rasterize(...)` is the TPU-native equivalent of the reference
`GaussianRasterizer.__call__` (reference:
diff_gaussian_rasterization/__init__.py:192-225): it returns color, depth,
alpha, radii. Backend selection:

  - "dense": pure-JAX O(N*P) oracle (tiny scenes, tests, autodiff-by-XLA)
  - "tiles": Pallas tile kernel with custom VJP (production path)
  - "auto": tiles when available/large, dense otherwise
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from guidedvd3dgs_tpu.ops.projection import RasterCamera
from guidedvd3dgs_tpu.ops.raster_dense import RenderOutput, rasterize_dense

_AUTO_DENSE_MAX = 4096


def rasterize(
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
    backend: str = "auto",
    max_instances: int = 0,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    kwargs = dict(
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        means2d_offset=means2d_offset,
        active_mask=active_mask,
        active_degree=active_degree,
    )
    if backend == "auto":
        backend = "dense" if means3d.shape[0] <= _AUTO_DENSE_MAX else "tiles"
    if backend == "dense":
        return rasterize_dense(means3d, scales, rotations, opacities, shs, cam, bg, **kwargs)
    elif backend == "tiles":
        from guidedvd3dgs_tpu.ops.raster_tiles import rasterize_tiles

        return rasterize_tiles(
            means3d, scales, rotations, opacities, shs, cam, bg,
            max_instances=max_instances, **kwargs,
        )
    raise ValueError(f"unknown raster backend: {backend}")


def rasterize_multi(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    cams: RasterCamera,  # leaves stacked (B, ...), shared static H/W
    bg: jnp.ndarray,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    means2d_offset: Optional[jnp.ndarray] = None,  # (B, N, 2)
    active_mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    max_instances: int = 0,
    active_degree: Optional[jnp.ndarray] = None,
) -> RenderOutput:
    """Batched render of B cameras; RenderOutput leaves carry a leading B.

    tiles: ONE expand/sort/blend/reduce chain over every camera's instances
    (raster_tiles.rasterize_tiles_multi — the per-kernel fixed costs are
    paid once and the sorts ride their sublinear size scaling).
    dense: per-camera oracle loop (tiny scenes, tests)."""
    b = cams.viewmatrix.shape[0]
    if backend == "auto":
        backend = "dense" if means3d.shape[0] <= _AUTO_DENSE_MAX else "tiles"
    if backend == "dense":
        import jax

        outs = []
        for c in range(b):
            cam = RasterCamera(
                cams.viewmatrix[c], cams.projmatrix[c], cams.campos[c],
                cams.tanfovx[c] if getattr(cams.tanfovx, "ndim", 0) > 0 else cams.tanfovx,
                cams.tanfovy[c] if getattr(cams.tanfovy, "ndim", 0) > 0 else cams.tanfovy,
                cams.height, cams.width,
            )
            off_c = None if means2d_offset is None else means2d_offset[c]
            outs.append(
                rasterize_dense(
                    means3d, scales, rotations, opacities, shs, cam, bg,
                    sh_degree=sh_degree, scale_modifier=scale_modifier,
                    means2d_offset=off_c, active_mask=active_mask,
                    active_degree=active_degree,
                )
            )
        return jax.tree.map(
            lambda *xs: None if xs[0] is None else jnp.stack(xs), *outs,
            is_leaf=lambda x: x is None,
        )
    elif backend == "tiles":
        from guidedvd3dgs_tpu.ops.raster_tiles import rasterize_tiles_multi

        return rasterize_tiles_multi(
            means3d, scales, rotations, opacities, shs, cams, bg,
            sh_degree=sh_degree, scale_modifier=scale_modifier,
            means2d_offset=means2d_offset, active_mask=active_mask,
            max_instances=max_instances, active_degree=active_degree,
        )
    raise ValueError(f"unknown raster backend: {backend}")
