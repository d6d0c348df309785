"""Pallas tile rasterizer vs the dense oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.ops import raster_tiles, tiling
from guidedvd3dgs_tpu.ops.projection import preprocess_gaussians
from guidedvd3dgs_tpu.ops.raster_dense import rasterize_dense

from helpers import activated, make_camera, random_gaussians

raster_tiles.set_interpret(True)


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Other tests (the graft dryrun) may flip interpret mode process-wide;
    pin it per test here. Oracle-parity assertions run with the f16/bf16
    sort-payload packing OFF (exact f32 path); the packed production path
    has its own error-bound test (test_packed_paths_within_tolerance)."""
    prev = raster_tiles._INTERPRET[0]
    raster_tiles.set_interpret(True)
    tiling.set_pack_fields(False)
    raster_tiles.set_pack_grads(False)
    yield
    raster_tiles.set_interpret(prev)
    tiling.set_pack_fields(True)
    raster_tiles.set_pack_grads(True)


def test_packed_paths_within_tolerance():
    """Production packing (f16 opacity/RGB sort payloads, bf16-pair grad
    payloads) against the exact path: forward within f16 quantization,
    grads within bf16 (~0.4%) of exact."""
    cam, parts = setup(n=300)
    bg = jnp.zeros(3)

    def loss(m, s, r, o, sh):
        out = raster_tiles.rasterize_tiles(m, s, r, o, sh, cam, bg)
        return out.color.sum() + 0.1 * out.depth.sum(), out.color

    tiling.set_pack_fields(True)
    raster_tiles.set_pack_grads(True)
    (l_p, c_p), g_p = jax.value_and_grad(loss, argnums=(0, 3), has_aux=True)(*parts)
    tiling.set_pack_fields(False)
    raster_tiles.set_pack_grads(False)
    (l_e, c_e), g_e = jax.value_and_grad(loss, argnums=(0, 3), has_aux=True)(*parts)

    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_e), atol=4e-3)
    for gp, ge in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_e)):
        gp, ge = np.asarray(gp), np.asarray(ge)
        denom = np.abs(ge).max() + 1e-6
        np.testing.assert_allclose(gp / denom, ge / denom, atol=2e-2)


def setup(n=300, seed=0, height=48, width=64):
    cam = make_camera(height=height, width=width).raster_camera()
    parts = activated(*random_gaussians(n=n, seed=seed))
    return cam, tuple(jnp.asarray(p) for p in parts)


def test_binning_covers_bruteforce_tiles():
    cam, (xyz, scales, rots, opac, sh) = setup(n=64)
    proc = preprocess_gaussians(xyz, scales, rots, opac, sh, cam)
    b = tiling.bin_gaussians(proc, cam.width, cam.height, max_instances=8192)

    ids = np.asarray(b.inst_gauss)
    starts, counts = np.asarray(b.tile_start), np.asarray(b.tile_count)
    radii = np.asarray(proc.radii)
    m2d = np.asarray(proc.means2d)

    # rebuild expected (gaussian, tile) pairs per getRect
    exp = set()
    gx = b.grid_x
    for i in range(64):
        if radii[i] <= 0:
            continue
        r = radii[i]
        x0 = min(max(int((m2d[i, 0] - r) / tiling.TILE), 0), gx)
        y0 = min(max(int((m2d[i, 1] - r) / tiling.TILE), 0), b.grid_y)
        x1 = min(max(int((m2d[i, 0] + r + tiling.TILE - 1) / tiling.TILE), 0), gx)
        y1 = min(max(int((m2d[i, 1] + r + tiling.TILE - 1) / tiling.TILE), 0), b.grid_y)
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                exp.add((i, ty * gx + tx))

    got = set()
    for tile in range(gx * b.grid_y):
        for k in range(starts[tile], starts[tile] + counts[tile]):
            got.add((int(ids[k]), tile))
    # the expansion kernel culls (gaussian, tile) pairs whose maximum alpha
    # over the tile is provably < 1/255 — never ones that can contribute
    assert got <= exp
    conics = np.asarray(proc.conics)
    opac = np.asarray(proc.opacities)
    for (i, tile) in exp - got:
        ty, tx = divmod(tile, gx)
        px, py = np.meshgrid(
            tx * tiling.TILE + np.arange(tiling.TILE),
            ty * tiling.TILE + np.arange(tiling.TILE),
        )
        dx = m2d[i, 0] - px
        dy = m2d[i, 1] - py
        a, bb, c = conics[i]
        power = -0.5 * (a * dx * dx + c * dy * dy) - bb * dx * dy
        araw = opac[i] * np.exp(power)
        assert araw.max() < 1.0 / 255.0, (i, tile, araw.max())

    # depth-sorted within each tile
    depths = np.asarray(proc.depths)
    for tile in range(gx * b.grid_y):
        seg = ids[starts[tile] : starts[tile] + counts[tile]]
        d = depths[seg]
        assert (np.diff(d) >= -1e-6).all()


def test_forward_matches_dense():
    cam, parts = setup(n=300)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    dense = rasterize_dense(*parts, cam, bg)
    tiles = raster_tiles.rasterize_tiles(*parts, cam, bg)
    np.testing.assert_allclose(
        np.asarray(tiles.color), np.asarray(dense.color), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tiles.depth), np.asarray(dense.depth), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tiles.alpha), np.asarray(dense.alpha), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(tiles.radii), np.asarray(dense.radii))


def test_forward_matches_dense_opaque():
    """Heavy overlap: exercises the termination path."""
    cam, parts = setup(n=400, seed=9)
    xyz, scales, rots, opac, sh = parts
    opac = jnp.clip(opac * 4.0, 0.0, 0.999)
    bg = jnp.zeros(3)
    dense = rasterize_dense(xyz, scales, rots, opac, sh, cam, bg)
    tiles = raster_tiles.rasterize_tiles(xyz, scales, rots, opac, sh, cam, bg)
    np.testing.assert_allclose(
        np.asarray(tiles.color), np.asarray(dense.color), atol=5e-5, rtol=1e-4
    )


@pytest.mark.tpu
def test_tiles_match_dense_on_tpu_hardware():
    """COMPILED (non-interpret) tiles renderer vs the dense oracle on the
    real chip at a many-tile image. Catches hardware-only divergence the
    interpret-mode tests cannot: e.g. the TPU's default matmul precision
    silently rounds f32 operands to bf16, which corrupted the expansion
    kernel's integer table rows while every CPU test stayed green."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs a real TPU device")
    raster_tiles.set_interpret(False)
    # NOTE: shapes deliberately differ from any graph ever compiled under
    # --xla_force_host_platform_device_count: executables compiled under
    # that flag were corrupt AND outlived a local compile-cache purge
    # (served from the remote side), pinned to the old HLO key.
    cam = make_camera(height=336, width=608).raster_camera()
    parts = activated(*random_gaussians(n=4096, seed=12))
    parts = tuple(jnp.asarray(p) for p in parts)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    dense = jax.jit(
        lambda *a: rasterize_dense(*a, cam, bg)
    )(*parts)
    # this scene demands ~31k instances for 4096 gaussians — size the
    # buffer explicitly (the 4n default would overflow-drop; trainers
    # regrow on the overflow signal, a raw API test must pre-size)
    tiles = jax.jit(
        lambda *a: raster_tiles.rasterize_tiles(*a, cam, bg, max_instances=65536)
    )(*parts)
    assert int(tiles.overflow) == 0
    # the tile path sorts by 21-bit quantized depth keys (reference packs
    # f32 depth bits); near-coincident depths blend in a different order
    # than the oracle's exact sort, so compare in aggregate: catastrophic
    # corruption is O(0.1-1), quantized-order blend noise is O(1e-4) spread
    # over most pixels (measured 3.0e-4 mean / 4.4e-3 max on v5e)
    dc = np.abs(np.asarray(tiles.color) - np.asarray(dense.color))
    da = np.abs(np.asarray(tiles.alpha) - np.asarray(dense.alpha))
    assert dc.max() < 2e-2 and dc.mean() < 1e-3, (dc.max(), dc.mean())
    assert da.max() < 2e-2 and da.mean() < 1e-3, (da.max(), da.mean())


@pytest.mark.tpu
def test_grads_finite_at_scale_on_tpu():
    """Compiled (non-interpret) fwd+bwd at 1M splats on a real TPU chip must
    produce finite gradients — the regression class round 1 shipped
    (uninitialized HBM in early-exited bwd chunks passed interpret-mode
    tests but was non-finite on hardware)."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs a real TPU device")
    raster_tiles.set_interpret(False)
    import bench as bench_mod

    cam = bench_mod.make_camera()
    args = bench_mod.make_inputs()
    bg = jnp.zeros((3,), jnp.float32)

    def loss(m, s, r, o, sh):
        out = raster_tiles.rasterize_tiles(m, s, r, o, sh, cam, bg, sh_degree=3)
        return out.color.sum() + 0.1 * out.depth.sum() + 0.1 * out.alpha.sum()

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    leaves = [np.asarray(x) for x in jax.tree.leaves((val, grads))]
    assert all(np.isfinite(x).all() for x in leaves)


@pytest.mark.slow
def test_backward_matches_dense():
    cam, parts = setup(n=200, seed=3, height=32, width=48)
    xyz, scales, rots, opac, sh = parts
    bg = jnp.zeros(3)
    target = jnp.full((3, 32, 48), 0.3)
    n = xyz.shape[0]

    def loss_tiles(xyz, scales, rots, opac, sh, off):
        out = raster_tiles.rasterize_tiles(
            xyz, scales, rots, opac, sh, cam, bg, means2d_offset=off
        )
        return (
            ((out.color - target) ** 2).sum()
            + 0.1 * out.depth.sum()
            + 0.05 * (out.alpha**2).sum()
        )

    def loss_dense(xyz, scales, rots, opac, sh, off):
        out = rasterize_dense(
            xyz, scales, rots, opac, sh, cam, bg, means2d_offset=off
        )
        return (
            ((out.color - target) ** 2).sum()
            + 0.1 * out.depth.sum()
            + 0.05 * (out.alpha**2).sum()
        )

    off = jnp.zeros((n, 2))
    g_t = jax.grad(loss_tiles, argnums=(0, 1, 2, 3, 4, 5))(xyz, scales, rots, opac, sh, off)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4, 5))(xyz, scales, rots, opac, sh, off)

    names = ["xyz", "scales", "rots", "opac", "sh", "offset"]
    for name, gt, gd in zip(names, g_t, g_d):
        gt, gd = np.asarray(gt), np.asarray(gd)
        denom = np.abs(gd).max() + 1e-8
        np.testing.assert_allclose(gt / denom, gd / denom, atol=2e-4, err_msg=name)


def test_e1_sort_path_bit_exact():
    """The switchable E1 binning sort (payload-free key+iota sort + one
    packed row gather; default OFF — in-graph it loses 5.3 ms, see
    tiling._E1_SORT) must stay BIT-EXACT vs the 9-operand packed sort:
    stable-sort tie order == iota order (E1_SORT_STUDY.json on-chip parity)."""
    cam, (xyz, scales, rots, opac, sh) = setup(n=300)
    proc = preprocess_gaussians(xyz, scales, rots, opac, sh, cam)
    tiling.set_pack_fields(True)
    prev = tiling._E1_SORT[0]
    try:
        tiling._E1_SORT[0] = False
        b0 = tiling.bin_gaussians(proc, cam.width, cam.height, max_instances=8192)
        tiling._E1_SORT[0] = True
        b1 = tiling.bin_gaussians(proc, cam.width, cam.height, max_instances=8192)
    finally:
        tiling._E1_SORT[0] = prev
        tiling.set_pack_fields(False)
    np.testing.assert_array_equal(np.asarray(b0.inst_data), np.asarray(b1.inst_data))
    np.testing.assert_array_equal(np.asarray(b0.inst_gauss), np.asarray(b1.inst_gauss))
