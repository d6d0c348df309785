"""Fixed-capacity Gaussian state: create/adam/densify/prune/reset semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.models.render import render_state
from guidedvd3dgs_tpu.ops.knn import knn3

from helpers import make_camera


def make_state(n=64, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return G.create_from_pcd(pts, cols, capacity=cap)


def test_create_from_pcd_layout():
    st = make_state()
    assert st.capacity == 256
    assert int(st.num_active()) == 64
    # opacity starts at 0.1
    op = np.asarray(G.get_opacity(st.params))[:64]
    np.testing.assert_allclose(op, 0.1, atol=1e-5)
    # identity rotations
    np.testing.assert_allclose(np.asarray(st.params.rotation[:64, 0]), 1.0)
    # scales = log sqrt(mean 3NN d2) -> isotropic
    s = np.asarray(st.params.scaling[:64])
    np.testing.assert_allclose(s[:, 0], s[:, 1])


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    d2, idx = knn3(pts)
    # brute force
    D = np.array(jnp.sum((pts[:, None] - pts[None]) ** 2, -1))
    np.fill_diagonal(D, np.inf)
    bf = np.sort(D, axis=1)[:, :3].mean(1)
    approx = np.asarray(d2)
    # morton-window approximation: most points exact, none catastrophically off
    rel = np.abs(approx - bf) / np.maximum(bf, 1e-9)
    assert np.median(rel) < 1e-5
    assert (rel < 1.0).mean() > 0.9


def test_adam_step_moves_active_only():
    st = make_state()
    g = jax.tree.map(jnp.ones_like, st.params)
    lrs = G.LearningRates(*(jnp.float32(0.01),) * 6)
    st2 = G.adam_step(st, g, lrs)
    assert int(st2.step) == 1
    dx = np.asarray(st2.params.xyz - st.params.xyz)
    assert np.abs(dx[:64]).min() > 0
    np.testing.assert_allclose(dx[64:], 0.0)


def test_densify_clone_appends():
    st = make_state()
    # force large grads on first 10 points, small scales so clone path fires
    accum = st.xyz_gradient_accum.at[:10].set(1.0)
    denom = st.denom.at[:64].set(1.0)
    st = st._replace(xyz_gradient_accum=accum, denom=denom)
    cfg = G.DensifyConfig(
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=100.0,  # huge extent => everything "small" => clone not split
        max_screen_size=0.0,
        percent_dense=0.01,
        dist_thres=10.0,
        prune_enabled=True,
        proximity_enabled=False,
    )
    st2 = G.densify_and_prune(st, jax.random.key(0), cfg)
    assert int(st2.num_active()) == 74  # 64 + 10 clones
    # stats zeroed
    assert float(st2.xyz_gradient_accum.sum()) == 0.0
    # compacted prefix
    act = np.asarray(st2.active)
    assert act[:74].all() and not act[74:].any()


def test_densify_split_replaces_with_two():
    st = make_state()
    accum = st.xyz_gradient_accum.at[:5].set(1.0)
    denom = st.denom.at[:64].set(1.0)
    st = st._replace(xyz_gradient_accum=accum, denom=denom)
    cfg = G.DensifyConfig(
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1e-6,  # tiny extent => selected points are "large" => split
        max_screen_size=0.0,
        percent_dense=0.01,
        dist_thres=1e12,  # disable isolation criterion
        prune_enabled=True,
        proximity_enabled=False,
    )
    st2 = G.densify_and_prune(st, jax.random.key(0), cfg)
    # 5 split -> removed, +10 new; 59 + 10 = 69... but min_opacity prune may fire (op=0.1 fine)
    assert int(st2.num_active()) == 69


def test_prune_low_opacity():
    st = make_state()
    op = st.params.opacity.at[:20].set(-10.0)  # sigmoid ~ 0
    st = st._replace(params=st.params._replace(opacity=op))
    cfg = G.DensifyConfig(0.5, 0.005, 1.0, 0.0, 0.01, 1e12, True, False)
    st2 = G.prune_only(st, cfg)
    assert int(st2.num_active()) == 44


def test_reset_opacity_clamps_and_zeroes_moments():
    st = make_state()
    m = st.adam_m._replace(opacity=jnp.ones_like(st.adam_m.opacity))
    st = st._replace(adam_m=m)
    st2 = G.reset_opacity(st)
    op = np.asarray(G.get_opacity(st2.params))[:64]
    assert op.max() <= 0.05 + 1e-6
    assert float(st2.adam_m.opacity.sum()) == 0.0


@pytest.mark.slow
def test_render_ignores_inactive_rows():
    st = make_state(n=32, cap=128)
    cam = make_camera(height=32, width=32).raster_camera()
    r1 = render_state(st, cam, jnp.zeros(3), 0)
    # corrupt inactive rows with a huge gaussian at the camera center
    xyz = st.params.xyz.at[100].set(jnp.array([0.0, 0.0, 0.0]))
    sc = st.params.scaling.at[100].set(2.0)
    st_bad = st._replace(params=st.params._replace(xyz=xyz, scaling=sc))
    r2 = render_state(st_bad, cam, jnp.zeros(3), 0)
    np.testing.assert_allclose(np.asarray(r1.color), np.asarray(r2.color), atol=1e-6)
    assert int(r2.radii[100]) == 0


@pytest.mark.slow
def test_confidence_scales_gradients():
    st = make_state(n=16, cap=32)
    conf = st.confidence.at[:8].set(0.5)
    st = st._replace(confidence=conf)
    cam = make_camera(height=24, width=24).raster_camera()

    def loss(params, use_conf):
        r = render_state(
            st._replace(params=params), cam, jnp.zeros(3), 0, use_confidence=use_conf
        )
        return (r.color**2).sum()

    g_plain = jax.grad(lambda p: loss(p, False))(st.params)
    g_conf = jax.grad(lambda p: loss(p, True))(st.params)
    np.testing.assert_allclose(
        np.asarray(g_conf.xyz[:8]), np.asarray(g_plain.xyz[:8]) * 0.5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_conf.xyz[8:16]), np.asarray(g_plain.xyz[8:16]), rtol=1e-5
    )


@pytest.mark.slow
def test_add_points_and_grow_capacity():
    st = make_state(n=16, cap=32)
    new_pts = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    new_rgb = np.full((8, 3), 0.5, np.float32)
    st2 = G.add_points(st, new_pts, new_rgb)
    assert int(st2.num_active()) == 24
    st3 = G.grow_capacity(st2, 64)
    assert st3.capacity == 64
    assert int(st3.num_active()) == 24
    np.testing.assert_allclose(np.asarray(st3.params.rotation[50]), [1, 0, 0, 0])


def test_append_rows_drops_overflow_in_index_order():
    """At capacity, _append_rows must keep the earliest selected rows (stable
    index order, the reference's cat-then-truncate) and leave existing rows
    untouched — exercises the sort-carried destination-rank bijection drop
    path (payload-free argsort + wide row gather, gaussians._sort_carried)."""
    st = make_state(n=60, cap=64)
    sel = np.zeros(64, bool)
    sel[[3, 10, 20, 30, 40, 50]] = True  # 6 selected, only 4 free slots
    new = jax.tree.map(lambda x: x + 100.0, st.params)
    st2 = G._append_rows(st, new, jnp.asarray(sel))
    assert int(st2.num_active()) == 64
    xyz = np.asarray(st2.params.xyz)
    old = np.asarray(st.params.xyz)
    # existing rows untouched
    np.testing.assert_array_equal(xyz[:60], old[:60])
    # first 4 selected rows (index order) appended, last 2 dropped
    np.testing.assert_allclose(xyz[60:64], old[[3, 10, 20, 30]] + 100.0)
    # appended Adam moments are zero
    assert float(np.abs(np.asarray(st2.adam_m.xyz)[60:64]).sum()) == 0.0
    assert float(np.asarray(st2.confidence)[60:64].min()) == 1.0


def test_proximity_after_split_does_not_clobber_children():
    """Split deactivates its source rows mid-event, leaving holes in the
    active prefix; proximity's appends must not overwrite split children
    (regression: suffix-append assumed a compacted prefix)."""
    st = make_state(n=16, cap=4096)
    accum = st.xyz_gradient_accum.at[:16].set(1.0)  # every row splits
    denom = st.denom.at[:16].set(1.0)
    st = st._replace(xyz_gradient_accum=accum, denom=denom)
    cfg = G.DensifyConfig(
        grad_threshold=0.5, min_opacity=0.005,
        extent=1e-6,  # tiny extent: everything "large" => split + proximity
        max_screen_size=0.0, percent_dense=0.01, dist_thres=1e12,
        prune_enabled=True, proximity_enabled=True,
    )
    st2 = G.densify_and_prune(st, jax.random.key(0), cfg)
    # 16 split sources removed, 32 children added; proximity then selects
    # all 32 actives and appends 3 midpoints each: 32 + 96 = 128
    assert int(st2.num_active()) == 128
