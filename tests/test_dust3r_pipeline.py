"""DUSt3R pipeline glue: pair graph, resize convention, e2e tiny run."""

import numpy as np
import pytest

from guidedvd3dgs_tpu.geometry.pipeline import (
    make_pairs,
    resize_for_dust3r,
    run_dust3r_scene,
    scene_to_pointcloud,
)


def test_make_pairs_complete_symmetrized():
    pairs = make_pairs(6)
    assert len(pairs) == 30  # 6*5 directed (reference: 30 pairs for 6 views)
    assert set(pairs) == {(i, j) for i in range(6) for j in range(6) if i != j}


def test_resize_convention():
    img = np.zeros((576, 1024, 3), np.float32)
    out = resize_for_dust3r(img, 512)
    assert out.shape == (288, 512, 3)
    img = np.zeros((600, 800, 3), np.float32)
    out = resize_for_dust3r(img, 512)
    assert out.shape[1] == 512 and out.shape[0] % 16 == 0


@pytest.mark.slow
def test_tiny_e2e_scene():
    """Random tiny weights: checks the full pairs->net->aligner plumbing."""
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/repo/tests")
    from test_dust3r_parity import _ref_model, CFG

    from guidedvd3dgs_tpu.diffusion.convert import from_torch_module

    params = from_torch_module(_ref_model())
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    scene = run_dust3r_scene(params, CFG, imgs, niter=10, batch_pairs=2)
    assert scene.c2ws.shape == (3, 4, 4)
    assert scene.pts3d.shape == (3, 32, 32, 3)
    assert np.isfinite(scene.pts3d).all()
    pts, cols = scene_to_pointcloud(scene, min_conf_thr=0.0, every=2)
    assert pts.shape[0] > 0 and pts.shape == cols.shape
