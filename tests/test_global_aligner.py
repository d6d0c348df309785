"""Global aligner: synthetic two-view recovery test.

Build a known scene (points + two cameras), fabricate perfect pairwise
"network predictions" in each edge's reference frame, preset poses/focals
(the guidedvd path) and check the optimizer recovers consistent depth maps
and a low loss.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedvd3dgs_tpu.geometry import global_aligner as GA


def _scene(h=8, w=12, f=20.0):
    rng = np.random.default_rng(0)
    # ground-truth depth per view and poses
    c2w = np.stack([np.eye(4), np.eye(4)])
    c2w[1, :3, 3] = [0.4, 0.0, 0.0]
    depth = rng.uniform(2.0, 4.0, size=(2, h, w)).astype(np.float32)

    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pp = np.array([w / 2.0, h / 2.0])

    def unproject(v):
        d = depth[v]
        x = (xx - pp[0]) * d / f
        y = (yy - pp[1]) * d / f
        cam = np.stack([x, y, d], -1).reshape(-1, 3)
        return cam @ c2w[v, :3, :3].T + c2w[v, :3, 3]

    pts = [unproject(0), unproject(1)]
    return c2w, depth, pts, f


def test_quat_roundtrip():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(1)
    R = Rotation.random(random_state=rng).as_matrix()
    q = GA.rotmat_to_quat_xyzw(R)
    R2 = np.asarray(GA.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-6)


@pytest.mark.slow
def test_pose_param_roundtrip():
    c2w = np.eye(4)
    c2w[:3, 3] = [0.5, -2.0, 3.0]
    p = np.zeros(7, np.float32)
    p[:4] = GA.rotmat_to_quat_xyzw(c2w[:3, :3])
    p[4:7] = GA.signed_log1p(c2w[:3, 3])
    rt = np.asarray(GA.poses_to_rt(jnp.asarray(p)[None]))[0]
    np.testing.assert_allclose(rt, c2w, atol=1e-6)


@pytest.mark.slow
def test_alignment_recovers_depth_with_preset_poses():
    h, w = 8, 12
    c2w, depth, pts, f = _scene(h, w)
    # symmetric edges (0,1) and (1,0); predictions in edge-first-view frame
    edges = [(0, 1), (1, 0)]

    def in_frame(pw, k):
        w2c = np.linalg.inv(c2w[k])
        return pw @ w2c[:3, :3].T + w2c[:3, 3]

    pred_i = np.stack([in_frame(pts[0], 0), in_frame(pts[1], 1)]).astype(np.float32)
    pred_j = np.stack([in_frame(pts[1], 0), in_frame(pts[0], 1)]).astype(np.float32)
    conf = np.full((2, h * w), 5.0, np.float32)

    cfg = GA.AlignerConfig(height=h, width=w, pose_preset=True, focal_preset=True)
    rng = np.random.default_rng(2)
    state = GA.init_state(cfg, 2, edges, pred_i, rng,
                          preset_c2w=c2w, preset_focals=np.array([f, f]))
    # corrupt the depth init to make the task nontrivial
    state = state._replace(im_depth=state.im_depth + 0.3)

    state, loss = GA.global_align(
        state, cfg, jnp.asarray(pred_i), jnp.asarray(pred_j),
        jnp.asarray(conf), jnp.asarray(conf), edges, niter=300, lr=0.02,
    )
    out = GA.aligner_outputs(state, cfg)
    assert float(loss) < 0.05, float(loss)
    # poses stayed preset
    np.testing.assert_allclose(np.asarray(out["c2w"]), c2w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["focals"]), [f, f], rtol=1e-6)
    # depth recovered up to the pairwise scale ambiguity resolved by presets
    rel_err = np.abs(np.asarray(out["depth"]) - depth) / depth
    assert float(np.median(rel_err)) < 0.1, float(np.median(rel_err))
