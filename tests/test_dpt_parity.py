"""Activation parity of the JAX DPT depth net vs HuggingFace transformers'
DPTForDepthEstimation (an independent torch implementation of the same
architecture) at a shrunk config, with real numerics."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from guidedvd3dgs_tpu.guidance import dpt as D

pytestmark = pytest.mark.slow

HID, LAYERS, HEADS, MLP = 64, 4, 4, 128
PATCH, IMG = 16, 64  # 4x4 grid
NECK = (16, 32, 48, 64)
FUSION = 32


def _hf_model():
    from transformers import DPTConfig, DPTForDepthEstimation

    cfg = DPTConfig(
        hidden_size=HID,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=MLP,
        image_size=IMG,
        patch_size=PATCH,
        neck_hidden_sizes=list(NECK),
        fusion_hidden_size=FUSION,
        is_hybrid=False,
        reassemble_factors=[4, 2, 1, 0.5],
        backbone_out_indices=[0, 1, 2, 3],
        readout_type="project",
        use_batch_norm_in_fusion_residual=False,
        add_projection=False,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    m = DPTForDepthEstimation(cfg).eval()
    # randomize everything (HF zero-inits some params)
    with torch.no_grad():
        for q in m.parameters():
            q.add_(0.02 * torch.randn_like(q))
    return m


def test_dpt_forward_parity():
    m = _hf_model()
    p = {k: jnp.asarray(v.detach().numpy()) for k, v in m.state_dict().items()}

    cfg = D.DPTConfig(
        hidden_size=HID, num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
        patch_size=PATCH, pos_grid=IMG // PATCH, out_indices=(0, 1, 2, 3),
        neck_hidden=NECK, reassemble_factors=(4.0, 2.0, 1.0, 0.5),
        fusion_hidden=FUSION,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)

    ours = np.asarray(D.dpt_forward(p, cfg, jnp.asarray(x)))
    with torch.no_grad():
        ref = m(pixel_values=torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).predicted_depth.numpy()

    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    err = np.max(np.abs(ours - ref)) / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-4, err


def test_depth_estimator_hook_shapes():
    cfg = D.DPTConfig(
        hidden_size=HID, num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
        patch_size=PATCH, pos_grid=IMG // PATCH, out_indices=(0, 1, 2, 3),
        neck_hidden=NECK, fusion_hidden=FUSION,
    )
    p = {k: jnp.asarray(v) for k, v in D.init_dpt_params(cfg).items()}
    est = D.make_depth_estimator(p, cfg, height=64, width=64)
    frames = jnp.zeros((3, 40, 56, 3), jnp.float32)
    d = est(frames)
    assert d.shape == (3, 40, 56)
    assert bool(jnp.isfinite(d).all())
