"""Activation parity: JAX UNet3D vs the reference torch UNetModel.

The reference implementation at /root/reference is executed (not copied) on
CPU with a tiny randomly-initialized config; our functional JAX rebuild must
reproduce its outputs through the state-dict converter. This is the test
strategy SURVEY.md §7.3(4) calls for, shrunk to CI size.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/third_party/ViewCrafter"

import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.convert import from_torch_module
from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig, unet_apply

TINY = dict(
    in_channels=8,
    out_channels=4,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=[1, 2],
    channel_mult=[1, 2],
    num_head_channels=8,
    transformer_depth=1,
    context_dim=16,
    use_linear=True,
    use_checkpoint=False,
    temporal_conv=True,
    temporal_attention=True,
    temporal_selfatt_only=True,
    use_relative_position=False,
    use_causal_attention=False,
    temporal_length=4,
    addition_attention=True,
    image_cross_attention=True,
    default_fs=10,
    fs_condition=True,
)


def _ref_unet():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from lvdm.modules.networks.openaimodel3d import UNetModel

    torch.manual_seed(0)
    m = UNetModel(**TINY)
    m.eval()
    return m


def _jax_cfg():
    return UNetConfig(
        in_channels=8,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(1, 2),
        channel_mult=(1, 2),
        num_head_channels=8,
        transformer_depth=1,
        context_dim=16,
        use_linear=True,
        temporal_conv=True,
        temporal_attention=True,
        use_relative_position=False,
        temporal_length=4,
        addition_attention=True,
        image_cross_attention=True,
        default_fs=10,
        fs_condition=True,
    )


@pytest.mark.parametrize("per_frame_ctx", [True, False])
@pytest.mark.slow
def test_unet_forward_parity(per_frame_ctx):
    m = _ref_unet()
    params = from_torch_module(m)

    b, t, h, w = 1, 4, 8, 8
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, 8, t, h, w)).astype(np.float32)
    ts = np.array([500], np.int64)
    n_ctx = 77 + t * 16 if per_frame_ctx else 7
    ctx = rng.normal(size=(b, n_ctx, 16)).astype(np.float32)
    fs = np.array([10], np.int64)

    with torch.no_grad():
        ref = m(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            context=torch.from_numpy(ctx),
            fs=torch.from_numpy(fs),
        ).numpy()

    out = unet_apply(
        params,
        _jax_cfg(),
        jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),  # BCTHW -> BTHWC
        jnp.asarray(ts),
        jnp.asarray(ctx),
        fs=jnp.asarray(fs),
    )
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_group_norm_half_precision_path_matches_f32():
    """The traffic-minimal half-precision group_norm (stats in f32 over the
    bf16 tensor, folded scale/shift) must match the reference two-pass f32
    form within bf16 tolerance."""
    from guidedvd3dgs_tpu.diffusion.nnops import group_norm

    rng = np.random.default_rng(0)
    x = rng.normal(scale=3.0, size=(2, 5, 6, 7, 64)).astype(np.float32) + 1.5
    p = {
        "gn.weight": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
        "gn.bias": jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
    }
    ref = np.asarray(group_norm(p, "gn", jnp.asarray(x), num_groups=32))
    got = np.asarray(
        group_norm(p, "gn", jnp.asarray(x, jnp.bfloat16), num_groups=32)
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
