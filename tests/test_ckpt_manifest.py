"""Checkpoint-converter manifest test at the REAL inference_pvd_1024 config.

SURVEY §7.3(4): "one permuted conv kernel = garbage output". The round-1
parity tests execute the reference modules at tiny configs; this test
instantiates the reference torch UNetModel / AutoencoderKL / Resampler ONCE
at the full `configs/inference_pvd_1024.yaml` sizes (reference:
third_party/ViewCrafter/configs/inference_pvd_1024.yaml) and asserts that
`convert.load_viewcrafter_checkpoint`'s renaming + our `init_*` param trees
agree on EVERY key name and shape. When a real model.ckpt arrives it either
loads exactly or fails loudly at the named key.

The OpenCLIP towers cannot be covered this way (open_clip is not installed
in this environment); their key sets are pinned by tests/test_clip_parity.py
against HuggingFace CLIP at shrunk configs instead.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from guidedvd3dgs_tpu.diffusion.convert import from_torch_module
from guidedvd3dgs_tpu.diffusion.init import (
    init_resampler_params,
    init_unet_params,
    init_vae_params,
)
from guidedvd3dgs_tpu.diffusion.resampler import ResamplerConfig
from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig
from guidedvd3dgs_tpu.diffusion.vae import VAEConfig

REF = "/root/reference/third_party/ViewCrafter"

pytestmark = pytest.mark.slow

# the full unet_config params block of inference_pvd_1024.yaml, verbatim
FULL_UNET = dict(
    in_channels=8,
    out_channels=4,
    model_channels=320,
    attention_resolutions=[4, 2, 1],
    num_res_blocks=2,
    channel_mult=[1, 2, 4, 4],
    dropout=0.1,
    num_head_channels=64,
    transformer_depth=1,
    context_dim=1024,
    use_linear=True,
    use_checkpoint=True,
    temporal_conv=True,
    temporal_attention=True,
    temporal_selfatt_only=True,
    use_relative_position=False,
    use_causal_attention=False,
    temporal_length=16,
    addition_attention=True,
    image_cross_attention=True,
    default_fs=10,
    fs_condition=True,
)

# first_stage_config ddconfig block, verbatim
FULL_DD = dict(
    double_z=True,
    z_channels=4,
    resolution=256,
    in_channels=3,
    out_ch=3,
    ch=128,
    ch_mult=[1, 2, 4, 4],
    num_res_blocks=2,
    attn_resolutions=[],
    dropout=0.0,
)

# image_proj_stage_config params block, verbatim
FULL_RESAMPLER = dict(
    dim=1024,
    depth=4,
    dim_head=64,
    heads=12,
    num_queries=16,
    embedding_dim=1280,
    output_dim=1024,
    ff_mult=4,
    video_length=16,
)


def _manifest(params):
    return {k: tuple(np.shape(v)) for k, v in params.items()}


def _assert_manifests_equal(ref, ours, label):
    missing = sorted(set(ref) - set(ours))
    extra = sorted(set(ours) - set(ref))
    assert not missing and not extra, (
        f"{label}: {len(missing)} reference keys missing from init "
        f"(first 10: {missing[:10]}); {len(extra)} init keys unknown to the "
        f"reference (first 10: {extra[:10]})"
    )
    bad = [
        (k, ref[k], ours[k]) for k in sorted(ref) if ref[k] != ours[k]
    ]
    assert not bad, f"{label}: shape mismatches (first 10): {bad[:10]}"


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def test_unet_manifest_full_config():
    _ref_path()
    from lvdm.modules.networks.openaimodel3d import UNetModel

    with torch.device("meta"):  # shapes only — no 1.4 GB of real tensors
        m = UNetModel(**FULL_UNET)
    ref = {k: tuple(v.shape) for k, v in m.state_dict().items()}
    ours = _manifest(init_unet_params(UNetConfig(), jax.random.PRNGKey(0)))
    _assert_manifests_equal(ref, ours, "unet@pvd_1024")


def test_vae_manifest_full_config():
    # AutoencoderKL itself imports pytorch_lightning (absent here); its
    # state dict is exactly Encoder/Decoder(**ddconfig) plus the two quant
    # convs (reference autoencoder.py:28-35), assembled with the same
    # attribute prefixes.
    _ref_path()
    from lvdm.modules.networks.ae_modules import Decoder, Encoder

    embed_dim = 4
    with torch.device("meta"):
        enc = Encoder(**FULL_DD)
        dec = Decoder(**FULL_DD)
        quant = torch.nn.Conv2d(2 * FULL_DD["z_channels"], 2 * embed_dim, 1)
        post = torch.nn.Conv2d(embed_dim, FULL_DD["z_channels"], 1)
    ref = {}
    for prefix, mod in (
        ("encoder.", enc), ("decoder.", dec),
        ("quant_conv.", quant), ("post_quant_conv.", post),
    ):
        for k, v in mod.state_dict().items():
            ref[prefix + k] = tuple(v.shape)
    ours = _manifest(init_vae_params(VAEConfig(), jax.random.PRNGKey(0)))
    _assert_manifests_equal(ref, ours, "vae@pvd_1024")


def test_resampler_manifest_full_config():
    _ref_path()
    from lvdm.modules.encoders.resampler import Resampler

    with torch.device("meta"):
        m = Resampler(**FULL_RESAMPLER)
    ref = {k: tuple(v.shape) for k, v in m.state_dict().items()}
    ours = _manifest(init_resampler_params(ResamplerConfig(), jax.random.PRNGKey(0)))
    _assert_manifests_equal(ref, ours, "resampler@pvd_1024")


def test_framestride_embed_legacy_rename():
    """A ckpt state_dict using the legacy 'framestride_embed' naming
    (reference diffusion_utils.py:95-105) must land on our fps_embedding
    keys through load_viewcrafter_checkpoint."""
    import os
    import tempfile

    from guidedvd3dgs_tpu.diffusion.convert import load_viewcrafter_checkpoint

    sd = {
        "model.diffusion_model.framestride_embed.0.weight": torch.zeros(4, 2),
        "model.diffusion_model.out.2.bias": torch.zeros(4),
        "first_stage_model.quant_conv.weight": torch.zeros(8, 8, 1, 1),
        "scale_arr": torch.ones(1000),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.ckpt")
        torch.save({"state_dict": sd}, path)
        split = load_viewcrafter_checkpoint(path)
    assert "fps_embedding.0.weight" in split["unet"]
    assert "out.2.bias" in split["unet"]
    assert "quant_conv.weight" in split["vae"]
    assert "scale_arr" in split["buffers"]
