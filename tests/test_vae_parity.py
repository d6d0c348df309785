"""Activation parity: JAX AutoencoderKL vs the reference torch VAE (tiny)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/third_party/ViewCrafter"

import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.convert import from_torch_module
from guidedvd3dgs_tpu.diffusion.vae import (
    VAEConfig,
    vae_decode,
    vae_encode_moments,
)

DD = dict(
    double_z=True,
    z_channels=4,
    resolution=64,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
)


def _ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from lvdm.modules.networks.ae_modules import Decoder, Encoder

    torch.manual_seed(1)
    enc = Encoder(**DD).eval()
    dec = Decoder(**DD).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    return enc, dec, quant, post_quant


def _params(enc, dec, quant, post_quant):
    p = {}
    for k, v in from_torch_module(enc).items():
        p[f"encoder.{k}"] = v
    for k, v in from_torch_module(dec).items():
        p[f"decoder.{k}"] = v
    for k, v in from_torch_module(quant).items():
        p[f"quant_conv.{k}"] = v
    for k, v in from_torch_module(post_quant).items():
        p[f"post_quant_conv.{k}"] = v
    return p


CFG = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
                resolution=64, z_channels=4)


def test_encoder_parity():
    enc, dec, quant, post_quant = _ref_modules()
    p = _params(enc, dec, quant, post_quant)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = quant(enc(torch.from_numpy(x))).numpy()
    out = vae_encode_moments(p, CFG, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=2e-4, atol=2e-5
    )


def test_decoder_parity():
    enc, dec, quant, post_quant = _ref_modules()
    p = _params(enc, dec, quant, post_quant)
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = dec(post_quant(torch.from_numpy(z))).numpy()
    out = vae_decode(p, CFG, jnp.asarray(np.transpose(z, (0, 2, 3, 1))), unscale=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=2e-4, atol=2e-5
    )
