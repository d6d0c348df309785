"""Activation parity: JAX DUSt3R vs the reference AsymmetricCroCo3DStereo."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DUST3R = "/root/reference/third_party/ViewCrafter/extern/dust3r"

import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.convert import from_torch_module
from guidedvd3dgs_tpu.geometry.dust3r import Dust3rConfig, dust3r_apply


def _ref_model():
    for p in (DUST3R, f"{DUST3R}/croco"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from dust3r.model import AsymmetricCroCo3DStereo

    torch.manual_seed(0)
    m = AsymmetricCroCo3DStereo(
        output_mode="pts3d",
        head_type="dpt",
        depth_mode=("exp", -float("inf"), float("inf")),
        conf_mode=("exp", 1, float("inf")),
        landscape_only=False,
        img_size=(32, 32),
        patch_size=16,
        enc_embed_dim=64,
        enc_depth=2,
        enc_num_heads=4,
        dec_embed_dim=48,
        dec_depth=10,
        dec_num_heads=4,
        pos_embed="RoPE100",
    ).eval()
    return m


CFG = Dust3rConfig(
    patch_size=16, enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
    dec_embed_dim=48, dec_depth=10, dec_num_heads=4,
)


@pytest.mark.slow
def test_dust3r_forward_parity():
    m = _ref_model()
    params = from_torch_module(m)

    rng = np.random.default_rng(0)
    i1 = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    i2 = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        r1, r2 = m(
            {"img": torch.from_numpy(i1), "instance": ["0"]},
            {"img": torch.from_numpy(i2), "instance": ["1"]},
        )

    o1, o2 = dust3r_apply(
        params, CFG,
        jnp.asarray(np.transpose(i1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(i2, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.asarray(o1["pts3d"]), r1["pts3d"].numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(o2["pts3d"]), r2["pts3d_in_other_view"].numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1["conf"]), r1["conf"].numpy(), rtol=2e-3, atol=2e-4
    )
