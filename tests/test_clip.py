"""Structural tests for the OpenCLIP towers + tokenizer (no open_clip or
pretrained weights in this image, so parity is structural: causality,
shapes, penultimate-layer selection, tokenizer framing)."""

import numpy as np

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion import clip as C
from guidedvd3dgs_tpu.diffusion.tokenizer import EOT, SOT, tokenize


def _tiny_text_params(rng, cfg: C.TextConfig):
    k = iter(jax.random.split(rng, 200))
    w = cfg.width
    p = {
        "token_embedding.weight": jax.random.normal(next(k), (cfg.vocab_size, w)) * 0.02,
        "positional_embedding": jax.random.normal(next(k), (cfg.context_length, w)) * 0.01,
        "ln_final.weight": jnp.ones((w,)),
        "ln_final.bias": jnp.zeros((w,)),
    }
    for i in range(cfg.layers):
        pre = f"transformer.resblocks.{i}"
        p[f"{pre}.ln_1.weight"] = jnp.ones((w,))
        p[f"{pre}.ln_1.bias"] = jnp.zeros((w,))
        p[f"{pre}.ln_2.weight"] = jnp.ones((w,))
        p[f"{pre}.ln_2.bias"] = jnp.zeros((w,))
        p[f"{pre}.attn.in_proj_weight"] = jax.random.normal(next(k), (3 * w, w)) * 0.02
        p[f"{pre}.attn.in_proj_bias"] = jnp.zeros((3 * w,))
        p[f"{pre}.attn.out_proj.weight"] = jax.random.normal(next(k), (w, w)) * 0.02
        p[f"{pre}.attn.out_proj.bias"] = jnp.zeros((w,))
        p[f"{pre}.mlp.c_fc.weight"] = jax.random.normal(next(k), (4 * w, w)) * 0.02
        p[f"{pre}.mlp.c_fc.bias"] = jnp.zeros((4 * w,))
        p[f"{pre}.mlp.c_proj.weight"] = jax.random.normal(next(k), (w, 4 * w)) * 0.02
        p[f"{pre}.mlp.c_proj.bias"] = jnp.zeros((w,))
    return p


TCFG = C.TextConfig(vocab_size=100, width=32, heads=4, layers=3, context_length=10)


def test_text_encoder_is_causal():
    p = _tiny_text_params(jax.random.key(0), TCFG)
    t1 = jnp.asarray([[SOT % 100, 5, 7, EOT % 100, 0, 0, 0, 0, 0, 0]], jnp.int32)
    t2 = t1.at[0, 5].set(42)  # change a LATER token
    o1 = C.text_encode(p, TCFG, t1)
    o2 = C.text_encode(p, TCFG, t2)
    np.testing.assert_allclose(o1[0, :5], o2[0, :5], rtol=1e-5, atol=1e-6)
    assert not np.allclose(o1[0, 5:], o2[0, 5:])


def test_text_encoder_penultimate_differs_from_last():
    p = _tiny_text_params(jax.random.key(0), TCFG)
    t = jnp.asarray([[1, 5, 7, 2, 0, 0, 0, 0, 0, 0]], jnp.int32)
    pen = C.text_encode(p, TCFG, t)
    last = C.text_encode(p, C.TextConfig(**{**TCFG.__dict__, "penultimate": False}), t)
    assert pen.shape == last.shape == (1, 10, 32)
    assert not np.allclose(pen, last)


def test_image_encoder_shapes():
    cfg = C.VisionConfig(width=32, heads=4, layers=2, patch_size=56, image_size=224)
    rng = jax.random.key(1)
    p = _tiny_text_params(rng, C.TextConfig(vocab_size=1, width=32, heads=4, layers=2,
                                            context_length=1))
    del p["token_embedding.weight"], p["positional_embedding"]
    del p["ln_final.weight"], p["ln_final.bias"]
    grid = 224 // 56
    p["conv1.weight"] = jax.random.normal(rng, (32, 3, 56, 56)) * 0.02
    p["class_embedding"] = jax.random.normal(rng, (32,)) * 0.02
    p["positional_embedding"] = jax.random.normal(rng, (1 + grid * grid, 32)) * 0.01
    p["ln_pre.weight"] = jnp.ones((32,))
    p["ln_pre.bias"] = jnp.zeros((32,))
    img = jax.random.uniform(rng, (2, 64, 48, 3)) * 2 - 1
    out = C.image_encode(p, cfg, img)
    assert out.shape == (2, 1 + grid * grid, 32)
    assert bool(jnp.isfinite(out).all())


def test_tokenize_framing_and_cache():
    toks = tokenize([""])
    assert toks.shape == (1, 77)
    assert toks[0, 0] == SOT and toks[0, 1] == EOT and toks[0, 2:].sum() == 0
