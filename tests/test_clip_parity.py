"""Activation parity of the OpenCLIP towers vs an independent torch
implementation (HuggingFace transformers CLIP, which implements the same
pre-LN ViT blocks as open_clip — packed vs split qkv is a pure weight-layout
difference).

Covers the FrozenOpenCLIPEmbedder semantics (penultimate layer + ln_final,
reference condition.py:213-231) and the FrozenOpenCLIPImageEmbedderV2
semantics (ln_pre -> full transformer -> raw tokens, NO ln_post,
condition.py:342-372) with real numerics at a shrunk config.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from guidedvd3dgs_tpu.diffusion import clip as C

pytestmark = pytest.mark.slow

WIDTH, HEADS, LAYERS = 64, 4, 4
VOCAB, CTX = 211, 16
PATCH, IMG = 8, 32  # 4x4 grid + cls = 17 tokens


def _hf_text_model():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=VOCAB,
        hidden_size=WIDTH,
        intermediate_size=4 * WIDTH,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        max_position_embeddings=CTX,
        hidden_act="gelu",  # open_clip towers use exact GELU
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = CLIPTextModel(cfg).eval()
    return model


def _hf_vision_model():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=WIDTH,
        intermediate_size=4 * WIDTH,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        image_size=IMG,
        patch_size=PATCH,
        hidden_act="gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    model = CLIPVisionModel(cfg).eval()
    return model


def _layer_params(layers_module, prefix_fmt):
    """HF CLIPEncoderLayer weights -> open_clip packed-resblock naming."""
    p = {}
    for i, layer in enumerate(layers_module):
        pre = prefix_fmt.format(i)
        sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
        p[f"{pre}.ln_1.weight"] = sd["layer_norm1.weight"]
        p[f"{pre}.ln_1.bias"] = sd["layer_norm1.bias"]
        p[f"{pre}.ln_2.weight"] = sd["layer_norm2.weight"]
        p[f"{pre}.ln_2.bias"] = sd["layer_norm2.bias"]
        p[f"{pre}.attn.in_proj_weight"] = np.concatenate(
            [sd["self_attn.q_proj.weight"], sd["self_attn.k_proj.weight"],
             sd["self_attn.v_proj.weight"]], axis=0)
        p[f"{pre}.attn.in_proj_bias"] = np.concatenate(
            [sd["self_attn.q_proj.bias"], sd["self_attn.k_proj.bias"],
             sd["self_attn.v_proj.bias"]], axis=0)
        p[f"{pre}.attn.out_proj.weight"] = sd["self_attn.out_proj.weight"]
        p[f"{pre}.attn.out_proj.bias"] = sd["self_attn.out_proj.bias"]
        p[f"{pre}.mlp.c_fc.weight"] = sd["mlp.fc1.weight"]
        p[f"{pre}.mlp.c_fc.bias"] = sd["mlp.fc1.bias"]
        p[f"{pre}.mlp.c_proj.weight"] = sd["mlp.fc2.weight"]
        p[f"{pre}.mlp.c_proj.bias"] = sd["mlp.fc2.bias"]
    return p


def test_text_tower_parity_penultimate():
    model = _hf_text_model()
    tm = model.text_model
    p = _layer_params(tm.encoder.layers, "transformer.resblocks.{}")
    p["token_embedding.weight"] = tm.embeddings.token_embedding.weight.detach().numpy()
    p["positional_embedding"] = tm.embeddings.position_embedding.weight.detach().numpy()
    p["ln_final.weight"] = tm.final_layer_norm.weight.detach().numpy()
    p["ln_final.bias"] = tm.final_layer_norm.bias.detach().numpy()
    p = {k: jnp.asarray(v) for k, v in p.items()}

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, VOCAB, (2, CTX)).astype(np.int32)

    cfg = C.TextConfig(vocab_size=VOCAB, width=WIDTH, heads=HEADS,
                       layers=LAYERS, context_length=CTX, penultimate=True)
    ours = np.asarray(C.text_encode(p, cfg, jnp.asarray(tokens)))

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(tokens).long(),
                    output_hidden_states=True)
        # penultimate = stop one block early (hidden_states[-2]), then the
        # reference applies ln_final on top (condition.py:220)
        ref = tm.final_layer_norm(out.hidden_states[-2]).numpy()

    assert np.max(np.abs(ours - ref)) < 2e-5, np.max(np.abs(ours - ref))


def test_text_tower_parity_last():
    model = _hf_text_model()
    tm = model.text_model
    p = _layer_params(tm.encoder.layers, "transformer.resblocks.{}")
    p["token_embedding.weight"] = tm.embeddings.token_embedding.weight.detach().numpy()
    p["positional_embedding"] = tm.embeddings.position_embedding.weight.detach().numpy()
    p["ln_final.weight"] = tm.final_layer_norm.weight.detach().numpy()
    p["ln_final.bias"] = tm.final_layer_norm.bias.detach().numpy()
    p = {k: jnp.asarray(v) for k, v in p.items()}

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, VOCAB, (2, CTX)).astype(np.int32)

    cfg = C.TextConfig(vocab_size=VOCAB, width=WIDTH, heads=HEADS,
                       layers=LAYERS, context_length=CTX, penultimate=False)
    ours = np.asarray(C.text_encode(p, cfg, jnp.asarray(tokens)))

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens).long()).last_hidden_state.numpy()

    assert np.max(np.abs(ours - ref)) < 2e-5, np.max(np.abs(ours - ref))


def test_vision_tower_parity_tokens_no_ln_post():
    model = _hf_vision_model()
    vm = model.vision_model
    p = _layer_params(vm.encoder.layers, "transformer.resblocks.{}")
    p["conv1.weight"] = vm.embeddings.patch_embedding.weight.detach().numpy()
    p["class_embedding"] = vm.embeddings.class_embedding.detach().numpy()
    p["positional_embedding"] = vm.embeddings.position_embedding.weight.detach().numpy()
    # HF attribute is literally "pre_layrnorm"
    p["ln_pre.weight"] = vm.pre_layrnorm.weight.detach().numpy()
    p["ln_pre.bias"] = vm.pre_layrnorm.bias.detach().numpy()
    p = {k: jnp.asarray(v) for k, v in p.items()}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)

    cfg = C.VisionConfig(width=WIDTH, heads=HEADS, layers=LAYERS,
                         patch_size=PATCH, image_size=IMG)
    ours = np.asarray(C.image_encode_preprocessed(p, cfg, jnp.asarray(x)))

    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                    output_hidden_states=True)
        # V2 embedder returns raw tokens with NO post layernorm -> the last
        # hidden state BEFORE HF applies post_layernorm = hidden_states[-1]
        ref = out.hidden_states[-1].numpy()

    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 2e-5, np.max(np.abs(ours - ref))
