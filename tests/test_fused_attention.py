"""Fused (flash) attention dispatch for long self-attention sequences.

The UNet/VAE spatial self-attention at full engine size (N = 2240 tokens,
25 frames) dispatches to the Pallas TPU flash kernel instead of the
einsum path, which would materialize (B, H, N, N) f32 logits (~2.5 GB for
the base level). CPU tier validates the padding + segment-id plumbing of
`_flash_attention_padded` against the einsum path using the kernel's own
`mha_reference`; the tpu tier runs the real Mosaic kernel
(reference semantics: lvdm/modules/attention.py:100-127 — plain softmax
attention; the fused path must be numerically equivalent).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guidedvd3dgs_tpu.diffusion import nnops


def _einsum_attn(q, k, v, scale):
    sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def _make_qkv(b=2, h=3, n=1200, d=64, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, h, n, d)
    return tuple(jax.random.normal(kk, shape, dtype) for kk in ks)


def test_padded_wrapper_matches_einsum_via_reference(monkeypatch):
    """Padding + segment ids feed the kernel correctly: with the kernel
    replaced by its pure-JAX reference, the wrapper must reproduce plain
    softmax attention despite the 1200 -> 1280 pad."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    q, k, v = _make_qkv()
    scale = 0.125

    def fake_kernel(q, k, v, segment_ids=None, sm_scale=1.0, block_sizes=None):
        return fa.mha_reference(q, k, v, None, segment_ids, sm_scale=sm_scale)

    import jax.experimental.pallas.ops.tpu.flash_attention as fmod
    monkeypatch.setattr(fmod, "flash_attention", fake_kernel)
    out = nnops._flash_attention_padded(q, k, v, scale)
    ref = _einsum_attn(q, k, v, scale)
    # mha_reference runs its matmuls in bf16 (jax.default_matmul_precision)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    assert out.shape == q.shape


def test_dispatch_einsum_on_cpu():
    """On CPU the fused path must not trigger (flash kernel is TPU-only)."""
    q, k, v = _make_qkv(n=1200)
    out = nnops.attention(q, k, v, 0.125)
    ref = _einsum_attn(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.tpu
def test_flash_matches_einsum_on_tpu_hardware():
    """Real Mosaic flash kernel vs einsum attention on the attached TPU at
    the engine's base-level spatial shape (N = 2240 -> padded 2304)."""
    q, k, v = _make_qkv(b=2, h=2, n=2240, d=64, dtype=jnp.bfloat16, seed=3)
    scale = 64.0 ** -0.5
    out = jax.jit(nnops._flash_attention_padded, static_argnums=3)(q, k, v, scale)
    ref = jax.jit(_einsum_attn, static_argnums=3)(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize("bh,n,g", [(256, 25, 5), (250, 25, 4), (256, 16, 8),
                                    (257, 25, 5)])
def test_grouped_small_attention_matches_einsum(bh, n, g):
    """Block-diagonal grouped attention (the temporal-attention MXU form)
    is exact vs the einsum reference, including non-divisible batch pad."""
    q, k, v = _make_qkv(b=bh, h=1, n=n, d=8, seed=3)
    old = nnops._SMALL_ATTN_GROUP[0]
    try:
        nnops.set_small_attn_group(g)
        out = nnops._grouped_small_attention(q, k, v, 0.125)
    finally:
        nnops.set_small_attn_group(old)
    ref = _einsum_attn(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_grouped_small_attention_bf16():
    q, k, v = _make_qkv(b=300, h=2, n=25, d=16, dtype=jnp.bfloat16, seed=5)
    out = nnops._grouped_small_attention(q, k, v, 0.25)
    ref = _einsum_attn(q, k, v, 0.25)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_fused_kill_switch_covers_grouped_form(monkeypatch):
    """set_fused_attention(False) must restore plain-einsum semantics for
    EVERY optimized dispatch, including the grouped small-sequence form
    (r5 review): with the switch off, the grouped path must not be taken
    even when its shape conditions hold on TPU."""
    import jax.numpy as jnp
    from guidedvd3dgs_tpu.diffusion import nnops

    calls = []
    real = nnops._grouped_small_attention
    monkeypatch.setattr(nnops, "_grouped_small_attention",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    monkeypatch.setattr(nnops.jax, "default_backend", lambda: "tpu")
    old_group = nnops._SMALL_ATTN_GROUP[0]
    nnops.set_small_attn_group(5)
    q = jnp.zeros((256, 5, 8, 16))
    try:
        nnops.set_fused_attention(False)
        nnops.attention(q, q, q, 0.25)
        assert not calls, "grouped form taken despite kill-switch off"
        nnops.set_fused_attention(True)
        nnops.attention(q, q, q, 0.25)
        assert calls, "grouped form not taken with switch on (shape gate changed?)"
    finally:
        nnops.set_fused_attention(True)
        nnops.set_small_attn_group(old_group)
