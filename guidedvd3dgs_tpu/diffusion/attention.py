"""Transformer blocks of the video diffusion UNet (L4b).

Functional JAX equivalents of the reference attention stack
(reference: third_party/ViewCrafter/lvdm/modules/attention.py): CrossAttention
with optional image cross-attention (separate K/V over the image tokens,
added at scale; :42-210), BasicTransformerBlock (:212-247), SpatialTransformer
(:249-311), TemporalTransformer (:313-413) with optional relative-position
bias and causal masking. Parameters live in a flat torch-named dict; the
xformers path of the reference is replaced by XLA attention (TPU-native).

Activations are channels-last; `prefix` strings mirror torch module paths.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import (
    Params,
    attention,
    conv1d_k1,
    conv2d,
    gelu,
    group_norm,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)


def relative_position_bias(
    p: Params, name: str, length_q: int, length_k: int, max_rel: int
) -> jnp.ndarray:
    """(Lq, Lk, D) gathered embedding table (reference attention.py:20-39)."""
    table = p[f"{name}.embeddings_table"]
    dist = jnp.arange(length_k)[None, :] - jnp.arange(length_q)[:, None]
    idx = jnp.clip(dist, -max_rel, max_rel) + max_rel
    return table[idx]


def cross_attention(
    p: Params,
    prefix: str,
    x: jnp.ndarray,  # (B, N, C)
    context: Optional[jnp.ndarray],
    heads: int,
    dim_head: int,
    mask: Optional[jnp.ndarray] = None,
    image_cross_attention: bool = False,
    image_cross_attention_scale: float = 1.0,
    text_context_len: int = 77,
    relative_position: bool = False,
    temporal_length: Optional[int] = None,
) -> jnp.ndarray:
    """reference attention.py:81-144 (einsum path; the xformers
    efficient_forward is numerically identical)."""
    scale = dim_head ** -0.5
    spatial_self_attn = context is None
    q = linear(p, f"{prefix}.to_q", x)

    ctx = x if context is None else context
    k_ip = v_ip = None
    if image_cross_attention and not spatial_self_attn:
        ctx_text = ctx[:, :text_context_len, :]
        ctx_img = ctx[:, text_context_len:, :]
        k = linear(p, f"{prefix}.to_k", ctx_text)
        v = linear(p, f"{prefix}.to_v", ctx_text)
        k_ip = linear(p, f"{prefix}.to_k_ip", ctx_img)
        v_ip = linear(p, f"{prefix}.to_v_ip", ctx_img)
    else:
        if not spatial_self_attn:
            ctx = ctx[:, :text_context_len, :]
        k = linear(p, f"{prefix}.to_k", ctx)
        v = linear(p, f"{prefix}.to_v", ctx)

    qh, kh, vh = split_heads(q, heads), split_heads(k, heads), split_heads(v, heads)

    bias = None
    if relative_position:
        assert temporal_length is not None
        k2 = relative_position_bias(
            p, f"{prefix}.relative_position_k", qh.shape[2], kh.shape[2], temporal_length
        )
        # (B,H,T,D),(T,S,D)->(B,H,T,S)
        bias = jnp.einsum("bhtd,tsd->bhts", qh.astype(jnp.float32), k2.astype(jnp.float32)) * scale

    m = None
    if mask is not None:
        m = mask[:, None, :, :] > 0.5  # (B,1,N,N)

    if relative_position:
        # need explicit weights for the v2 term (reference :100-127)
        import jax

        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32) * scale
        sim = sim + bias
        if m is not None:
            sim = jnp.where(m, sim, jnp.finfo(sim.dtype).min)
        attn_w = jax.nn.softmax(sim, axis=-1)
        out_h = jnp.einsum("bhij,bhjd->bhid", attn_w.astype(vh.dtype), vh)
        v2 = relative_position_bias(
            p, f"{prefix}.relative_position_v", qh.shape[2], vh.shape[2], temporal_length
        )
        out_h = out_h + jnp.einsum("bhts,tsd->bhtd", attn_w.astype(v2.dtype), v2)
    else:
        out_h = attention(qh, kh, vh, scale, mask=m)
    out = merge_heads(out_h)

    if k_ip is not None:
        k_iph, v_iph = split_heads(k_ip, heads), split_heads(v_ip, heads)
        out_ip = merge_heads(attention(qh, k_iph, v_iph, scale))
        if f"{prefix}.alpha" in p:
            out = out + image_cross_attention_scale * out_ip * (jnp.tanh(p[f"{prefix}.alpha"]) + 1.0)
        else:
            out = out + image_cross_attention_scale * out_ip

    return linear(p, f"{prefix}.to_out.0", out)


def feed_forward(p: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """GEGLU feed-forward (reference attention.py:415-442, glu=True)."""
    h = linear(p, f"{prefix}.net.0.proj", x)
    a, gate = jnp.split(h, 2, axis=-1)
    return linear(p, f"{prefix}.net.2", a * gelu(gate))


def basic_transformer_block(
    p: Params,
    prefix: str,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray],
    heads: int,
    dim_head: int,
    mask: Optional[jnp.ndarray] = None,
    image_cross_attention: bool = False,
    relative_position: bool = False,
    temporal_length: Optional[int] = None,
) -> jnp.ndarray:
    """reference attention.py:240-247 (_forward): self-attn, cross-attn, FF."""
    x = cross_attention(
        p, f"{prefix}.attn1", layer_norm(p, f"{prefix}.norm1", x), None,
        heads, dim_head, mask=mask,
        relative_position=relative_position, temporal_length=temporal_length,
    ) + x
    x = cross_attention(
        p, f"{prefix}.attn2", layer_norm(p, f"{prefix}.norm2", x), context,
        heads, dim_head, mask=mask,
        image_cross_attention=image_cross_attention,
        relative_position=relative_position, temporal_length=temporal_length,
    ) + x
    x = feed_forward(p, f"{prefix}.ff", layer_norm(p, f"{prefix}.norm3", x)) + x
    return x


def spatial_transformer(
    p: Params,
    prefix: str,
    x: jnp.ndarray,  # (B, H, W, C)
    context: Optional[jnp.ndarray],
    heads: int,
    dim_head: int,
    depth: int = 1,
    use_linear: bool = True,
    image_cross_attention: bool = False,
) -> jnp.ndarray:
    """reference attention.py:294-311."""
    b, h, w, c = x.shape
    x_in = x
    x = group_norm(p, f"{prefix}.norm", x, eps=1e-6)
    if not use_linear:
        x = conv2d(p, f"{prefix}.proj_in", x, padding=0)
    x = x.reshape(b, h * w, x.shape[-1])
    if use_linear:
        x = linear(p, f"{prefix}.proj_in", x)
    for d in range(depth):
        x = basic_transformer_block(
            p, f"{prefix}.transformer_blocks.{d}", x, context, heads, dim_head,
            image_cross_attention=image_cross_attention,
        )
    if use_linear:
        x = linear(p, f"{prefix}.proj_out", x)
    x = x.reshape(b, h, w, x.shape[-1])
    if not use_linear:
        x = conv2d(p, f"{prefix}.proj_out", x, padding=0)
    return x + x_in


def temporal_transformer(
    p: Params,
    prefix: str,
    x: jnp.ndarray,  # (B, T, H, W, C)
    context: Optional[jnp.ndarray],
    heads: int,
    dim_head: int,
    depth: int = 1,
    use_linear: bool = False,
    only_self_att: bool = True,
    causal_attention: bool = False,
    relative_position: bool = False,
    temporal_length: Optional[int] = None,
) -> jnp.ndarray:
    """reference attention.py:366-413: tokens are the T frames per (b,h,w)."""
    b, t, h, w, c = x.shape
    x_in = x
    x = group_norm(p, f"{prefix}.norm", x, eps=1e-6)
    # (b h w) t c token layout
    x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
    if use_linear:
        x = linear(p, f"{prefix}.proj_in", x)
    else:
        x = conv1d_k1(p, f"{prefix}.proj_in", x)

    mask = None
    if causal_attention:
        mask = jnp.tril(jnp.ones((1, t, t), jnp.float32))
        mask = jnp.broadcast_to(mask, (b * h * w, t, t))

    if only_self_att:
        ctx = None
    else:
        # context: ((b t), L, C) -> per-frame repeated over hw (reference :393-404)
        raise NotImplementedError("only_self_att=False is unused by guidedvd")

    for d in range(depth):
        x = basic_transformer_block(
            p, f"{prefix}.transformer_blocks.{d}", x, ctx, heads, dim_head,
            mask=mask, relative_position=relative_position,
            temporal_length=temporal_length,
        )

    if use_linear:
        x = linear(p, f"{prefix}.proj_out", x)
    else:
        x = conv1d_k1(p, f"{prefix}.proj_out", x)
    x = x.reshape(b, h, w, t, x.shape[-1]).transpose(0, 3, 1, 2, 4)
    return x + x_in
