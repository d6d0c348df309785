"""Random initialization of the UNet3D parameter dict (torch-named).

Builds the exact key set the checkpoint converter produces, for tests,
multi-chip dryruns and development without the ViewCrafter weights. Shapes
mirror the reference constructors (see unet3d.py / attention.py citations).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig, build_layout


class _Init:
    """Host-side numpy sampling (one jax.random dispatch per tensor costs
    ~100s for the full 320-channel UNet; numpy does the whole init in ~2s)."""

    def __init__(self, rng, scale=0.02):
        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        self.rng = np.random.default_rng(seed)
        self.scale = scale
        self.p: Dict[str, jnp.ndarray] = {}

    def _normal(self, shape):
        x = self.rng.standard_normal(shape, dtype=np.float32)
        x *= self.scale
        return x

    def linear(self, name, out_d, in_d, bias=True):
        self.p[f"{name}.weight"] = self._normal((out_d, in_d))
        if bias:
            self.p[f"{name}.bias"] = np.zeros((out_d,), np.float32)

    def conv2d(self, name, out_c, in_c, k=3):
        self.p[f"{name}.weight"] = self._normal((out_c, in_c, k, k))
        self.p[f"{name}.bias"] = np.zeros((out_c,), np.float32)

    def conv3d(self, name, out_c, in_c, kshape):
        self.p[f"{name}.weight"] = self._normal((out_c, in_c) + kshape)
        self.p[f"{name}.bias"] = np.zeros((out_c,), np.float32)

    def conv1d(self, name, out_c, in_c):
        self.p[f"{name}.weight"] = self._normal((out_c, in_c, 1))
        self.p[f"{name}.bias"] = np.zeros((out_c,), np.float32)

    def norm(self, name, c):
        self.p[f"{name}.weight"] = np.ones((c,), np.float32)
        self.p[f"{name}.bias"] = np.zeros((c,), np.float32)


def _attn_block(ini: _Init, pre: str, dim: int, ctx: int, image_cross: bool):
    for i in (1, 2, 3):
        ini.norm(f"{pre}.norm{i}", dim)
    ini.linear(f"{pre}.attn1.to_q", dim, dim, bias=False)
    ini.linear(f"{pre}.attn1.to_k", dim, dim, bias=False)
    ini.linear(f"{pre}.attn1.to_v", dim, dim, bias=False)
    ini.linear(f"{pre}.attn1.to_out.0", dim, dim)
    ini.linear(f"{pre}.attn2.to_q", dim, dim, bias=False)
    ini.linear(f"{pre}.attn2.to_k", dim, ctx, bias=False)
    ini.linear(f"{pre}.attn2.to_v", dim, ctx, bias=False)
    if image_cross:
        ini.linear(f"{pre}.attn2.to_k_ip", dim, ctx, bias=False)
        ini.linear(f"{pre}.attn2.to_v_ip", dim, ctx, bias=False)
    ini.linear(f"{pre}.attn2.to_out.0", dim, dim)
    ini.linear(f"{pre}.ff.net.0.proj", 8 * dim, dim)
    ini.linear(f"{pre}.ff.net.2", dim, 4 * dim)


def _spatial(ini: _Init, pre: str, ch: int, cfg: UNetConfig):
    ini.norm(f"{pre}.norm", ch)
    ini.linear(f"{pre}.proj_in", ch, ch)
    _attn_block(ini, f"{pre}.transformer_blocks.0", ch, cfg.context_dim,
                cfg.image_cross_attention)
    ini.linear(f"{pre}.proj_out", ch, ch)


def _temporal(ini: _Init, pre: str, ch: int, cfg: UNetConfig, use_linear=True,
              inner: int = 0):
    inner = inner or ch
    ini.norm(f"{pre}.norm", ch)
    if use_linear:
        ini.linear(f"{pre}.proj_in", inner, ch)
        ini.linear(f"{pre}.proj_out", ch, inner)
    else:
        ini.conv1d(f"{pre}.proj_in", inner, ch)
        ini.conv1d(f"{pre}.proj_out", ch, inner)
    # only_self_att: attn2 context defaults to the query dim (reference
    # attention.py:363-366 — context_dim=None in the temporal blocks)
    _attn_block(ini, f"{pre}.transformer_blocks.0", inner, inner, False)


def _res(ini: _Init, pre: str, in_ch: int, out_ch: int, temb: int, temporal: bool):
    ini.norm(f"{pre}.in_layers.0", in_ch)
    ini.conv2d(f"{pre}.in_layers.2", out_ch, in_ch)
    ini.linear(f"{pre}.emb_layers.1", out_ch, temb)
    ini.norm(f"{pre}.out_layers.0", out_ch)
    ini.conv2d(f"{pre}.out_layers.3", out_ch, out_ch)
    if in_ch != out_ch:
        ini.p[f"{pre}.skip_connection.weight"] = ini._normal((out_ch, in_ch, 1, 1))
        ini.p[f"{pre}.skip_connection.bias"] = np.zeros((out_ch,), np.float32)
    if temporal:
        tc = f"{pre}.temopral_conv"
        ini.norm(f"{tc}.conv1.0", out_ch)
        ini.conv3d(f"{tc}.conv1.2", out_ch, out_ch, (3, 1, 1))
        for i in (2, 3, 4):
            ini.norm(f"{tc}.conv{i}.0", out_ch)
            ini.conv3d(f"{tc}.conv{i}.3", out_ch, out_ch, (3, 1, 1))


def init_unet_params(cfg: UNetConfig, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    """Complete init including down/upsample convs (channel bookkeeping
    mirrors build_layout)."""
    ini = _Init(rng)
    mc = cfg.model_channels
    temb = 4 * mc
    ini.linear("time_embed.0", temb, mc)
    ini.linear("time_embed.2", temb, temb)
    if cfg.fs_condition:
        ini.linear("fps_embedding.0", temb, mc)
        ini.linear("fps_embedding.2", temb, temb)

    input_blocks, middle, output_blocks = build_layout(cfg)

    # channel tracking identical to unet3d.build_layout
    ch_after: Dict[str, int] = {}
    ch = mc
    for layers in input_blocks:
        for kind, prefix, meta in layers:
            if kind == "conv_in":
                ini.conv2d(prefix, mc, cfg.in_channels)
                ch = mc
            elif kind == "res":
                _res(ini, prefix, meta["in_ch"], meta["out_ch"], temb, meta["temporal"])
                ch = meta["out_ch"]
            elif kind == "spatial":
                _spatial(ini, prefix, ch, cfg)
            elif kind == "temporal":
                _temporal(ini, prefix, ch, cfg)
            elif kind == "down":
                ini.conv2d(f"{prefix}.op", ch, ch)
    for kind, prefix, meta in middle:
        if kind == "res":
            _res(ini, prefix, meta["in_ch"], meta["out_ch"], temb, meta["temporal"])
            ch = meta["out_ch"]
        elif kind == "spatial":
            _spatial(ini, prefix, ch, cfg)
        elif kind == "temporal":
            _temporal(ini, prefix, ch, cfg)
    for layers in output_blocks:
        for kind, prefix, meta in layers:
            if kind == "res":
                _res(ini, prefix, meta["in_ch"], meta["out_ch"], temb, meta["temporal"])
                ch = meta["out_ch"]
            elif kind == "spatial":
                _spatial(ini, prefix, ch, cfg)
            elif kind == "temporal":
                _temporal(ini, prefix, ch, cfg)
            elif kind == "up":
                ini.conv2d(f"{prefix}.conv", ch, ch)

    if cfg.addition_attention:
        _temporal(ini, "init_attn.0", mc, cfg, use_linear=False,
                  inner=8 * cfg.num_head_channels)

    ini.norm("out.0", mc)
    ini.conv2d("out.2", cfg.out_channels, mc)
    return ini.p


def init_vae_params(cfg, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    """Random AutoencoderKL params (key set mirrors diffusion/vae.py)."""
    ini = _Init(rng)

    def res(prefix, cin, cout):
        ini.norm(f"{prefix}.norm1", cin)
        ini.conv2d(f"{prefix}.conv1", cout, cin)
        ini.norm(f"{prefix}.norm2", cout)
        ini.conv2d(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            ini.conv2d(f"{prefix}.nin_shortcut", cout, cin, k=1)

    def attn(prefix, c):
        ini.norm(f"{prefix}.norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            ini.conv2d(f"{prefix}.{nm}", c, c, k=1)

    n = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)
    # encoder
    ini.conv2d("encoder.conv_in", cfg.ch, cfg.in_channels)
    for i in range(n):
        cin = cfg.ch * in_mult[i]
        cout = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", cin, cout)
            cin = cout
        if i != n - 1:
            ini.conv2d(f"encoder.down.{i}.downsample.conv", cout, cout)
    ch = cfg.ch * cfg.ch_mult[-1]
    res("encoder.mid.block_1", ch, ch)
    attn("encoder.mid.attn_1", ch)
    res("encoder.mid.block_2", ch, ch)
    ini.norm("encoder.norm_out", ch)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    ini.conv2d("encoder.conv_out", zc, ch)
    ini.conv2d("quant_conv", 2 * cfg.embed_dim, zc, k=1)
    # decoder
    ini.conv2d("post_quant_conv", cfg.z_channels, cfg.embed_dim, k=1)
    block_in = cfg.ch * cfg.ch_mult[-1]
    ini.conv2d("decoder.conv_in", block_in, cfg.z_channels)
    res("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in)
    for i in reversed(range(n)):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", block_in, block_out)
            block_in = block_out
        if i != 0:
            ini.conv2d(f"decoder.up.{i}.upsample.conv", block_in, block_in)
    ini.norm("decoder.norm_out", block_in)
    ini.conv2d("decoder.conv_out", cfg.out_ch, block_in)
    return ini.p


def _clip_resblocks(ini: _Init, width: int, layers: int):
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        ini.norm(f"{pre}.ln_1", width)
        ini.norm(f"{pre}.ln_2", width)
        ini.p[f"{pre}.attn.in_proj_weight"] = ini._normal((3 * width, width))
        ini.p[f"{pre}.attn.in_proj_bias"] = np.zeros((3 * width,), np.float32)
        ini.linear(f"{pre}.attn.out_proj", width, width)
        ini.linear(f"{pre}.mlp.c_fc", 4 * width, width)
        ini.linear(f"{pre}.mlp.c_proj", width, 4 * width)


def init_clip_text_params(cfg, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    ini = _Init(rng)
    ini.p["token_embedding.weight"] = ini._normal((cfg.vocab_size, cfg.width))
    ini.p["positional_embedding"] = ini._normal((cfg.context_length, cfg.width))
    _clip_resblocks(ini, cfg.width, cfg.layers)
    ini.norm("ln_final", cfg.width)
    return ini.p


def init_clip_image_params(cfg, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    ini = _Init(rng)
    grid = cfg.image_size // cfg.patch_size
    ini.p["conv1.weight"] = ini._normal((cfg.width, 3, cfg.patch_size, cfg.patch_size))
    ini.p["class_embedding"] = ini._normal((cfg.width,))
    ini.p["positional_embedding"] = ini._normal((grid * grid + 1, cfg.width))
    ini.norm("ln_pre", cfg.width)
    _clip_resblocks(ini, cfg.width, cfg.layers)
    return ini.p


def init_resampler_params(cfg, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    ini = _Init(rng)
    inner = cfg.dim_head * cfg.heads
    ini.p["latents"] = ini._normal((1, cfg.num_queries * cfg.video_length, cfg.dim))
    ini.linear("proj_in", cfg.dim, cfg.embedding_dim)
    for d in range(cfg.depth):
        a = f"layers.{d}.0"
        ini.norm(f"{a}.norm1", cfg.dim)
        ini.norm(f"{a}.norm2", cfg.dim)
        ini.linear(f"{a}.to_q", inner, cfg.dim, bias=False)
        ini.linear(f"{a}.to_kv", 2 * inner, cfg.dim, bias=False)
        ini.linear(f"{a}.to_out", cfg.dim, inner, bias=False)
        f = f"layers.{d}.1"
        ini.norm(f"{f}.0", cfg.dim)
        ini.linear(f"{f}.1", cfg.dim * cfg.ff_mult, cfg.dim, bias=False)
        ini.linear(f"{f}.3", cfg.dim, cfg.dim * cfg.ff_mult, bias=False)
    ini.linear("proj_out", cfg.output_dim, cfg.dim)
    ini.norm("norm_out", cfg.output_dim)
    return ini.p


def init_diffusion_params(mcfg, scfg, rng: jax.Array):
    """Full random DiffusionParams at any config — full-size memory smoke
    tests and weightless development runs."""
    from guidedvd3dgs_tpu.diffusion.model import DiffusionParams

    ks = jax.random.split(rng, 5)
    return DiffusionParams(
        unet=init_unet_params(mcfg.unet, ks[0]),
        vae=init_vae_params(mcfg.vae, ks[1]),
        resampler=init_resampler_params(scfg.resampler_config, ks[2]),
        clip_text=init_clip_text_params(scfg.text_config, ks[3]),
        clip_image=init_clip_image_params(scfg.vision_config, ks[4]),
    )
