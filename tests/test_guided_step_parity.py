"""One full scene-grounding guided DDIM step: our JAX implementation vs the
EXECUTED reference DDIMSamplerGuidance (ddim_guidance.py:205-363), both
running the SAME tiny UNet3D + VAE decoder weights (reference torch modules;
converted with diffusion/convert.from_torch_module for the JAX side).

This pins the cross-component wiring no per-module parity test covers:
the stop-gradient barrier between dL/dpred_x0 (per-frame differentiable VAE
decode + numel normalization, :305-327) and the UNet-pair vjp
(pred_x0.backward(gradient=..., inputs=x), :337-339), the dynamic-rescale
factor riding inside that vjp, and the adaptive step
rho = RMS(e_c - e_u) * cfg / RMS(dL/dx) * 0.2 (:346-354).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/third_party/ViewCrafter")

from lvdm.common import extract_into_tensor  # noqa: E402
from lvdm.models.samplers.ddim_guidance import DDIMSamplerGuidance  # noqa: E402
from lvdm.modules.networks.ae_modules import Decoder  # noqa: E402
from lvdm.modules.networks.openaimodel3d import UNetModel  # noqa: E402

from guidedvd3dgs_tpu.diffusion import schedules as S  # noqa: E402
from guidedvd3dgs_tpu.diffusion.convert import from_torch_module  # noqa: E402
from guidedvd3dgs_tpu.diffusion.model import (  # noqa: E402
    Conditioning,
    DiffusionParams,
    LatentDiffusionConfig,
)
from guidedvd3dgs_tpu.diffusion.samplers.ddim_guidance import (  # noqa: E402
    GuidedSampleConfig,
    _guided_step,
)
from guidedvd3dgs_tpu.diffusion.unet3d import UNetConfig  # noqa: E402
from guidedvd3dgs_tpu.diffusion.vae import VAEConfig  # noqa: E402

pytestmark = pytest.mark.slow

B, T, HL, WL = 1, 2, 8, 8  # batch, frames, latent h/w (tiny VAE: no downsample)
CTX_DIM, N_CTX = 16, 7
SCALE = 0.18215
W_RECON = 0.5


def _tiny_cfg():
    return LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(1,), channel_mult=(1,), num_head_channels=8,
            context_dim=CTX_DIM, temporal_length=T,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(),
                      resolution=HL, z_channels=4),
    )


def _build_models(cfg):
    """Torch UNet + VAE decoder with zero-init weights randomized IN TORCH so
    both frameworks share identical parameters."""
    torch.manual_seed(0)
    u = cfg.unet
    unet = UNetModel(
        in_channels=u.in_channels, out_channels=u.out_channels,
        model_channels=u.model_channels, num_res_blocks=u.num_res_blocks,
        attention_resolutions=list(u.attention_resolutions),
        channel_mult=list(u.channel_mult), num_head_channels=u.num_head_channels,
        transformer_depth=1, context_dim=u.context_dim, use_linear=True,
        use_checkpoint=False, temporal_conv=u.temporal_conv,
        temporal_attention=u.temporal_attention, temporal_selfatt_only=True,
        use_relative_position=False, use_causal_attention=False,
        temporal_length=u.temporal_length, addition_attention=u.addition_attention,
        image_cross_attention=u.image_cross_attention, fs_condition=u.fs_condition,
    )
    with torch.no_grad():
        for n, p in unet.named_parameters():
            if n == "out.2.weight" or n.endswith("proj_out.weight"):
                p.normal_(0.0, 0.02)  # zero_module init would make CFG 0/0
    v = cfg.vae
    dec = Decoder(double_z=True, z_channels=v.z_channels, resolution=v.resolution,
                  in_channels=3, out_ch=3, ch=v.ch, ch_mult=list(v.ch_mult),
                  num_res_blocks=v.num_res_blocks, attn_resolutions=[], dropout=0.0)
    post = torch.nn.Conv2d(v.z_channels, v.z_channels, 1)

    vae_p = {}
    for pre, mod in [("decoder.", dec), ("post_quant_conv.", post)]:
        for k, w in from_torch_module(mod).items():
            vae_p[pre + k] = w
    params = DiffusionParams(unet=from_torch_module(unet), vae=vae_p,
                             resampler={}, clip_text={}, clip_image={})
    return unet, dec, post, params


class _CPUGuidedSampler(DDIMSamplerGuidance):
    def register_buffer(self, name, attr):  # reference forces .cuda()
        if isinstance(attr, torch.Tensor):
            attr = attr.to("cpu")
        setattr(self, name, attr)


class _StubModel:
    parameterization = "v"
    use_dynamic_rescale = True
    device = torch.device("cpu")

    def __init__(self, sched, unet, dec, post):
        tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
        self.num_timesteps = int(sched.num_timesteps)
        self.betas = tt(sched.betas)
        self.alphas_cumprod = tt(sched.alphas_cumprod)
        self.alphas_cumprod_prev = tt(sched.alphas_cumprod_prev)
        self.sqrt_alphas_cumprod = tt(sched.sqrt_alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = tt(sched.sqrt_one_minus_alphas_cumprod)
        self.scale_arr = tt(sched.scale_arr)
        self.model = unet  # p_sample_ddim calls .requires_grad_(True) on these
        self.first_stage_model = torch.nn.ModuleList([dec, post])
        self._dec, self._post = dec, post

    def apply_model(self, x, t, c, fs=None, **kw):
        # DiffusionWrapper 'hybrid' (ddpm3d.py:1447-1452): channel-concat +
        # cross-attn context; extra kwargs (loss_guidance_fn) ignored like the
        # real wrapper's **kwargs passthrough
        xc = torch.cat([x, c["c_concat"][0]], dim=1)
        return self.model(xc, t, context=c["c_crossattn"][0], fs=fs)

    # v-param identities as in reference ddpm3d.py:239-250
    def predict_start_from_z_and_v(self, x_t, t, v):
        return (
            extract_into_tensor(self.sqrt_alphas_cumprod, t, x_t.shape) * x_t
            - extract_into_tensor(self.sqrt_one_minus_alphas_cumprod, t, x_t.shape) * v
        )

    def predict_eps_from_z_and_v(self, x_t, t, v):
        return (
            extract_into_tensor(self.sqrt_alphas_cumprod, t, x_t.shape) * v
            + extract_into_tensor(self.sqrt_one_minus_alphas_cumprod, t, x_t.shape) * x_t
        )

    def differentiable_decode_first_stage(self, z):
        # perframe decode of (1, 4, 1, h, w) (ddpm3d.py:646-675)
        d = self._dec(self._post(z[:, :, 0] / SCALE))
        return d.unsqueeze(2)


class _RefLoss:
    """Duck-typed LossGuidance with the same masked-L2 math as the JAX side."""

    verbose = False
    recur_steps = 1
    scale_guidance_weight = False
    mean_loss = False
    current_train_iter = 0

    def __init__(self, target, mask):
        self.target = torch.from_numpy(target)  # (T, 3, H, W)
        self.mask = torch.from_numpy(mask)  # (T, 1, H, W)

    def __call__(self, d, index, b0, b1):
        # d: (3, n_frames, H, W); reference indexes frames [b0:b1]
        diff = (d.permute(1, 0, 2, 3) - self.target[b0:b1]) ** 2
        loss = W_RECON * (diff * self.mask[b0:b1]).sum()
        numel = self.mask[b0:b1].sum() * 3
        return {"recon": loss}, numel

    def save_pred_x0(self, x, index):
        pass


def test_guided_step_parity_full_stack():
    cfg = _tiny_cfg()
    unet, dec, post, params = _build_models(cfg)
    sched = S.make_schedule()
    rng = np.random.default_rng(0)

    x = rng.normal(size=(B, 4, T, HL, WL)).astype(np.float32)
    concat = (rng.normal(size=(B, 4, T, HL, WL)) * 0.1).astype(np.float32)
    ctx = rng.normal(size=(B, N_CTX, CTX_DIM)).astype(np.float32)
    ctx_u = np.zeros_like(ctx)
    fs = np.array([10], np.int64)
    target = (rng.uniform(-1, 1, size=(T, 3, HL, WL))).astype(np.float32)
    mask = (rng.uniform(size=(T, 1, HL, WL)) > 0.3).astype(np.float32)

    index = 2

    # ---- reference ----
    stub = _StubModel(sched, unet, dec, post)
    sampler = _CPUGuidedSampler(stub)
    sampler.make_schedule(ddim_num_steps=5, ddim_discretize="uniform_trailing",
                          ddim_eta=0.0, verbose=False)
    step = int(sampler.ddim_timesteps[index])
    ts = torch.full((B,), step, dtype=torch.long)
    cond_t = {"c_crossattn": [torch.from_numpy(ctx)],
              "c_concat": [torch.from_numpy(concat)]}
    uncond_t = {"c_crossattn": [torch.from_numpy(ctx_u)],
                "c_concat": [torch.from_numpy(concat)]}
    x_prev_ref, pred_x0_ref = sampler.p_sample_ddim(
        torch.from_numpy(x), cond_t, ts, index=index,
        unconditional_guidance_scale=7.5,
        unconditional_conditioning=uncond_t, guidance_rescale=0.7,
        loss_guidance_fn=_RefLoss(target, mask), fs=torch.from_numpy(fs),
    )

    # ---- ours ----
    pr = S.make_ddim_params(sched, 5, eta=0.0, method="uniform_trailing")
    to_tc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 4, 1)))  # BCTHW->BTHWC
    cond = Conditioning(context=jnp.asarray(ctx), concat=to_tc(concat),
                        fs=jnp.asarray(fs, jnp.int32))
    uncond = Conditioning(context=jnp.asarray(ctx_u), concat=to_tc(concat),
                          fs=jnp.asarray(fs, jnp.int32))
    target_j = jnp.asarray(np.transpose(target, (0, 2, 3, 1)))  # (T, H, W, 3)
    mask_j = jnp.asarray(np.transpose(mask, (0, 2, 3, 1)))  # (T, H, W, 1)

    def guidance_fn(d, idx, frame_idx):
        diff = (d - target_j[frame_idx]) ** 2
        loss = W_RECON * (diff * mask_j[frame_idx]).sum()
        return loss, mask_j[frame_idx].sum() * 3

    x_prev, pred_x0, _ = _guided_step(
        params, cfg, sched, pr, cond, uncond,
        GuidedSampleConfig(cfg_scale=7.5, guidance_rescale=0.7),
        guidance_fn, jnp.asarray(1.0),
        to_tc(x), jnp.asarray(index), jax.random.key(0),
    )

    ours_x_prev = np.transpose(np.asarray(x_prev), (0, 4, 1, 2, 3))
    ours_pred_x0 = np.transpose(np.asarray(pred_x0), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_pred_x0, pred_x0_ref.detach().numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(ours_x_prev, x_prev_ref.detach().numpy(),
                               rtol=3e-4, atol=3e-4)
