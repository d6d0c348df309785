"""Scene-grounding guided DDIM sampler (the paper's Algorithm 1).

Equivalent of the reference `DDIMSamplerGuidance`
(reference: third_party/ViewCrafter/lvdm/models/samplers/ddim_guidance.py:205-363):
per step, the scene-grounding loss gradient w.r.t. the latent x is

    dL/dx = J^T_{x -> pred_x0} . (dL/dpred_x0 via per-frame VAE decode)

with a stop-gradient barrier between the two factors (the torch code's
clone().detach() per frame, :305-327, followed by pred_x0.backward(grad,
inputs=x), :337-339). In JAX the whole dance is one per-frame `jax.grad`
through the VAE decode plus one `jax.vjp` through the CFG'd UNet pair,
then the adaptive step

    rho = RMS(e_cond - e_uncond) * cfg_scale / RMS(dL/dx) * 0.2 * w
    x_prev <- x_prev - rho * dL/dx                         (:346-354)

and optional time-travel re-noising for recur_steps=2 (:360).

The per-frame guidance normalization divides by the mask numel
(:316-317, mean_loss=False path — the reference notes that taking .mean()
inside the loss produces zero grads in their setup, so loss is summed and
divided here).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.model import (
    Conditioning,
    DiffusionParams,
    LatentDiffusionConfig,
    apply_model,
    decode_frame,
)
from guidedvd3dgs_tpu.diffusion.samplers.ddim import ddim_step
from guidedvd3dgs_tpu.diffusion.schedules import (
    DDIMParams,
    DiffusionSchedule,
    predict_start_from_z_and_v,
    rescale_noise_cfg,
)

# guidance_fn(decoded_frame (H,W,3) in [-1,1], ddim_index, frame_idx)
#   -> (summed loss, numel normalizer)
GuidanceFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


class GuidedSampleConfig(NamedTuple):
    cfg_scale: float = 7.5
    guidance_rescale: float = 0.7
    temperature: float = 1.0
    rho_scale: float = 0.2  # reference :351 `rho_scale = 0.2 * scale_w`
    recur_steps: int = 1
    mean_loss: bool = False
    # How the CFG cond/uncond pair runs through the UNet inside the vjp
    # (pure perf/memory trade — all modes are numerically equivalent):
    #   "serial_ckpt": lax.map over the stacked pair with jax.checkpoint
    #       around each application. Minimum HBM: neither branch's residuals
    #       are ever stored, and the two recomputed backwards can never be
    #       scheduled concurrently. Maximum FLOPs (one extra full fwd per
    #       branch in the backward).
    #   "serial": lax.map over the pair, no outer checkpoint — the UNet's
    #       per-block remat (UNetConfig.remat) still bounds residuals to
    #       block boundaries, which persist from fwd to bwd.
    #   "batched": ONE UNet application at batch 2 (cond ++ uncond), no
    #       outer checkpoint. Best MXU utilization, highest transient HBM.
    #   "batched_ckpt": batch-2 application under jax.checkpoint — ONE
    #       recomputed forward serves both branches' backward (vs one per
    #       branch in serial_ckpt) and the batch feeds the MXU better.
    pair_mode: str = "serial_ckpt"
    # Frames per batched VAE-decode guidance gradient (1 = the reference's
    # per-frame loop, loss_guidance_batch=1 fallback ddim_guidance.py:299-327)
    decode_chunk: int = 1


def _per_frame_guidance_grads(
    floss,  # (z_frame, frame_idx) -> (summed loss, numel)
    zs: jnp.ndarray,  # (T, h, w, 4) pred_x0 latents
    scfg: GuidedSampleConfig,
) -> jnp.ndarray:
    """dL/dpred_x0 per frame through the VAE decode. decode_chunk > 1 runs
    that many frames per batched decode vjp (one scan step), trading HBM for
    MXU batch; any trajectory length is padded up to a chunk multiple
    (padded slots replay frame 0; their grads are sliced away)."""

    def frame_grad(z_f, frame_idx):
        g, numel = jax.grad(floss, has_aux=True)(z_f, frame_idx)
        if not scfg.mean_loss:
            g = g / numel
        return g

    n_frames = zs.shape[0]
    ck = max(1, min(int(scfg.decode_chunk), n_frames))
    if ck == 1:
        _, grads = jax.lax.scan(
            lambda c, inp: (c, frame_grad(*inp)), None,
            (zs, jnp.arange(n_frames)),
        )
        return grads
    pad = (-n_frames) % ck
    zsp = jnp.concatenate([zs, zs[:1].repeat(pad, 0)], 0) if pad else zs
    idx = jnp.arange(n_frames)
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    _, gchunks = jax.lax.scan(
        lambda c, inp: (c, jax.vmap(frame_grad)(*inp)), None,
        (zsp.reshape(-1, ck, *zs.shape[1:]), idx.reshape(-1, ck)),
    )
    return gchunks.reshape(-1, *zs.shape[1:])[:n_frames]


def _guided_step(
    params: DiffusionParams,
    mcfg: LatentDiffusionConfig,
    sched: DiffusionSchedule,
    pr: DDIMParams,
    cond: Conditioning,
    uncond: Conditioning,
    scfg: GuidedSampleConfig,
    guidance_fn: GuidanceFn,
    scale_guidance_weight: jnp.ndarray,
    x: jnp.ndarray,  # (1, T, h, w, 4)
    index: jnp.ndarray,  # () int32
    rng: jax.Array,
):
    b = x.shape[0]
    t = jnp.broadcast_to(pr.timesteps[index], (b,))
    rescale = pr.scale_arr_prev[index] / pr.scale_arr[index]

    known_modes = ("serial", "serial_ckpt", "serial_ckpt_half", "batched", "batched_ckpt")
    if scfg.pair_mode not in known_modes:
        # A typo'd mode must not silently fall through to the un-checkpointed
        # 'serial' branch — that would drop the serial_ckpt HBM protection
        # the default exists to provide (ADVICE r4).
        raise ValueError(f"unknown pair_mode {scfg.pair_mode!r}; expected one of {known_modes}")

    # HBM discipline for the vjp through the CFG pair (the production shape
    # 25x40x56 / model_channels 320 must fit a 16 GB v5e where the reference
    # uses a 32 GB V100):
    #   * jax.checkpoint around the UNet application — the vjp stores only
    #     its inputs, never the block-boundary activations of a full pass
    #     (stage B of tools/diffusion_fullsize_smoke.py OOMed without it);
    #   * lax.map over the STACKED cond/uncond conditioning — a sequential
    #     loop, so the two recomputed backward passes can never be scheduled
    #     concurrently by XLA (two overlapped UNet backwards double the
    #     transient working set).
    # Cost: one extra UNet fwd per branch in the backward — the deliberate
    # FLOPs-for-HBM trade.
    batched = scfg.pair_mode in ("batched", "batched_ckpt")
    if batched:
        # cond ++ uncond as one batch-2b UNet application. The vs[:b]/vs[b:]
        # split below is only correct when the conditioning batch matches
        # the latent batch — enforce it (a b>1 x over batch-1 conditioning
        # would mispair rows silently).
        if cond.context.shape[0] != b:
            raise ValueError(
                f"batched pair_mode requires conditioning batch == latent "
                f"batch, got {cond.context.shape[0]} vs {b}"
            )
        cu = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), cond, uncond)
    else:
        cu = jax.tree.map(lambda a, b: jnp.stack([a, b]), cond, uncond)

    def pred_x0_of_x(xv):
        if batched:
            xb = jnp.concatenate([xv, xv], axis=0)
            tb = jnp.concatenate([t, t], axis=0)
            app = lambda x_: apply_model(params, mcfg, x_, tb, cu)
            if scfg.pair_mode == "batched_ckpt":
                app = jax.checkpoint(app)
            vs = app(xb)
            # cond occupies the first b batch rows, uncond the last b —
            # slice with the actual batch size (b>1 safe, ADVICE r4).
            v_cond, v_uncond = vs[:b], vs[b:]
        elif scfg.pair_mode == "serial_ckpt_half":
            # asymmetric checkpointing: the cond branch keeps its
            # block-boundary residuals (~1.5 GB under block remat) so its
            # backward needs NO recompute; only the uncond branch pays the
            # recompute. An optimization_barrier threads a data dependency
            # cond -> uncond so XLA cannot overlap the two forwards (or,
            # reversed, the two backwards) and spike the transient peak the
            # way the overlapped `serial`/`batched` variants do.
            v_cond = apply_model(params, mcfg, xv, t, jax.tree.map(lambda a: a[0], cu))
            v_cond, xv2 = jax.lax.optimization_barrier((v_cond, xv))
            app_u = jax.checkpoint(
                lambda x_: apply_model(params, mcfg, x_, t, jax.tree.map(lambda a: a[1], cu))
            )
            v_uncond = app_u(xv2)
        else:
            app = lambda c_: apply_model(params, mcfg, xv, t, c_)
            if scfg.pair_mode == "serial_ckpt":
                app = jax.checkpoint(app)
            vs = jax.lax.map(app, cu)
            v_cond = jax.tree.map(lambda a: a[0], vs)
            v_uncond = jax.tree.map(lambda a: a[1], vs)
        mo = v_uncond + scfg.cfg_scale * (v_cond - v_uncond)
        mo = rescale_noise_cfg(mo, v_cond, scfg.guidance_rescale)
        px0 = predict_start_from_z_and_v(sched, xv, t, mo) * rescale
        return px0, (mo, v_cond - v_uncond)

    pred_x0, vjp_fn, (mo, correction) = jax.vjp(pred_x0_of_x, x, has_aux=True)

    rng, nk = jax.random.split(rng)
    noise = jax.random.normal(nk, x.shape, x.dtype)
    # ddim_step recomputes pred_x0 from mo — identical values
    out = ddim_step(sched, pr, index, x, mo, noise, scfg.temperature)
    x_prev = out.x_prev

    # per-frame guidance gradient through the VAE decode (barriered from the
    # UNet exactly like the reference's clone/detach, :305-327)
    def floss(zf, frame_idx):
        d = decode_frame(params, mcfg, zf)
        loss, numel = guidance_fn(d, index, frame_idx)
        return loss, numel

    zs = jax.lax.stop_gradient(pred_x0[0])  # (T, h, w, 4)
    grads = _per_frame_guidance_grads(floss, zs, scfg)
    grads = grads[None]  # (1, T, h, w, 4) = dL/dpred_x0

    (gx,) = vjp_fn(grads.astype(pred_x0.dtype))  # dL/dx through the UNet pair

    rms_g = jnp.sqrt(jnp.mean(gx.astype(jnp.float32) ** 2))
    rms_corr = jnp.sqrt(jnp.mean(correction.astype(jnp.float32) ** 2))
    rho = jnp.where(
        rms_g == 0.0,
        0.0,
        rms_corr * scfg.cfg_scale / rms_g * scfg.rho_scale * scale_guidance_weight,
    )
    x_prev = x_prev - rho * gx
    return x_prev, out.pred_x0, rng


def guided_ddim_sample(
    params: DiffusionParams,
    mcfg: LatentDiffusionConfig,
    sched: DiffusionSchedule,
    pr: DDIMParams,
    cond: Conditioning,
    uncond: Conditioning,
    x_T: jnp.ndarray,
    rng: jax.Array,
    guidance_fn: GuidanceFn,
    scfg: GuidedSampleConfig = GuidedSampleConfig(),
    scale_guidance_weight: float | jnp.ndarray = 1.0,
    return_trace: bool = False,
) -> jnp.ndarray:
    """Full guided reverse process (reference ddim_guidance.py:136-202 +
    :205-363). Returns x_0 latents (1, T, h, w, 4); with ``return_trace``
    also the per-step pred_x0 latents (S, T, h, w, 4) — stacked as a scan
    output rather than the reference's per-step host callbacks
    (ddim_guidance.py:330-331 save_pred_x0), so the debug artifact costs one
    extra scan output instead of S synchronous device->host round-trips."""
    s = pr.num_steps
    sw = jnp.asarray(scale_guidance_weight, jnp.float32)

    def body(carry, i):
        x, key = carry
        index = s - 1 - i
        for r in range(scfg.recur_steps):
            x_prev, pred_x0, key = _guided_step(
                params, mcfg, sched, pr, cond, uncond, scfg, guidance_fn, sw,
                x, index, key,
            )
            if r + 1 < scfg.recur_steps:
                # time travel: re-noise x_prev back to t (reference :360)
                beta_t = pr.alphas[index] / pr.alphas_prev[index]
                key, nk = jax.random.split(key)
                n = jax.random.normal(nk, x.shape, x.dtype)
                x = jnp.sqrt(beta_t) * x_prev + jnp.sqrt(1.0 - beta_t) * n
        y = pred_x0[0] if return_trace else None
        return (x_prev, key), y

    (x, _), trace = jax.lax.scan(body, (x_T, rng), jnp.arange(s))
    if return_trace:
        return x, trace
    return x
