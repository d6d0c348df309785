"""Multi-condition (two-scale CFG) DDIM sampler.

Equivalent of the reference DDIMSampler_multicond
(reference: third_party/ViewCrafter/lvdm/models/samplers/ddim_multiplecond.py:212-240):
three UNet evaluations per step -- full conditioning, fully unconditional,
and "image yes / text empty" -- combined as

    out = e_uncond + cfg_img  * (e_uncond_img - e_uncond)
                   + cfg_text * (e_cond      - e_uncond_img)

then rescale_noise_cfg against e_cond, and the same v-param DDIM update as
the plain sampler (shared ddim_step). Selected upstream with
--multiple_cond_cfg + --cfg_img (configs/infer_config.py:45-46); the
upstream multicond sampler runs no_grad and ignores scene-grounding
guidance, so this path is sampling-only here too.

Known deviation: the reference's multiplecond make_schedule kept the
pre-fix dynamic-rescale prev array (ddim_multiplecond.py:33 lacks the
scale_arr[0] prepend that ddim.py:34 marks '# fix a bug'), which inflates
the final step's pred_x0 by scale_arr[ts[0]]^-1 (~1.5x at default
schedules). This sampler shares the FIXED arrays with the other two
(make_ddim_params); tests/test_ddim_sampler_parity.py pins both the
equivalence under a corrected reference and the upstream divergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.samplers.ddim import ApplyFn, ddim_step
from guidedvd3dgs_tpu.diffusion.schedules import (
    DDIMParams,
    DiffusionSchedule,
    rescale_noise_cfg,
)


def multicond_model_output(
    apply_cond: ApplyFn,
    apply_uncond: ApplyFn,
    apply_uncond_img: ApplyFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cfg_text: float,
    cfg_img: float,
    guidance_rescale: float,
) -> jnp.ndarray:
    """Two-scale CFG combine (reference ddim_multiplecond.py:227-237)."""
    v_cond = apply_cond(x, t)
    v_uncond = apply_uncond(x, t)
    v_uncond_img = apply_uncond_img(x, t)
    out = (
        v_uncond
        + cfg_img * (v_uncond_img - v_uncond)
        + cfg_text * (v_cond - v_uncond_img)
    )
    if guidance_rescale > 0.0:
        out = rescale_noise_cfg(out, v_cond, guidance_rescale)
    return out


def ddim_sample_multicond(
    sched: DiffusionSchedule,
    pr: DDIMParams,
    apply_cond: ApplyFn,
    apply_uncond: ApplyFn,
    apply_uncond_img: ApplyFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    cfg_text: float = 7.5,
    cfg_img: float = 1.0,
    guidance_rescale: float = 0.7,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Full S-step reverse process with two-scale CFG, scanned
    (reference ddim_multiplecond.py:146-207)."""
    s = pr.num_steps

    def body(carry, i):
        x, key = carry
        index = s - 1 - i
        t = jnp.broadcast_to(pr.timesteps[index], (x.shape[0],))
        mo = multicond_model_output(
            apply_cond, apply_uncond, apply_uncond_img, x, t,
            cfg_text, cfg_img, guidance_rescale,
        )
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, x.shape, x.dtype)
        out = ddim_step(sched, pr, index, x, mo, noise, temperature)
        return (out.x_prev, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), jnp.arange(s))
    return x
