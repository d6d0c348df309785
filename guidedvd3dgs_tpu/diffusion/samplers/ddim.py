"""Plain DDIM sampler as a jitted lax.scan.

Equivalent of the reference no-grad sampler used with --no_guidance
(reference: third_party/ViewCrafter/lvdm/models/samplers/ddim.py, and the
CFG + dynamic-rescale step math shared with ddim_guidance.py:205-291):
v-parameterization, classifier-free guidance with rescale_noise_cfg,
dynamic-rescale correction of pred_x0, eta-sigma noise.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.schedules import (
    DDIMParams,
    DiffusionSchedule,
    predict_eps_from_z_and_v,
    predict_start_from_z_and_v,
    rescale_noise_cfg,
)

# apply_fn(x, t_batch) -> v prediction; conditioning is closed over
ApplyFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class DDIMStepOut(NamedTuple):
    x_prev: jnp.ndarray
    pred_x0: jnp.ndarray
    e_t: jnp.ndarray
    correction: jnp.ndarray  # e_cond - e_uncond (v-space), for guidance rho


def cfg_model_output(
    apply_cond: ApplyFn,
    apply_uncond: ApplyFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cfg_scale: float,
    guidance_rescale: float,
):
    """reference ddim_guidance.py:266-272."""
    v_cond = apply_cond(x, t)
    v_uncond = apply_uncond(x, t)
    out = v_uncond + cfg_scale * (v_cond - v_uncond)
    correction = v_cond - v_uncond
    out = rescale_noise_cfg(out, v_cond, guidance_rescale)
    return out, correction


def ddim_step(
    sched: DiffusionSchedule,
    pr: DDIMParams,
    index: jnp.ndarray,  # () int32 DDIM index
    x: jnp.ndarray,
    model_output: jnp.ndarray,
    noise: jnp.ndarray,
    temperature: float = 1.0,
) -> DDIMStepOut:
    """x_t -> x_{t-1} (reference ddim_guidance.py:274-291)."""
    b = x.shape[0]
    size = (b,) + (1,) * (x.ndim - 1)
    t = jnp.broadcast_to(pr.timesteps[index], (b,))
    a_prev = jnp.broadcast_to(pr.alphas_prev[index], size)
    sigma_t = jnp.broadcast_to(pr.sigmas[index], size)

    e_t = predict_eps_from_z_and_v(sched, x, t, model_output)
    pred_x0 = predict_start_from_z_and_v(sched, x, t, model_output)
    rescale = pr.scale_arr_prev[index] / pr.scale_arr[index]
    pred_x0 = pred_x0 * rescale

    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t ** 2, 0.0)) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise * temperature
    return DDIMStepOut(x_prev, pred_x0, e_t, model_output)


def ddim_sample(
    sched: DiffusionSchedule,
    pr: DDIMParams,
    apply_cond: ApplyFn,
    apply_uncond: ApplyFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    cfg_scale: float = 7.5,
    guidance_rescale: float = 0.7,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Full S-step reverse process (reference ddim.py:206-260 /
    ddim_guidance.py:136-202), scanned."""
    s = pr.num_steps

    def body(carry, i):
        x, key = carry
        index = s - 1 - i
        t = jnp.broadcast_to(pr.timesteps[index], (x.shape[0],))
        mo, corr = cfg_model_output(
            apply_cond, apply_uncond, x, t, cfg_scale, guidance_rescale
        )
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, x.shape, x.dtype)
        out = ddim_step(sched, pr, index, x, mo, noise, temperature)
        return (out.x_prev, key), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), jnp.arange(s))
    return x
