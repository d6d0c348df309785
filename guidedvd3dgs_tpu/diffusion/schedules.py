"""DDPM / DDIM schedule math (pure numpy/jnp, no state).

Equivalent of the reference schedule registration and helpers
(reference: third_party/ViewCrafter/lvdm/models/ddpm3d.py:123-187
register_schedule, :239-250 v-parameterization identities;
lvdm/models/utils_diffusion.py:31-54 make_beta_schedule, :57-76
make_ddim_timesteps, :79-92 make_ddim_sampling_parameters, :113-145
rescale_zero_terminal_snr, :147-158 rescale_noise_cfg; dynamic-rescale
arrays ddpm3d.py:522-527).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp


def make_beta_schedule(
    schedule: str, n_timestep: int, linear_start=1e-4, linear_end=2e-2, cosine_s=8e-3
) -> np.ndarray:
    if schedule == "linear":
        return (
            np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64) ** 2
        )
    if schedule == "cosine":
        t = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(t / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        return np.clip(betas, 0, 0.999)
    if schedule == "sqrt_linear":
        return np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    if schedule == "sqrt":
        return np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    raise ValueError(schedule)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero terminal SNR (arXiv:2305.08891 Alg. 1; reference
    utils_diffusion.py:113-145)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    abs_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = abs_sqrt[0].copy(), abs_sqrt[-1].copy()
    abs_sqrt = abs_sqrt - aT
    abs_sqrt = abs_sqrt * a0 / (a0 - aT)
    alphas_bar = abs_sqrt ** 2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def make_ddim_timesteps(method: str, num_ddim: int, num_ddpm: int) -> np.ndarray:
    if method == "uniform":
        c = num_ddpm // num_ddim
        return np.asarray(list(range(0, num_ddpm, c))) + 1
    if method == "uniform_trailing":
        c = num_ddpm / num_ddim
        return np.flip(np.round(np.arange(num_ddpm, 0, -c))).astype(np.int64) - 1
    if method == "quad":
        return ((np.linspace(0, np.sqrt(num_ddpm * 0.8), num_ddim)) ** 2).astype(int) + 1
    raise ValueError(method)


@dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable schedule arrays for T DDPM steps (f32)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    scale_arr: jnp.ndarray  # dynamic-rescale (ones if disabled)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "linear",
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    rescale_betas_zero_snr: bool = True,
    use_dynamic_rescale: bool = True,
    base_scale: float = 0.3,
    turning_step: int = 400,
) -> DiffusionSchedule:
    betas = make_beta_schedule(beta_schedule, timesteps, linear_start, linear_end)
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    alphas_cumprod = np.cumprod(1.0 - betas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    if use_dynamic_rescale:
        scale_arr = np.concatenate(
            [np.linspace(1.0, base_scale, turning_step), np.full(timesteps, base_scale)]
        )[:timesteps]
    else:
        scale_arr = np.ones(timesteps)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        scale_arr=f32(scale_arr),
    )


@dataclass(frozen=True)
class DDIMParams:
    """Per-DDIM-step arrays of length S (selected from the DDPM schedule)."""

    timesteps: jnp.ndarray  # (S,) int32 DDPM step per DDIM index
    alphas: jnp.ndarray
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray
    scale_arr: jnp.ndarray
    scale_arr_prev: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_ddim_params(
    sched: DiffusionSchedule,
    num_steps: int,
    eta: float = 1.0,
    method: str = "uniform_trailing",
) -> DDIMParams:
    """reference ddim_guidance.py:23-58 make_schedule."""
    ts = make_ddim_timesteps(method, num_steps, sched.num_timesteps)
    ac = np.asarray(sched.alphas_cumprod)
    alphas = ac[ts]
    alphas_prev = np.asarray([ac[0]] + ac[ts[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    scale_arr = np.asarray(sched.scale_arr)[ts]
    scale_arr_prev = np.concatenate([np.asarray(sched.scale_arr)[0:1], scale_arr[:-1]])
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DDIMParams(
        timesteps=jnp.asarray(ts, jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
        scale_arr=f32(scale_arr),
        scale_arr_prev=f32(scale_arr_prev),
    )


# v-parameterization identities (reference ddpm3d.py:239-250)


def predict_start_from_z_and_v(sched: DiffusionSchedule, x_t, t, v):
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    a = sched.sqrt_alphas_cumprod[t].reshape(shape)
    b = sched.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * x_t - b * v


def predict_eps_from_z_and_v(sched: DiffusionSchedule, x_t, t, v):
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    a = sched.sqrt_alphas_cumprod[t].reshape(shape)
    b = sched.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * v + b * x_t


def q_sample(sched: DiffusionSchedule, x0, t, noise):
    shape = (-1,) + (1,) * (x0.ndim - 1)
    a = sched.sqrt_alphas_cumprod[t].reshape(shape)
    b = sched.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    return a * x0 + b * noise


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float = 0.0):
    """reference utils_diffusion.py:147-158."""
    axes = tuple(range(1, noise_cfg.ndim))
    # torch .std() is Bessel-corrected (ddof=1)
    std_text = noise_pred_text.std(axis=axes, keepdims=True, ddof=1)
    std_cfg = noise_cfg.std(axis=axes, keepdims=True, ddof=1)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1 - guidance_rescale) * noise_cfg
