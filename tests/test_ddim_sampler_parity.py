"""Full-loop parity of the scan DDIM sampler vs the EXECUTED reference
sampler (third_party/ViewCrafter/lvdm/models/samplers/ddim.py).

The reference DDIMSampler runs as-is on CPU (register_buffer's forced .cuda()
overridden) against a duck-typed model stub exposing exactly the surface the
sampler touches: alphas_cumprod buffers from OUR schedule (whose generators
have their own parity tests vs lvdm.models.utils_diffusion), the v-param
identities via lvdm.common.extract_into_tensor, and a deterministic toy
"UNet" implemented identically in torch and JAX. What this pins that unit
tests cannot: timestep/index bookkeeping across the S-step loop
(uniform_trailing spacing, index = total-1-i), the dynamic-rescale
scale_arr/scale_arr_prev selection (incl. the reference's '# fix a bug'
prepend of scale_arr[0]), CFG combine + rescale_noise_cfg placement, and
the eta-sigma noise term.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/third_party/ViewCrafter")

from lvdm.common import extract_into_tensor  # noqa: E402
from lvdm.models.samplers.ddim import DDIMSampler  # noqa: E402

from guidedvd3dgs_tpu.diffusion import schedules as S  # noqa: E402
from guidedvd3dgs_tpu.diffusion.samplers.ddim import ddim_sample, ddim_step, cfg_model_output  # noqa: E402

pytestmark = pytest.mark.slow

T = 1000
SHAPE = (2, 4, 3, 8, 8)  # (b, c, t, h, w) video latents


def _toy_v_torch(x, t, shift):
    co = torch.cos(t.float() / T * 3.0).view(-1, 1, 1, 1, 1)
    return co * x + 0.1 * torch.sin(2.0 * x) + shift.view(-1, 1, 1, 1, 1)


def _toy_v_jax(x, t, shift):
    co = jnp.cos(t.astype(jnp.float32) / T * 3.0).reshape(-1, 1, 1, 1, 1)
    return co * x + 0.1 * jnp.sin(2.0 * x) + shift.reshape(-1, 1, 1, 1, 1)


class _CPUSampler(DDIMSampler):
    def register_buffer(self, name, attr):  # reference forces .cuda()
        if isinstance(attr, torch.Tensor):
            attr = attr.to("cpu")
        setattr(self, name, attr)


class _StubModel:
    """The VIPLatentDiffusion surface DDIMSampler actually reads."""

    parameterization = "v"
    use_dynamic_rescale = True
    device = torch.device("cpu")

    def __init__(self, sched: S.DiffusionSchedule):
        tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
        self.num_timesteps = int(sched.num_timesteps)
        self.betas = tt(sched.betas)
        self.alphas_cumprod = tt(sched.alphas_cumprod)
        self.alphas_cumprod_prev = tt(sched.alphas_cumprod_prev)
        self.sqrt_alphas_cumprod = tt(sched.sqrt_alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = tt(sched.sqrt_one_minus_alphas_cumprod)
        self.scale_arr = tt(sched.scale_arr)

    def apply_model(self, x, t, c, **kw):
        return _toy_v_torch(x, t, c["c"])

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


def _setup():
    sched = S.make_schedule()  # zero-SNR linear betas + dynamic rescale
    rng = np.random.default_rng(0)
    x_T = rng.normal(size=SHAPE).astype(np.float32)
    c_cond = rng.normal(size=(SHAPE[0],)).astype(np.float32)
    c_uncond = np.zeros((SHAPE[0],), np.float32)
    return sched, x_T, c_cond, c_uncond


def test_full_sample_parity_eta0():
    sched, x_T, c_cond, c_uncond = _setup()
    stub = _StubModel(sched)
    sampler = _CPUSampler(stub)
    with torch.no_grad():
        ref, _ = sampler.sample(
            S=5, batch_size=SHAPE[0], shape=SHAPE[1:],
            conditioning={"c": torch.from_numpy(c_cond)},
            eta=0.0, x_T=torch.from_numpy(x_T),
            unconditional_guidance_scale=7.5,
            unconditional_conditioning={"c": torch.from_numpy(c_uncond)},
            timestep_spacing="uniform_trailing", guidance_rescale=0.7,
            verbose=False, schedule_verbose=False,
        )

    pr = S.make_ddim_params(sched, 5, eta=0.0, method="uniform_trailing")
    ours = ddim_sample(
        sched, pr,
        apply_cond=lambda x, t: _toy_v_jax(x, t, jnp.asarray(c_cond)),
        apply_uncond=lambda x, t: _toy_v_jax(x, t, jnp.asarray(c_uncond)),
        x_T=jnp.asarray(x_T), rng=jax.random.key(0),
        cfg_scale=7.5, guidance_rescale=0.7,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_single_step_parity_eta1_shared_noise():
    """One p_sample_ddim with eta=1 (nonzero sigma), same noise both sides."""
    sched, x_T, c_cond, c_uncond = _setup()
    stub = _StubModel(sched)
    sampler = _CPUSampler(stub)
    sampler.make_schedule(ddim_num_steps=5, ddim_discretize="uniform_trailing",
                          ddim_eta=1.0, verbose=False)
    index = 2
    step = int(sampler.ddim_timesteps[index])
    ts = torch.full((SHAPE[0],), step, dtype=torch.long)

    torch.manual_seed(7)
    noise = torch.randn(SHAPE)
    with torch.no_grad():
        torch.manual_seed(7)  # noise_like draws the same tensor inside
        x_prev_ref, pred_x0_ref = sampler.p_sample_ddim(
            torch.from_numpy(x_T), {"c": torch.from_numpy(c_cond)}, ts, index=index,
            unconditional_guidance_scale=7.5,
            unconditional_conditioning={"c": torch.from_numpy(c_uncond)},
            guidance_rescale=0.7,
        )

    pr = S.make_ddim_params(sched, 5, eta=1.0, method="uniform_trailing")
    t = jnp.broadcast_to(pr.timesteps[index], (SHAPE[0],))
    mo, _ = cfg_model_output(
        lambda x, tt: _toy_v_jax(x, tt, jnp.asarray(c_cond)),
        lambda x, tt: _toy_v_jax(x, tt, jnp.asarray(c_uncond)),
        jnp.asarray(x_T), t, 7.5, 0.7,
    )
    out = ddim_step(sched, pr, jnp.asarray(index), jnp.asarray(x_T), mo,
                    jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(out.pred_x0), pred_x0_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.x_prev), x_prev_ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_multicond_full_sample_parity_eta0():
    """Two-scale CFG sampler vs the EXECUTED reference multiplecond sampler
    (ddim_multiplecond.py:212-240): 5 uniform_trailing steps, cfg_text 7.5,
    cfg_img 2.0, rescale 0.7."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ddim_multicond",
        "/root/reference/third_party/ViewCrafter/lvdm/models/samplers/"
        "ddim_multiplecond.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from guidedvd3dgs_tpu.diffusion.samplers.ddim_multicond import (
        ddim_sample_multicond,
    )

    class _CPUMulticond(mod.DDIMSampler):
        def register_buffer(self, name, attr):
            if isinstance(attr, torch.Tensor):
                attr = attr.to("cpu")
            setattr(self, name, attr)

    sched, x_T, c_cond, c_uncond = _setup()
    c_uncond_img = (c_cond * 0.5).astype(np.float32)  # image-only branch
    stub = _StubModel(sched)
    sampler = _CPUMulticond(stub)

    # The reference multiplecond make_schedule kept the PRE-FIX dynamic
    # rescale prev array (ddim_multiplecond.py:33 lacks the scale_arr[0]
    # prepend that ddim.py:34 marks '# fix a bug'); our sampler shares the
    # fixed arrays. Pin the divergence, then correct the reference's buffer
    # and assert full parity of the two-scale CFG math.
    orig_make = sampler.make_schedule

    def fixed_make(*a, **k):
        orig_make(*a, **k)
        sampler.ddim_scale_arr_prev = torch.cat(
            [stub.scale_arr[0:1], sampler.ddim_scale_arr[:-1]]
        )

    orig_make(ddim_num_steps=5, ddim_discretize="uniform_trailing",
              ddim_eta=0.0, verbose=False)
    buggy_prev0 = float(sampler.ddim_scale_arr_prev[0])
    assert buggy_prev0 == float(sampler.ddim_scale_arr[0])  # upstream bug
    assert float(stub.scale_arr[0]) == 1.0  # what the fixed samplers use

    sampler.make_schedule = fixed_make
    with torch.no_grad():
        ref, _ = sampler.sample(
            S=5, batch_size=SHAPE[0], shape=SHAPE[1:],
            conditioning={"c": torch.from_numpy(c_cond)},
            eta=0.0, x_T=torch.from_numpy(x_T),
            unconditional_guidance_scale=7.5, cfg_img=2.0,
            unconditional_conditioning={"c": torch.from_numpy(c_uncond)},
            unconditional_conditioning_img_nonetext={
                "c": torch.from_numpy(c_uncond_img)
            },
            timestep_spacing="uniform_trailing", guidance_rescale=0.7,
            verbose=False, schedule_verbose=False,
        )

    pr = S.make_ddim_params(sched, 5, eta=0.0, method="uniform_trailing")
    ours = ddim_sample_multicond(
        sched, pr,
        apply_cond=lambda x, t: _toy_v_jax(x, t, jnp.asarray(c_cond)),
        apply_uncond=lambda x, t: _toy_v_jax(x, t, jnp.asarray(c_uncond)),
        apply_uncond_img=lambda x, t: _toy_v_jax(x, t, jnp.asarray(c_uncond_img)),
        x_T=jnp.asarray(x_T), rng=jax.random.key(0),
        cfg_text=7.5, cfg_img=2.0, guidance_rescale=0.7,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4, atol=2e-4)
