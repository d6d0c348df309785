"""Schedule/Resampler parity vs the reference implementations run on CPU."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/third_party/ViewCrafter"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion import schedules as S
from guidedvd3dgs_tpu.diffusion.convert import from_torch_module
from guidedvd3dgs_tpu.diffusion.resampler import ResamplerConfig, resampler_apply


def test_beta_schedule_and_zero_snr_parity():
    from lvdm.models.utils_diffusion import (
        make_beta_schedule,
        rescale_zero_terminal_snr,
    )

    ref = make_beta_schedule("linear", 1000, linear_start=0.00085, linear_end=0.012)
    ours = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)

    ref_z = rescale_zero_terminal_snr(ref)
    ours_z = S.rescale_zero_terminal_snr(ours)
    np.testing.assert_allclose(ours_z, ref_z, rtol=1e-9, atol=1e-12)


def test_ddim_timesteps_and_params_parity():
    from lvdm.models.utils_diffusion import (
        make_ddim_sampling_parameters,
        make_ddim_timesteps,
    )

    for method in ["uniform", "uniform_trailing"]:
        ref_ts = make_ddim_timesteps(method, 50, 1000, verbose=False)
        ours_ts = S.make_ddim_timesteps(method, 50, 1000)
        np.testing.assert_array_equal(ours_ts, ref_ts)

    sched = S.make_schedule()
    pr = S.make_ddim_params(sched, 50, eta=1.0, method="uniform_trailing")
    ref_sig, ref_a, ref_ap = make_ddim_sampling_parameters(
        alphacums=torch.tensor(np.asarray(sched.alphas_cumprod)),
        ddim_timesteps=np.asarray(pr.timesteps),
        eta=1.0,
        verbose=False,
    )
    np.testing.assert_allclose(np.asarray(pr.alphas), ref_a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pr.alphas_prev), ref_ap, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pr.sigmas), ref_sig, rtol=1e-5, atol=1e-8)


def test_v_param_identities_parity():
    """predict_start/eps_from_z_and_v vs hand equations on the same arrays."""
    sched = S.make_schedule()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    t = jnp.asarray([10, 500])
    a = np.sqrt(np.asarray(sched.alphas_cumprod))[np.asarray(t)].reshape(2, 1, 1)
    b = np.sqrt(1 - np.asarray(sched.alphas_cumprod))[np.asarray(t)].reshape(2, 1, 1)
    np.testing.assert_allclose(
        np.asarray(S.predict_start_from_z_and_v(sched, x, t, v)),
        a * np.asarray(x) - b * np.asarray(v), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(S.predict_eps_from_z_and_v(sched, x, t, v)),
        a * np.asarray(v) + b * np.asarray(x), rtol=1e-5, atol=1e-6)


def test_rescale_noise_cfg_parity():
    from lvdm.models.utils_diffusion import rescale_noise_cfg as ref_fn

    rng = np.random.default_rng(1)
    cfg = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    txt = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    ref = ref_fn(torch.from_numpy(cfg), torch.from_numpy(txt), 0.7).numpy()
    ours = S.rescale_noise_cfg(jnp.asarray(cfg), jnp.asarray(txt), 0.7)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)


def test_resampler_parity():
    from lvdm.modules.encoders.resampler import Resampler

    torch.manual_seed(2)
    m = Resampler(
        dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
        embedding_dim=16, output_dim=24, ff_mult=2, video_length=3,
    ).eval()
    p = from_torch_module(m)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 10, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    cfg = ResamplerConfig(dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
                          embedding_dim=16, output_dim=24, ff_mult=2, video_length=3)
    ours = resampler_apply(p, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)
