"""Diffusion schedule algebra vs torch oracle (update.py:26-36, 365-405)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from diffmvs_tpu.models.schedule import DiffusionSchedule, cosine_beta_schedule


def _torch_cosine_beta_schedule(timesteps, s=0.008):
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.999)


def test_cosine_beta_schedule_matches_torch():
    ours = cosine_beta_schedule(1000)
    ref = _torch_cosine_beta_schedule(1000).float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_schedule_tables_match_torch():
    sched = DiffusionSchedule(timesteps=1000, sampling_timesteps=1,
                              eta=1.0, scale=0.5)
    betas = _torch_cosine_beta_schedule(1000).float()
    alphas = 1.0 - betas
    ac = torch.cumprod(alphas, dim=0)
    # ours cumprods in float64 (more accurate than torch's f32 buffers);
    # compare with a small absolute floor for the ~0 tail
    np.testing.assert_allclose(sched.table("alphas_cumprod"),
                               ac.numpy(), rtol=1e-4, atol=5e-6)
    np.testing.assert_allclose(sched.table("sqrt_alphas_cumprod"),
                               torch.sqrt(ac).numpy(), rtol=1e-4, atol=5e-6)
    np.testing.assert_allclose(
        sched.table("sqrt_one_minus_alphas_cumprod"),
        torch.sqrt(1 - ac).numpy(), rtol=1e-4, atol=5e-6)


def test_q_sample_and_noise_prediction_roundtrip(rng):
    """predict_noise_from_start(q_sample(x0, t, eps), t, x0) == eps."""
    sched = DiffusionSchedule(timesteps=1000, sampling_timesteps=1,
                              eta=1.0, scale=0.5)
    x0 = rng.randn(2, 8, 8).astype(np.float32)
    eps = rng.randn(2, 8, 8).astype(np.float32)
    t = np.array([10, 700], np.int32)

    xt = sched.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(eps))
    eps_back = sched.predict_noise_from_start(xt, jnp.asarray(t),
                                              jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(eps_back), eps, rtol=1e-2,
                               atol=1e-3)


def test_ddim_time_pairs():
    """linspace(-1, T-1) pairing (update.py:469-471)."""
    s1 = DiffusionSchedule(1000, 1, 1.0, 0.5)
    assert s1.ddim_time_pairs() == [(999, -1)]
    s4 = DiffusionSchedule(1000, 4, 1.0, 0.5)
    times = np.linspace(-1, 999, 5).astype(int).tolist()
    expected = list(zip(list(reversed(times))[:-1],
                        list(reversed(times))[1:]))
    assert s4.ddim_time_pairs() == expected


def test_ddim_coeffs_match_torch():
    sched = DiffusionSchedule(1000, 4, eta=1.0, scale=0.5)
    betas = _torch_cosine_beta_schedule(1000).float()
    ac = torch.cumprod(1 - betas, dim=0)
    for time, time_next in sched.ddim_time_pairs():
        if time_next < 0:
            continue
        alpha = ac[time]
        alpha_next = ac[time_next]
        sigma = 1.0 * ((1 - alpha / alpha_next) * (1 - alpha_next)
                       / (1 - alpha)).sqrt()
        c = (1 - alpha_next - sigma ** 2).sqrt()
        sa, cc, ss = sched.ddim_coeffs(time, time_next)
        # ours computes in f64; torch f32 flushes 1-alpha_next-sigma^2 to 0
        # near the schedule tail — allow that absolute slack
        np.testing.assert_allclose(sa, alpha_next.sqrt().item(), rtol=1e-4)
        np.testing.assert_allclose(cc, c.item(), rtol=1e-3, atol=5e-4)
        np.testing.assert_allclose(ss, sigma.item(), rtol=1e-3, atol=5e-4)
