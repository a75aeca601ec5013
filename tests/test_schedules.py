"""Golden tests for the diffusion schedule math.

Validates our tables against closed-form recomputation of the DDPM
formulas the reference relies on via diffusers (`README.md:64-112`,
`model_manager.py:196-209`): squaredcos_cap_v2 betas, leading timestep
spacing, posterior coefficients, and the scan-form step vs a literal
transcription of the published update equations.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synt_isic_tpu.diffusion import (
    DiffusionSchedule, betas_squaredcos_cap_v2, betas_linear, leading_timesteps,
    DDPMParams, ddpm_step, add_noise, ddim_step,
)
from synt_isic_tpu.diffusion.ddim import DDIMParams


def test_squaredcos_betas_golden():
    betas = betas_squaredcos_cap_v2(1000)
    assert betas.shape == (1000,)
    # closed form for the first element
    def ab(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    assert betas[0] == pytest.approx(1 - ab(1 / 1000) / ab(0), rel=1e-12)
    assert betas[500] == pytest.approx(min(1 - ab(501 / 1000) / ab(500 / 1000), 0.999), rel=1e-12)
    # capped at 0.999 near the end
    assert betas[-1] == pytest.approx(0.999)
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    assert np.all(np.diff(betas[:900]) > 0)  # monotone rising until the cap


def test_linear_betas():
    betas = betas_linear(1000)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)


def test_leading_timesteps_50():
    ts = leading_timesteps(1000, 50)
    assert ts[0] == 980 and ts[-1] == 0
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_leading_timesteps_1000():
    ts = leading_timesteps(1000, 1000)
    assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 1000


def test_leading_timesteps_bounds():
    with pytest.raises(ValueError):
        leading_timesteps(1000, 0)
    with pytest.raises(ValueError):
        leading_timesteps(1000, 1001)
    assert list(leading_timesteps(1000, 1)) == [0]


def _reference_ddpm_step(schedule, t, prev_t, x, eps, z):
    """Literal transcription of the DDPM posterior update (fixed_small,
    clip_sample=True) for cross-checking the table-form implementation."""
    ab_t = schedule.alphas_cumprod[t]
    ab_prev = schedule.alphas_cumprod[prev_t] if prev_t >= 0 else 1.0
    beta_prod_t = 1 - ab_t
    beta_prod_prev = 1 - ab_prev
    alpha_cur = ab_t / ab_prev
    beta_cur = 1 - alpha_cur

    x0 = (x - math.sqrt(beta_prod_t) * eps) / math.sqrt(ab_t)
    x0 = np.clip(x0, -1, 1)
    coeff_x0 = math.sqrt(ab_prev) * beta_cur / beta_prod_t
    coeff_xt = math.sqrt(alpha_cur) * beta_prod_prev / beta_prod_t
    prev = coeff_x0 * x0 + coeff_xt * x
    if t > 0:
        var = max(beta_prod_prev / beta_prod_t * beta_cur, 1e-20)
        prev = prev + math.sqrt(var) * z
    return prev


@pytest.mark.parametrize("steps", [1, 5, 50])
def test_ddpm_step_matches_reference_form(steps):
    schedule = DiffusionSchedule.create()
    params = DDPMParams.create(schedule, steps)
    ts = leading_timesteps(1000, steps)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    for k, t in enumerate(ts):
        eps = rng.normal(size=x.shape).astype(np.float32)
        z = rng.normal(size=x.shape).astype(np.float32)
        got = np.asarray(ddpm_step(jnp.asarray(x), jnp.asarray(eps),
                                   jnp.asarray(k), params, jnp.asarray(z)))
        want = _reference_ddpm_step(schedule, int(t), int(t) - 1000 // steps,
                                    x.astype(np.float64), eps.astype(np.float64),
                                    z.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        x = got


def test_final_step_adds_no_noise():
    schedule = DiffusionSchedule.create()
    params = DDPMParams.create(schedule, 50)
    assert float(params.posterior_std[-1]) == 0.0
    assert float(params.posterior_std[0]) > 0.0


def test_add_noise_roundtrip():
    schedule = DiffusionSchedule.create()
    x0 = jnp.ones((2, 4, 4, 3)) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    t = jnp.array([0, 999])
    noisy = add_noise(schedule, x0, noise, t)
    # at t=0 almost no noise; at t=999 almost pure noise
    ab0 = schedule.alphas_cumprod[0]
    np.testing.assert_allclose(np.asarray(noisy[0]),
                               np.sqrt(ab0) * 0.5 + np.sqrt(1 - ab0) * np.asarray(noise[0]),
                               rtol=1e-5)
    ab999 = schedule.alphas_cumprod[999]
    assert ab999 < 1e-4


def test_ddim_deterministic_matches_formula():
    schedule = DiffusionSchedule.create()
    params = DDIMParams.create(schedule, 50, eta=0.0)
    ts = leading_timesteps(1000, 50)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float64)
    eps = rng.normal(size=x.shape).astype(np.float64)
    k = 10
    t = int(ts[k])
    ab_t = schedule.alphas_cumprod[t]
    ab_prev = schedule.alphas_cumprod[t - 20]
    x0 = np.clip((x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t), -1, 1)
    want = np.sqrt(ab_prev) * x0 + np.sqrt(1 - ab_prev) * eps
    got = np.asarray(ddim_step(jnp.asarray(x, jnp.float32), jnp.asarray(eps, jnp.float32),
                               jnp.asarray(k), params))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
