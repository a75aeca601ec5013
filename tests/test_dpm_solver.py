"""DPM-Solver++(2M) correctness: exactness, convergence order, plumbing.

The solver is a beyond-reference extension (the reference app is DDPM-only);
correctness is proven against analytic probability-flow ODEs where the exact
epsilon predictor is known in closed form, not against any other
implementation.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.diffusion import DiffusionSchedule, DiffusionSampler, SamplerConfig
from synt_isic_tpu.diffusion.schedules import leading_timesteps

SCHEDULE = DiffusionSchedule.create()
AB = SCHEDULE.alphas_cumprod  # float64 host table


def make_sampler(apply_fn, steps, scheduler, clip=False, size=1, ch=1):
    cfg = SamplerConfig(num_inference_steps=steps, scheduler=scheduler,
                        image_size=size, channels=ch, clip_sample=clip)
    return DiffusionSampler(apply_fn, SCHEDULE, cfg)


# --------------------------------------------------------------------------
# Oracle 1: point-mass data distribution. eps(x, t) = (x - a_t x0*) / s_t is
# the exact epsilon; any x0-prediction sampler must return x0* exactly.
# --------------------------------------------------------------------------
X0_STAR = 0.42


def point_mass_eps(params, x, t):
    ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
    return (x - jnp.sqrt(ab) * X0_STAR) / jnp.sqrt(1.0 - ab)


@pytest.mark.parametrize("steps", [3, 10])
def test_point_mass_exactness(steps):
    sampler = make_sampler(point_mass_eps, steps, "dpm_solver")
    out = sampler.sample({}, np.arange(4, dtype=np.uint32))
    np.testing.assert_allclose(np.asarray(out["images"]), X0_STAR, atol=5e-4)


# --------------------------------------------------------------------------
# Oracle 2: Gaussian data N(0, TAU^2). The probability-flow ODE is linear in
# x with a time-varying coefficient, so its flow map is ANALYTIC: x scales by
# sqrt(Var_0 / Var_t_start) with Var_t = abar_t TAU^2 + (1 - abar_t). Frozen-
# epsilon exponential integrators are NOT exact here, which separates solver
# orders (a point-mass or point-mixture oracle cannot: DDIM satisfies the
# semigroup property there and every grid gives the identical answer).
# --------------------------------------------------------------------------
TAU = 2.0


def gaussian_eps_jax(params, x, t):
    ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sqrt(1.0 - ab) * x / (ab * TAU ** 2 + 1.0 - ab)


def analytic_flow(x_init, t_start):
    var_start = AB[t_start] * TAU ** 2 + (1.0 - AB[t_start])
    return np.asarray(x_init, np.float64) * np.sqrt(TAU ** 2 / var_start)


def _solver_error(scheduler, steps, x_init):
    truth = analytic_flow(x_init, int(leading_timesteps(1000, steps)[0]))
    sampler = make_sampler(gaussian_eps_jax, steps, scheduler)
    out = sampler.sample({}, np.zeros(x_init.shape[0], np.uint32),
                         initial_noise=jnp.asarray(x_init, jnp.float32))
    return float(np.max(np.abs(np.asarray(out["images"], np.float64) - truth)))


def test_second_order_convergence():
    rng = np.random.default_rng(0)
    x_init = rng.standard_normal((16, 1, 1, 1))

    err_ddim = _solver_error("ddim", 10, x_init)
    err_dpm = _solver_error("dpm_solver", 10, x_init)
    # the second-order solver must beat first-order DDIM decisively at S=10
    # (measured: ddim 0.458, dpm 0.029 — 15x)
    assert err_dpm < 0.25 * err_ddim, (err_dpm, err_ddim)

    # and refining the grid must reduce its error
    err_dpm20 = _solver_error("dpm_solver", 20, x_init)
    assert err_dpm20 < err_dpm, (err_dpm20, err_dpm)


# --------------------------------------------------------------------------
# Plumbing: determinism, trajectory capture, config validation.
# --------------------------------------------------------------------------
def test_deterministic_and_capture():
    sampler = make_sampler(point_mass_eps, 12, "dpm_solver", size=2, ch=3)
    seeds = np.asarray([7, 8], np.uint32)
    a = sampler.sample({}, seeds, capture_trajectory=4)
    b = sampler.sample({}, seeds, capture_trajectory=4)
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
    assert a["save_indices"] == [0, 4, 8, 11]
    assert a["trajectory"].shape == (4, 2, 2, 2, 3)
    # windowed frames equal the corresponding full-capture frames
    full = sampler.sample({}, seeds, capture_trajectory=True)["trajectory"]
    np.testing.assert_allclose(np.asarray(a["trajectory"]),
                               np.asarray(full)[a["save_indices"]], atol=1e-6)


def test_unknown_scheduler_rejected():
    with pytest.raises(ValueError):
        SamplerConfig(scheduler="euler")
