"""SDE-DPM-Solver++(2M) correctness: marginal-preservation identities,
statistical physics on an exact denoiser, and plumbing contracts.

The SDE variant is a beyond-reference extension (the reference app is
DDPM-only). Correctness is proven from first principles: the reverse-SDE
discretization must walk the true forward marginals N(alpha_t x0, sigma_t^2)
exactly when the denoiser is exact — which pins every coefficient table
(see synt_isic_tpu/diffusion/dpm.py docstring for the derivation).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.diffusion import (DiffusionSampler, DiffusionSchedule,
                                     SamplerConfig)
from synt_isic_tpu.diffusion.dpm import DPMSolverParams

SCHEDULE = DiffusionSchedule.create()
AB = SCHEDULE.alphas_cumprod  # float64 host table


def make_sampler(apply_fn, steps, clip=False, size=1, ch=1, batch_dtype=None,
                 spacing="leading", deterministic=False):
    cfg = SamplerConfig(num_inference_steps=steps, scheduler="dpm_solver_sde",
                        image_size=size, channels=ch, clip_sample=clip,
                        timestep_spacing=spacing,
                        deterministic_posterior=deterministic)
    return DiffusionSampler(apply_fn, SCHEDULE, cfg)


X0_STAR = 0.42


def point_mass_eps(params, x, t):
    ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
    return (x - jnp.sqrt(ab) * X0_STAR) / jnp.sqrt(1.0 - ab)


# --------------------------------------------------------------------------
# Coefficient identities. With an exact denoiser (x0 estimate == x0 at every
# step, so the multistep correction vanishes: D == x0) the update is
#   x_{k+1} = c_xt x_k + c_d x0 + c_n z.
# Walking the true marginals x_k ~ N(alpha_k x0, sigma_k^2) requires exactly
#   c_xt alpha_k + c_d           == alpha_{k+1}        (mean)
#   c_xt^2 sigma_k^2 + c_n^2     == sigma_{k+1}^2      (variance)
# These hold by construction of the tables; verify them numerically for both
# spacings, using the SAME ab_next convention as the table builder.
# --------------------------------------------------------------------------
@pytest.mark.parametrize("spacing", ["leading", "trailing"])
@pytest.mark.parametrize("steps", [5, 20, 50])
def test_sde_tables_preserve_marginals(spacing, steps):
    p = DPMSolverParams.create(SCHEDULE, steps, timestep_spacing=spacing,
                               sde=True)
    ts = np.asarray(p.timesteps)
    ab_t = AB[ts]
    ab_next = (SCHEDULE.alphas_cumprod_prev(ts, steps)
               if spacing == "leading"
               else SCHEDULE.alphas_cumprod_prev_from(ts))
    alpha_k, sigma_k = np.sqrt(ab_t), np.sqrt(1.0 - ab_t)
    alpha_n, sigma_n = np.sqrt(ab_next), np.sqrt(1.0 - ab_next)

    c_xt = np.asarray(p.sample_coeff, np.float64)
    c_d = np.asarray(p.d_coeff, np.float64)
    c_n = np.asarray(p.noise_coeff, np.float64)

    np.testing.assert_allclose(c_xt * alpha_k + c_d, alpha_n, atol=1e-6)
    np.testing.assert_allclose(c_xt ** 2 * sigma_k ** 2 + c_n ** 2,
                               sigma_n ** 2, atol=1e-6)
    # final step is deterministic and returns the x0 estimate exactly
    assert c_xt[-1] == 0.0 and c_n[-1] == 0.0
    np.testing.assert_allclose(c_d[-1], 1.0, atol=1e-6)


def test_ode_tables_have_zero_noise():
    p = DPMSolverParams.create(SCHEDULE, 20, sde=False)
    assert not p.sde
    np.testing.assert_array_equal(np.asarray(p.noise_coeff), 0.0)


# --------------------------------------------------------------------------
# Statistical physics: with the exact point-mass denoiser the chain's
# intermediate marginals must be N(alpha_t x0*, sigma_t^2). ~500k iid pixel
# samples give a ~0.0012 standard error on the mean; the initial condition
# N(0,1) vs the true N(alpha_T x0*, sigma_T^2) contributes a ~3e-3
# systematic that shrinks as the chain contracts it.
# --------------------------------------------------------------------------
def test_sde_intermediate_marginals():
    steps = 20
    sampler = make_sampler(point_mass_eps, steps, size=64, ch=1)
    out = sampler.sample({}, np.arange(128, dtype=np.uint32),
                         capture_trajectory=True)
    traj = np.asarray(out["trajectory"], np.float64)  # (S, B, H, W, C)
    ts = np.asarray(out["timesteps"])
    for k in [5, 10, 15]:
        t_next = int(ts[k + 1])          # state after step k sits at ts[k+1]
        a = float(np.sqrt(AB[t_next]))
        s = float(np.sqrt(1.0 - AB[t_next]))
        frame = traj[k].ravel()
        assert abs(frame.mean() - a * X0_STAR) < 0.012, (k, frame.mean(), a)
        assert abs(frame.std() - s) < 0.02 * s, (k, frame.std(), s)
    # final step returns the x0 estimate exactly (no noise on the last step)
    np.testing.assert_allclose(np.asarray(out["images"]), X0_STAR, atol=5e-4)


# --------------------------------------------------------------------------
# Plumbing contracts shared with every other sampler kind.
# --------------------------------------------------------------------------
def test_sde_deterministic_given_seeds_and_batch_independent():
    sampler = make_sampler(point_mass_eps, 12, size=2, ch=3)
    seeds = np.asarray([7, 8], np.uint32)
    a = sampler.sample({}, seeds)
    b = sampler.sample({}, seeds)
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
    # per-seed streams: results never depend on batch composition
    solo = sampler.sample({}, np.asarray([8], np.uint32))
    np.testing.assert_array_equal(np.asarray(a["images"])[1],
                                  np.asarray(solo["images"])[0])


def test_sde_windowed_capture_matches_full():
    sampler = make_sampler(point_mass_eps, 12, size=2, ch=3)
    seeds = np.asarray([3, 4], np.uint32)
    win = sampler.sample({}, seeds, capture_trajectory=4)
    full = sampler.sample({}, seeds, capture_trajectory=True)["trajectory"]
    np.testing.assert_allclose(np.asarray(win["trajectory"]),
                               np.asarray(full)[win["save_indices"]], atol=1e-6)
    stream = sampler.sample({}, seeds, capture_trajectory=4,
                            stream_to_host=True)
    np.testing.assert_allclose(stream["trajectory"],
                               np.asarray(win["trajectory"]), atol=1e-6)


def test_sde_mean_path_is_deterministic_posterior():
    # deterministic_posterior runs the mean path: still exact on point-mass
    sampler = make_sampler(point_mass_eps, 10, deterministic=True)
    out = sampler.sample({}, np.arange(4, dtype=np.uint32))
    np.testing.assert_allclose(np.asarray(out["images"]), X0_STAR, atol=5e-4)
