"""DPM-Solver++(2M): second-order multistep ODE sampler (+ SDE variant).

A beyond-reference extension (the reference app is DDPM-only,
`core/generator/model_manager.py:196-226`): DPM-Solver++ integrates the
probability-flow ODE in the log-SNR domain with a second-order multistep
correction, matching DDIM at EQUAL step counts and targeting few-step
sampling — on well-trained large models it approaches DDIM-50 quality in
~15-25 UNet calls; on the small procedural checkpoint the measured frontier
(BENCHMARKS.md round 3) shows step reduction below 50 costs quality —
i.e. ~2.5x fewer forwards per image for the production workload (Lu et al.
2022, arXiv:2211.01095; algorithm re-derived here from the paper's eq. 4.3
data-prediction form, not transcribed from any implementation).

Update rule (epsilon-parameterized model, data-prediction form), with
alpha_t = sqrt(abar_t), sigma_t = sqrt(1-abar_t), lambda_t = log(alpha/sigma),
h_k = lambda_{k+1} - lambda_k:

    x0_k   = (x_k - sigma_k * eps) / alpha_k            (clipped like DDPM)
    D_k    = x0_k + c2_k * (x0_k - x0_{k-1})            c2_k = h_k / (2 h_{k-1})
    x_{k+1} = (sigma_{k+1}/sigma_k) x_k + alpha_{k+1} (1 - e^{-h_k}) D_k

First step (no history) and final step (h -> inf with leading spacing, so
the correction term is ill-conditioned) use the first-order update
(c2 = 0), the standard `lower_order_final` practice. The final step's
sigma_{k+1} = 0, e^{-h} = 0 collapse the update to x = D — the solver
returns its x0 estimate exactly, with no stochastic term anywhere
(deterministic by construction, like DDIM eta=0).

SDE variant (`sde=True`, SDE-DPM-Solver++(2M), Lu et al. 2022 §5 /
eq. 5.3 data-prediction form, re-derived here): the reverse-SDE solution
in the log-SNR domain replaces the ODE weighting kernel e^{-(lam_t-lam)}
with e^{-2(lam_t-lam)} and adds the exact Gaussian increment:

    x_{k+1} = (sigma_{k+1}/sigma_k) e^{-h} x_k
              + alpha_{k+1} (1 - e^{-2h}) D_k
              + sigma_{k+1} sqrt(1 - e^{-2h}) z,   z ~ N(0, I)

with the SAME multistep correction D_k = x0_k + c2 (x0_k - x0_{k-1}),
c2 = h/(2 h_prev) (the linear-in-lambda x0 extrapolation integrates to
alpha (1-e^{-2h}) h/2 m + O(h^3), m = (x0_k - x0_prev)/h_prev).
Marginal-preservation identities (tested in tests/test_dpm_sde.py):
with exact x0, sample_coeff * alpha_k + d_coeff = alpha_{k+1} and
sample_coeff^2 sigma_k^2 + noise_coeff^2 = sigma_{k+1}^2 — an exact
denoiser walks the true forward marginals N(alpha_t x0, sigma_t^2).
Like ancestral DDPM, the per-step noise restores high-frequency texture
that deterministic solvers low-pass (measured: the sampler-ladder's
quality winner is ancestral DDPM-250; the SDE solver targets that
quality regime at multistep step counts).

TPU-native design: same precomputed (S,)-table scheme as `ddpm.py` — one
step is four fused multiply-adds indexed by the scan counter; the only
structural difference is the (x, x0_prev) scan carry (handled by
`sampler.DiffusionSampler`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule, spaced_timesteps


@dataclasses.dataclass(frozen=True)
class DPMSolverParams:
    """Per-inference-step coefficient tables, shape (S,) each."""
    timesteps: jnp.ndarray            # int32 (S,) — descending train-timesteps
    inv_alpha: jnp.ndarray            # 1/alpha_k for the x0 prediction
    sigma: jnp.ndarray                # sigma_k for the x0 prediction
    sample_coeff: jnp.ndarray         # sigma_{k+1}/sigma_k   (0 at final step)
    d_coeff: jnp.ndarray              # alpha_{k+1}(1-e^{-h}) (1 at final step)
    c2: jnp.ndarray                   # h_k/(2 h_{k-1}); 0 at k=0 and k=S-1
    noise_coeff: jnp.ndarray          # sigma_{k+1} sqrt(1-e^{-2h}); zeros (ODE)
    num_inference_steps: int
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    sde: bool = False

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_inference_steps: int,
               dtype=jnp.float32, clip_sample: bool = True,
               timestep_spacing: str = "leading",
               sde: bool = False) -> "DPMSolverParams":
        S = num_inference_steps
        ts = spaced_timesteps(schedule.num_train_timesteps, S, timestep_spacing)
        ab_t = schedule.alphas_cumprod[ts]
        ab_next = (schedule.alphas_cumprod_prev(ts, S)   # 1.0 past the end
                   if timestep_spacing == "leading"
                   else schedule.alphas_cumprod_prev_from(ts))

        alpha = np.sqrt(ab_t)
        sigma = np.sqrt(1.0 - ab_t)
        alpha_next = np.sqrt(ab_next)
        sigma_next = np.sqrt(1.0 - ab_next)            # exactly 0 at the final step

        with np.errstate(divide="ignore"):
            lam = np.log(alpha / sigma)
            lam_next = np.log(alpha_next / np.where(sigma_next > 0, sigma_next, 1.0))
            lam_next = np.where(sigma_next > 0, lam_next, np.inf)
        h = lam_next - lam                              # > 0; inf at the final step

        with np.errstate(over="ignore"):
            exp_mh = np.where(np.isinf(h), 0.0, np.exp(-np.where(np.isinf(h), 0.0, h)))
        if sde:
            # reverse-SDE discretization: extra e^{-h} contraction on x,
            # e^{-2h} weighting on the x0 term, exact Gaussian increment
            exp_m2h = exp_mh * exp_mh
            sample_coeff = (sigma_next / sigma) * exp_mh      # 0 at final step
            d_coeff = alpha_next * (1.0 - exp_m2h)
            noise_coeff = sigma_next * np.sqrt(1.0 - exp_m2h)  # 0 at final step
        else:
            sample_coeff = sigma_next / sigma               # 0 at final step
            d_coeff = alpha_next * (1.0 - exp_mh)
            noise_coeff = np.zeros(S)

        # Second-order correction ratio. c2[0] = 0 (no history yet);
        # c2[S-1] = 0 (lower-order final, h -> inf).
        c2 = np.zeros(S)
        if S > 2:
            c2[1:S - 1] = h[1:S - 1] / (2.0 * h[0:S - 2])

        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            inv_alpha=jnp.asarray(1.0 / alpha, dtype=dtype),
            sigma=jnp.asarray(sigma, dtype=dtype),
            sample_coeff=jnp.asarray(sample_coeff, dtype=dtype),
            d_coeff=jnp.asarray(d_coeff, dtype=dtype),
            c2=jnp.asarray(c2, dtype=dtype),
            noise_coeff=jnp.asarray(noise_coeff, dtype=dtype),
            num_inference_steps=S,
            clip_sample=clip_sample,
            sde=sde,
        )


def dpm_solver_step(x: jnp.ndarray, x0_prev: jnp.ndarray, eps_pred: jnp.ndarray,
                    k: jnp.ndarray, params: DPMSolverParams,
                    noise: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One multistep update. Returns (x_{k+1}, x0_k) — the caller threads
    x0_k back in as the next step's history (x0_prev at k=0 is ignored
    because c2[0] == 0). `noise` is the per-step standard normal for the
    SDE variant (required when params.sde; ignored — coefficient 0 —
    otherwise; None runs the mean path, like DDPM's
    deterministic_posterior)."""
    dt = x.dtype
    c_inv = params.inv_alpha[k].astype(dt)
    c_sig = params.sigma[k].astype(dt)
    c_xt = params.sample_coeff[k].astype(dt)
    c_d = params.d_coeff[k].astype(dt)
    c2 = params.c2[k].astype(dt)

    x0 = (x - c_sig * eps_pred) * c_inv
    if params.clip_sample:
        r = params.clip_sample_range
        x0 = jnp.clip(x0, -r, r)
    d = x0 + c2 * (x0 - x0_prev)
    x_next = c_xt * x + c_d * d
    if params.sde and noise is not None:
        x_next = x_next + params.noise_coeff[k].astype(dt) * noise
    return x_next, x0
