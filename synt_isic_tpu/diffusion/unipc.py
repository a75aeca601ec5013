r"""UniPC: unified predictor-corrector sampler (order 2, data-prediction).

A beyond-reference extension (the reference app is DDPM-only,
`core/generator/model_manager.py:196-226`) completing the standard sampler
family set (DDPM / DDIM / DPM-Solver++ / UniPC). UniPC (Zhao et al. 2023,
arXiv:2302.04867) adds a CORRECTOR to the multistep exponential-integrator
predictor: each step's single model evaluation first corrects the previous
prediction (exponential trapezoidal rule through the new endpoint), then
predicts the next grid point — higher accuracy at the same number of UNet
calls per image. The algorithm is re-derived below from the exact
variation-of-constants solution; nothing is transcribed from any
implementation.

Derivation (epsilon-parameterized model, x0/data-prediction form). With
alpha_t = sqrt(abar_t), sigma_t = sqrt(1-abar_t), lambda = log(alpha/sigma)
and h = lambda_t - lambda_s > 0, the exact reverse solution is

    x_t = (sigma_t/sigma_s) x_s + alpha_t \int_0^h e^{u-h} x0(lambda_s+u) du.

Expanding x0 around lambda_s with slope m and using
    \int_0^h e^{u-h} du     = 1 - e^{-h}
    \int_0^h e^{u-h} u du   = h - 1 + e^{-h}  =: J1(h)
gives the second-order update

    x_t = (sigma_t/sigma_s) x_s + alpha_t [ (1-e^{-h}) x0_s + J1(h) m ].

*Predictor* (UniP, explicit): slope from history,
m = (x0_k - x0_{k-1}) / h_{k-1} — a second-order Adams-Bashforth
exponential integrator. (DPM-Solver++(2M) is the same scheme with J1
approximated by (1-e^{-h}) h/2; both are O(h^2) accurate, see dpm.py.)

*Corrector* (UniC, through the new endpoint): after evaluating the model
at the PREDICTED x_k, re-integrate the SAME interval h_c = h_{k-1} with
the average of both endpoints' x0 estimates — the trapezoidal weight

    x_corr = (sigma_k/sigma_{k-1}) x_{k-1}
             + alpha_k (1-e^{-h_c}) [ x0_{k-1} + (x0_k - x0_{k-1}) / 2 ].

The corrected x_k then seeds the next prediction; no extra model
evaluation is spent (x0_k stays the estimate made at the predicted point,
as in the published algorithm). The trapezoidal 1/2 is used instead of the
exact first moment J1(h_c)/(h_c (1-e^{-h_c})) deliberately: the exact
weight grows toward 1 at large h and amplifies the staleness of x0_k
(evaluated at the predicted, not corrected, point). Measured on the
analytic Gaussian-flow oracle (tests/test_unipc.py) over the production
trailing grid, the trapezoidal corrector is the best variant at S >= 8
(e.g. S=20: 4x lower error than without it) while the exact-moment
corrector is only marginally better than none.

Boundary handling (same `lower_order_final` practice as dpm.py): the
corrector is disabled at k=0 (no previous interval — pass-through); the
predictor's slope term is zero at k=0 (no history) and at the final step
(h -> inf because sigma_{next}=0 there for both spacings), where the
update collapses to x = x0_k exactly. Deterministic by construction (like
DDIM eta=0); no SDE variant.

Pair UniPC with `timestep_spacing="trailing"` (the framework's few-step
recommendation throughout): on the trailing grid the measured oracle error
beats DPM-Solver++(2M) at EVERY step count (5 steps: 3.4x; 8: 4.9x;
20: 9.6x). The leading grid's first interval spans most of the log-SNR
range (t=999 -> t~T/S), where the corrector's endpoint extrapolation is
ill-posed — there DPM-Solver++ remains the better choice below ~20 steps.

TPU-native design: identical precomputed-(S,)-table scheme as ddpm.py /
dpm.py — one step is a handful of fused multiply-adds indexed by the scan
counter; the scan carry is (x_pred, x_prev_corrected, x0_prev), handled by
`sampler.DiffusionSampler`.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule, spaced_timesteps


def _j1(h: np.ndarray) -> np.ndarray:
    """J1(h) = \\int_0^h e^{u-h} u du = h - 1 + e^{-h} (elementwise)."""
    with np.errstate(over="ignore"):
        return np.where(np.isinf(h), np.inf,
                        h - 1.0 + np.exp(-np.where(np.isinf(h), 0.0, h)))


@dataclasses.dataclass(frozen=True)
class UniPCParams:
    """Per-inference-step coefficient tables, shape (S,) each; index k is
    the CURRENT step (model evaluated at timesteps[k])."""
    timesteps: jnp.ndarray            # int32 (S,) — descending train-timesteps
    inv_alpha: jnp.ndarray            # 1/alpha_k for the x0 prediction
    sigma: jnp.ndarray                # sigma_k for the x0 prediction
    # corrector (re-integrates [lambda_{k-1}, lambda_k]; pass-through at k=0)
    c_pass: jnp.ndarray               # 1 at k=0 else 0
    c_xt: jnp.ndarray                 # sigma_k / sigma_{k-1}
    c_d0: jnp.ndarray                 # alpha_k (1 - e^{-h_{k-1}})
    c_d1: jnp.ndarray                 # alpha_k (1 - e^{-h_{k-1}}) / 2 (trapezoid)
    # predictor (integrates [lambda_k, lambda_{k+1}])
    p_xt: jnp.ndarray                 # sigma_{k+1} / sigma_k   (0 at final)
    p_d0: jnp.ndarray                 # alpha_{k+1} (1 - e^{-h_k}) (1 at final)
    p_d1: jnp.ndarray                 # alpha_{k+1} J1(h_k) / h_{k-1}; 0 at k=0, S-1
    num_inference_steps: int
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    sde: bool = False                 # deterministic by construction

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_inference_steps: int,
               dtype=jnp.float32, clip_sample: bool = True,
               timestep_spacing: str = "leading") -> "UniPCParams":
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
            exp_mh = np.where(np.isinf(h), 0.0,
                              np.exp(-np.where(np.isinf(h), 0.0, h)))

        # predictor over [lambda_k, lambda_{k+1}]
        p_xt = sigma_next / sigma                       # 0 at final step
        p_d0 = alpha_next * (1.0 - exp_mh)              # 1 at final step
        p_d1 = np.zeros(S)
        if S > 2:
            # slope from history: m = (x0_k - x0_{k-1}) / h_{k-1}
            p_d1[1:S - 1] = alpha_next[1:S - 1] * _j1(h[1:S - 1]) / h[0:S - 2]

        # corrector over [lambda_{k-1}, lambda_k] (indexed at k; k=0 passes)
        c_pass = np.zeros(S)
        c_pass[0] = 1.0
        c_xt = np.zeros(S)
        c_d0 = np.zeros(S)
        c_d1 = np.zeros(S)
        if S > 1:
            c_xt[1:] = sigma[1:] / sigma[:S - 1]
            c_d0[1:] = alpha[1:] * (1.0 - exp_mh[:S - 1])
            # trapezoidal endpoint weight (see module docstring for why not
            # the exact moment J1(h)/h)
            c_d1[1:] = 0.5 * c_d0[1:]

        as_dt = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            inv_alpha=as_dt(1.0 / alpha), sigma=as_dt(sigma),
            c_pass=as_dt(c_pass), c_xt=as_dt(c_xt),
            c_d0=as_dt(c_d0), c_d1=as_dt(c_d1),
            p_xt=as_dt(p_xt), p_d0=as_dt(p_d0), p_d1=as_dt(p_d1),
            num_inference_steps=S, clip_sample=clip_sample,
        )


def unipc_step(x_pred: jnp.ndarray, x_prev: jnp.ndarray, x0_prev: jnp.ndarray,
               eps_pred: jnp.ndarray, k: jnp.ndarray, params: UniPCParams
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One correct-then-predict update from the single model evaluation at
    the predicted current sample. Returns (x_pred_{k+1}, x_corr_k, x0_k) —
    the caller threads the corrected sample and x0 estimate back in as the
    next step's (x_prev, x0_prev). At k=0 the corrector passes x_pred
    through unchanged and x_prev/x0_prev are ignored (coefficients 0)."""
    dt = x_pred.dtype
    x0 = (x_pred - params.sigma[k].astype(dt) * eps_pred) \
        * params.inv_alpha[k].astype(dt)
    if params.clip_sample:
        r = params.clip_sample_range
        x0 = jnp.clip(x0, -r, r)
    d1 = x0 - x0_prev
    x_corr = (params.c_pass[k].astype(dt) * x_pred
              + params.c_xt[k].astype(dt) * x_prev
              + params.c_d0[k].astype(dt) * x0_prev
              + params.c_d1[k].astype(dt) * d1)
    x_next = (params.p_xt[k].astype(dt) * x_corr
              + params.p_d0[k].astype(dt) * x0
              + params.p_d1[k].astype(dt) * d1)
    return x_next, x_corr, x0
