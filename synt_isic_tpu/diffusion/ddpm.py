"""DDPM reverse-process update as pure, scan-fusable device math.

Semantics match diffusers' `DDPMScheduler.step` with the reference config
(`variance_type="fixed_small"`, `clip_sample=True`, epsilon prediction,
'leading' timestep spacing) — the call site the reference hits once per
denoise step on host (`core/generator/image_generator.py:403`,
`xai/XAI.py:808-810`).

AUDIT vs diffusers >=0.21 `schedulers/scheduling_ddpm.py` (2026-08-16):
  * set_timesteps: step_ratio = T // S; timesteps =
    (arange(S) * step_ratio).round()[::-1].astype(int64) — transcribed
    exactly in `schedules.leading_timesteps` (incl. the // floor + .round()
    pair that matters when S doesn't divide T).
  * previous_timestep(t) = t - T // S; alpha_prod_t_prev = 1.0 when
    prev_t < 0 — `schedules.alphas_cumprod_prev`.
  * step(): pred_x0 = (x - sqrt(1-ab_t) eps) / sqrt(ab_t); clip to
    [-clip_sample_range, +] (default 1.0, thresholding=False);
    x_prev = sqrt(ab_prev)*beta_t/(1-ab_t) * x0
           + sqrt(alpha_t)*(1-ab_prev)/(1-ab_t) * x;
    fixed_small variance = (1-ab_prev)/(1-ab_t) * beta_t clamped >= 1e-20,
    noise added only for t > 0 — all transcribed below. With leading
    spacing t==0 exactly at the last step, so std[k]=0 iff k == S-1.
  * One deliberate difference: diffusers computes the beta/alpha tables in
    float32; we compute them in float64 on host and cast the final
    coefficient tables to float32 (strictly more accurate, distribution
    parity unaffected — golden-chain tests vs the torch transcription pass
    at 1e-5).

TPU-native design: every per-step scalar is precomputed into (S,)-shaped
device tables indexed by the scan counter, so one step is
    x0   = clip((x - c_eps[k] * eps) * c_inv[k], -1, 1)
    x'   = c_x0[k] * x0 + c_xt[k] * x + c_std[k] * z
— four fused multiply-adds on the VPU, no host sync, no recompile across
step counts beyond one compile per (S, shape).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule, spaced_timesteps


@dataclasses.dataclass(frozen=True)
class DDPMParams:
    """Per-inference-step coefficient tables, shape (S,) each."""
    timesteps: jnp.ndarray          # int32 (S,) — descending train-timesteps
    inv_sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    pred_original_coeff: jnp.ndarray
    current_sample_coeff: jnp.ndarray
    posterior_std: jnp.ndarray      # 0 at the final (t==0) step
    num_inference_steps: int
    clip_sample: bool = True
    clip_sample_range: float = 1.0

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_inference_steps: int,
               dtype=jnp.float32, clip_sample: bool = True,
               timestep_spacing: str = "leading") -> "DDPMParams":
        ts = spaced_timesteps(schedule.num_train_timesteps, num_inference_steps,
                              timestep_spacing)
        ab_t = schedule.alphas_cumprod[ts]
        ab_prev = (schedule.alphas_cumprod_prev(ts, num_inference_steps)
                   if timestep_spacing == "leading"
                   else schedule.alphas_cumprod_prev_from(ts))
        alpha_cur = ab_t / ab_prev
        beta_cur = 1.0 - alpha_cur
        beta_prod_t = 1.0 - ab_t
        beta_prod_prev = 1.0 - ab_prev

        pred_original_coeff = np.sqrt(ab_prev) * beta_cur / beta_prod_t
        current_sample_coeff = np.sqrt(alpha_cur) * beta_prod_prev / beta_prod_t
        # fixed_small posterior variance, clamped like the reference scheduler
        variance = np.clip(beta_prod_prev / beta_prod_t * beta_cur, 1e-20, None)
        std = np.sqrt(variance)
        std = np.where(ts > 0, std, 0.0)  # no noise at the final step

        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            inv_sqrt_alphas_cumprod=jnp.asarray(1.0 / np.sqrt(ab_t), dtype=dtype),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(beta_prod_t), dtype=dtype),
            pred_original_coeff=jnp.asarray(pred_original_coeff, dtype=dtype),
            current_sample_coeff=jnp.asarray(current_sample_coeff, dtype=dtype),
            posterior_std=jnp.asarray(std, dtype=dtype),
            num_inference_steps=num_inference_steps,
            clip_sample=clip_sample,
        )


def ddpm_step(x: jnp.ndarray, eps_pred: jnp.ndarray, k: jnp.ndarray,
              params: DDPMParams, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One reverse step x_{t_k} -> x_{t_{k+1}} (k is the scan index 0..S-1).

    `noise` must be standard normal of x's shape (ignored automatically at
    the final step where posterior_std == 0).
    """
    dt = x.dtype
    c_inv = params.inv_sqrt_alphas_cumprod[k].astype(dt)
    c_eps = params.sqrt_one_minus_alphas_cumprod[k].astype(dt)
    c_x0 = params.pred_original_coeff[k].astype(dt)
    c_xt = params.current_sample_coeff[k].astype(dt)
    c_std = params.posterior_std[k].astype(dt)

    pred_x0 = (x - c_eps * eps_pred) * c_inv
    if params.clip_sample:
        r = params.clip_sample_range
        pred_x0 = jnp.clip(pred_x0, -r, r)
    x_prev = c_x0 * pred_x0 + c_xt * x
    if noise is not None:
        x_prev = x_prev + c_std * noise
    return x_prev


def add_noise(schedule: DiffusionSchedule, sample: jnp.ndarray, noise: jnp.ndarray,
              timesteps: jnp.ndarray) -> jnp.ndarray:
    """Forward process q(x_t | x_0) for training
    (reference `diffusion/train_diffusion.py:231-233`)."""
    ab = jnp.asarray(schedule.alphas_cumprod, dtype=sample.dtype)[timesteps]
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sqrt_ab = jnp.sqrt(ab).reshape(shape)
    sqrt_1mab = jnp.sqrt(1.0 - ab).reshape(shape)
    return sqrt_ab * sample + sqrt_1mab * noise
