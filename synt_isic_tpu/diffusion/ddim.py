"""DDIM update — the accelerated-stride sampler variant.

Not present in the reference app (which is DDPM-only) but required by the
rebuild's benchmark configs ("7-class ... batch=64, DDIM-accelerated
stride"). Implements the standard DDIM update with optional eta-noise,
sharing the precomputed-table design of `ddpm.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule, spaced_timesteps


@dataclasses.dataclass(frozen=True)
class DDIMParams:
    timesteps: jnp.ndarray
    inv_sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod_prev: jnp.ndarray
    dir_coeff: jnp.ndarray          # sqrt(1 - ab_prev - sigma^2)
    sigma: jnp.ndarray              # eta-scaled stochasticity (0 => deterministic)
    num_inference_steps: int
    clip_sample: bool = True
    clip_sample_range: float = 1.0

    @classmethod
    def create(cls, schedule: DiffusionSchedule, num_inference_steps: int,
               eta: float = 0.0, dtype=jnp.float32, clip_sample: bool = True,
               timestep_spacing: str = "leading") -> "DDIMParams":
        ts = spaced_timesteps(schedule.num_train_timesteps, num_inference_steps,
                              timestep_spacing)
        ab_t = schedule.alphas_cumprod[ts]
        ab_prev = (schedule.alphas_cumprod_prev(ts, num_inference_steps)
                   if timestep_spacing == "leading"
                   else schedule.alphas_cumprod_prev_from(ts))
        variance = (1.0 - ab_prev) / (1.0 - ab_t) * (1.0 - ab_t / ab_prev)
        sigma = eta * np.sqrt(np.clip(variance, 0.0, None))
        sigma = np.where(ts > 0, sigma, 0.0)
        dir_coeff = np.sqrt(np.clip(1.0 - ab_prev - sigma ** 2, 0.0, None))
        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            inv_sqrt_alphas_cumprod=jnp.asarray(1.0 / np.sqrt(ab_t), dtype=dtype),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - ab_t), dtype=dtype),
            sqrt_alphas_cumprod_prev=jnp.asarray(np.sqrt(ab_prev), dtype=dtype),
            dir_coeff=jnp.asarray(dir_coeff, dtype=dtype),
            sigma=jnp.asarray(sigma, dtype=dtype),
            num_inference_steps=num_inference_steps,
            clip_sample=clip_sample,
        )


def ddim_step(x: jnp.ndarray, eps_pred: jnp.ndarray, k: jnp.ndarray,
              params: DDIMParams, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    dt = x.dtype
    c_inv = params.inv_sqrt_alphas_cumprod[k].astype(dt)
    c_eps = params.sqrt_one_minus_alphas_cumprod[k].astype(dt)
    c_prev = params.sqrt_alphas_cumprod_prev[k].astype(dt)
    c_dir = params.dir_coeff[k].astype(dt)
    c_sig = params.sigma[k].astype(dt)

    pred_x0 = (x - c_eps * eps_pred) * c_inv
    if params.clip_sample:
        r = params.clip_sample_range
        pred_x0 = jnp.clip(pred_x0, -r, r)
    x_prev = c_prev * pred_x0 + c_dir * eps_pred
    if noise is not None:
        x_prev = x_prev + c_sig * noise
    return x_prev
