"""Headline benchmark: images/sec/chip for 128x128 DDPM T=1000 generation.

Measures the jitted lax.scan sampler (full-size ~25M-param UNet2D, bf16
compute) on the real TPU chip, against the reference-equivalent PyTorch
CPU path on this host (torch oracle transcription of the same
architecture + per-step scheduler math — the reference's own stack,
diffusers/torch, runs exactly this loop per image:
`core/generator/image_generator.py:395-438`). The baseline is extrapolated
from a few timed steps because the full 1000-step reference loop takes
tens of minutes per image on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = 8
STEPS = 1000
BASELINE_PROBE_STEPS = 3


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from synt_isic_tpu.diffusion import DiffusionSchedule, DiffusionSampler, SamplerConfig
    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

    on_tpu = jax.devices()[0].platform == "tpu"
    model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16,
                   use_fused_attention=on_tpu)
    init_model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16)
    params = init_unet_params(init_model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    sampler = DiffusionSampler(
        apply_fn, DiffusionSchedule.create(),
        SamplerConfig(num_inference_steps=STEPS, dtype=jnp.bfloat16))

    seeds = np.arange(BATCH, dtype=np.uint32)
    # warmup / compile
    out = sampler.sample(params, seeds)
    out["images"].block_until_ready()
    # timed runs
    t0 = time.time()
    n_runs = 2
    for r in range(n_runs):
        out = sampler.sample(params, seeds + (r + 1) * BATCH)
        out["images"].block_until_ready()
    dt = time.time() - t0
    return (BATCH * n_runs) / dt


def bench_torch_cpu_baseline() -> float:
    """Reference-equivalent per-image throughput on this host's CPU."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_oracle.unet2d_torch import UNet2DTorch

    from synt_isic_tpu.diffusion.schedules import DiffusionSchedule, leading_timesteps

    torch.manual_seed(0)
    model = UNet2DTorch().eval()
    schedule = DiffusionSchedule.create()
    ts = leading_timesteps(1000, STEPS)
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        model(x, torch.tensor([int(ts[0])]))  # warmup
        t0 = time.time()
        for k in range(BASELINE_PROBE_STEPS):
            t = int(ts[k])
            eps = model(x, torch.tensor([t]))
            # per-step scheduler math (host, like the reference)
            ab_t = schedule.alphas_cumprod[t]
            prev_t = t - 1000 // STEPS
            ab_prev = schedule.alphas_cumprod[prev_t] if prev_t >= 0 else 1.0
            x0 = ((x - float(np.sqrt(1 - ab_t)) * eps) / float(np.sqrt(ab_t))).clamp(-1, 1)
            beta_cur = float(1 - ab_t / ab_prev)
            c0 = float(np.sqrt(ab_prev)) * beta_cur / float(1 - ab_t)
            ct = float(np.sqrt(ab_t / ab_prev)) * float(1 - ab_prev) / float(1 - ab_t)
            x = c0 * x0 + ct * x
            if t > 0:
                var = max(float((1 - ab_prev) / (1 - ab_t)) * beta_cur, 1e-20)
                x = x + float(np.sqrt(var)) * torch.randn_like(x)
        per_step = (time.time() - t0) / BASELINE_PROBE_STEPS
    return 1.0 / (per_step * STEPS)  # images/sec at batch 1


def main() -> None:
    tpu_ips = bench_tpu()
    try:
        base_ips = bench_torch_cpu_baseline()
    except Exception:
        base_ips = float("nan")
    vs = tpu_ips / base_ips if base_ips == base_ips and base_ips > 0 else None
    print(json.dumps({
        "metric": "images_per_sec_chip_ddpm_128_T1000_b8_bf16",
        "value": round(tpu_ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
