"""Golden end-to-end chain: our jitted scan sampler vs the torch oracle
running the same UNet weights + the same DDPM posterior math, with
identical injected initial noise and ZERO posterior noise — the outputs of
the whole denoising chain must agree step for step.

This pins the entire compute path (checkpoint conversion, NHWC model,
table-form scheduler, scan plumbing) against an independent implementation.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from synt_isic_tpu.diffusion import (DiffusionSampler, DiffusionSchedule,
                                     SamplerConfig)
from synt_isic_tpu.diffusion.schedules import leading_timesteps
from synt_isic_tpu.io import load_pth, torch_to_flax
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig

from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

STEPS = 5


def _torch_chain(tmodel, schedule, x0_nchw, steps):
    ts = leading_timesteps(1000, steps)
    x = torch.from_numpy(x0_nchw).clone()
    frames = []
    with torch.no_grad():
        for k, t in enumerate(ts):
            t = int(t)
            eps = tmodel(x, torch.tensor([t] * x.shape[0]))
            ab_t = schedule.alphas_cumprod[t]
            prev = t - 1000 // steps
            ab_prev = schedule.alphas_cumprod[prev] if prev >= 0 else 1.0
            x0 = ((x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t)).clamp(-1, 1)
            beta_cur = 1 - ab_t / ab_prev
            c0 = np.sqrt(ab_prev) * beta_cur / (1 - ab_t)
            ct = np.sqrt(ab_t / ab_prev) * (1 - ab_prev) / (1 - ab_t)
            x = c0 * x0 + ct * x  # no posterior noise (deterministic mode)
            frames.append(x.numpy().transpose(0, 2, 3, 1))
    return np.stack(frames)


def test_full_chain_matches_torch(tmp_path):
    torch.manual_seed(0)
    tc = tiny_config()
    tmodel = UNet2DTorch(**tc).eval()
    path = str(tmp_path / "unet_X_best.pth")
    torch.save(tmodel.state_dict(), path)

    jcfg = UNet2DConfig(
        sample_size=tc["sample_size"], layers_per_block=tc["layers_per_block"],
        block_out_channels=tc["block_out_channels"],
        down_block_types=tc["down_block_types"],
        up_block_types=tc["up_block_types"],
        attention_head_dim=tc["attention_head_dim"],
        norm_num_groups=tc["norm_num_groups"])
    model = UNet2D(config=jcfg)
    params = torch_to_flax(load_pth(path))
    sampler = DiffusionSampler(
        lambda p, x, t: model.apply({"params": p}, x, t),
        DiffusionSchedule.create(),
        SamplerConfig(num_inference_steps=STEPS, image_size=tc["sample_size"],
                      deterministic_posterior=True))

    rng = np.random.default_rng(0)
    noise = rng.normal(size=(2, tc["sample_size"], tc["sample_size"], 3)) \
        .astype(np.float32)
    out = sampler.sample(params, [0, 1], capture_trajectory=True,
                         initial_noise=jnp.asarray(noise))
    ours = np.asarray(out["trajectory"])                       # (S, B, H, W, C)

    want = _torch_chain(tmodel, DiffusionSchedule.create(),
                        noise.transpose(0, 3, 1, 2), STEPS)    # (S, B, H, W, C)
    # error accumulates through the chain at default XLA precision; the
    # chain would diverge wildly on any structural mismatch
    np.testing.assert_allclose(ours[0], want[0], rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(ours[-1], want[-1], rtol=8e-2, atol=4e-2)
    # correlation over the whole trajectory must be essentially 1
    corr = np.corrcoef(ours.ravel(), want.ravel())[0, 1]
    assert corr > 0.999
