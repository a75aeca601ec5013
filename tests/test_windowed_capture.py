"""Windowed trajectory capture: frames must equal the full-capture ones at
save_indices, with O(S/n) memory."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.diffusion import (DiffusionSampler, DiffusionSchedule,
                                     SamplerConfig)
from synt_isic_tpu.diffusion.sampler import save_indices
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


@pytest.mark.parametrize("steps,every", [(10, 3), (8, 2), (6, 5)])
@pytest.mark.slow
def test_windowed_matches_full(steps, every):
    model = UNet2D(config=TINY)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    sampler = DiffusionSampler(apply_fn, DiffusionSchedule.create(),
                               SamplerConfig(num_inference_steps=steps,
                                             image_size=16))
    full = sampler.sample(params, [3, 4], capture_trajectory=True)
    win = sampler.sample(params, [3, 4], capture_trajectory=every)
    idx = save_indices(steps, every, sampler.timesteps)
    assert win["save_indices"] == idx
    assert win["trajectory"].shape[0] == len(idx)
    np.testing.assert_allclose(np.asarray(win["trajectory"]),
                               np.asarray(full["trajectory"])[idx],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(win["images"]),
                               np.asarray(full["images"]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("steps,every", [(10, 300), (12, 250), (6, 999)])
@pytest.mark.slow
def test_absolute_t_windowed_matches_full(steps, every):
    """save_every >= steps triggers the absolute-t save mode (reference
    `XAI.py:756-779`): frames whose train-timestep is nearest each multiple
    of save_every, plus t=0 and t_max — captured with the SAME segmented
    scan, O(saved) device memory (no fall back to full capture)."""
    model = UNet2D(config=TINY)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    sampler = DiffusionSampler(apply_fn, DiffusionSchedule.create(),
                               SamplerConfig(num_inference_steps=steps,
                                             image_size=16))
    full = sampler.sample(params, [7], capture_trajectory=True)
    win = sampler.sample(params, [7], capture_trajectory=every)
    idx = save_indices(steps, every, sampler.timesteps)
    assert win["save_indices"] == idx
    assert len(idx) < steps  # genuinely windowed, not full capture
    # the schedule covers t=0, t_max and each multiple of `every` in range
    ts = sampler.timesteps
    saved_ts = {int(ts[i]) for i in idx}
    desired = {0, int(ts.max())} | {
        k for k in range(0, 1001, every) if k <= int(ts.max())}
    for dt in desired:
        assert min(abs(st - dt) for st in saved_ts) <= \
            max(1, int(np.diff(np.sort(ts)).max()))
    np.testing.assert_allclose(np.asarray(win["trajectory"]),
                               np.asarray(full["trajectory"])[idx],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("scheduler", ["ddpm", "dpm_solver"])
@pytest.mark.parametrize("steps,every", [(10, 3), (6, 1)])
@pytest.mark.slow
def test_streamed_matches_windowed(steps, every, scheduler):
    """stream_to_host: per-segment dispatch + async offload must reproduce
    the single-jit windowed capture bit-for-bit (same seeds, same RNG
    fold_in schedule)."""
    model = UNet2D(config=TINY)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    sampler = DiffusionSampler(apply_fn, DiffusionSchedule.create(),
                               SamplerConfig(num_inference_steps=steps,
                                             image_size=16,
                                             scheduler=scheduler))
    win = sampler.sample(params, [3, 4], capture_trajectory=every)
    stream = sampler.sample(params, [3, 4], capture_trajectory=every,
                            stream_to_host=True)
    assert isinstance(stream["trajectory"], np.ndarray)
    assert stream["save_indices"] == win["save_indices"]
    np.testing.assert_array_equal(stream["trajectory"],
                                  np.asarray(win["trajectory"]))
    np.testing.assert_array_equal(np.asarray(stream["images"]),
                                  np.asarray(win["images"]))


def test_streamed_full_capture_equals_capture_true():
    model = UNet2D(config=TINY)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    sampler = DiffusionSampler(apply_fn, DiffusionSchedule.create(),
                               SamplerConfig(num_inference_steps=7,
                                             image_size=16))
    full = sampler.sample(params, [9], capture_trajectory=True)
    stream = sampler.sample(params, [9], capture_trajectory=True,
                            stream_to_host=True)
    np.testing.assert_array_equal(stream["trajectory"],
                                  np.asarray(full["trajectory"]))
