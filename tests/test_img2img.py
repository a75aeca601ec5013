"""img2img (SDEdit) + inpainting (RePaint-style) sampler tests (tiny UNet, CPU).

The reference generator is noise-only (`core/generator/image_generator.py:
395-438`); this is the beyond-reference augmentation path: forward-noise a
real image to `strength` of the walk, denoise the remainder, optionally
re-imposing a known region each step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.diffusion import (DiffusionSampler, DiffusionSchedule,
                                     SamplerConfig)
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


@pytest.fixture(scope="module")
def setup():
    model = UNet2D(config=TINY)
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
    return apply_fn, params


def _sampler(apply_fn, steps=8, scheduler="ddim", **kw):
    return DiffusionSampler(apply_fn, DiffusionSchedule.create(),
                            SamplerConfig(num_inference_steps=steps,
                                          scheduler=scheduler, image_size=16, **kw))


def _init_image(seed=0, batch=None):
    rng = np.random.default_rng(seed)
    shape = (16, 16, 3) if batch is None else (batch, 16, 16, 3)
    return np.clip(rng.normal(0, 0.3, shape), -1, 1).astype(np.float32)


def test_img2img_deterministic_and_seed_sensitive(setup):
    apply_fn, params = setup
    s = _sampler(apply_fn)
    init = _init_image()
    a = s.img2img(params, [5, 6], init, strength=0.5)
    b = s.img2img(params, [5, 6], init, strength=0.5)
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
    assert a["noise_hashes"] == b["noise_hashes"]
    c = s.img2img(params, [7, 8], init, strength=0.5)
    assert not np.allclose(np.asarray(a["images"]), np.asarray(c["images"]))


def test_strength_controls_fidelity(setup):
    """Lower strength keeps the output closer to the init image."""
    apply_fn, params = setup
    s = _sampler(apply_fn, steps=10)
    init = _init_image(1)
    lo = s.img2img(params, 3, init, strength=0.2)
    hi = s.img2img(params, 3, init, strength=1.0)
    d_lo = float(np.mean((np.asarray(lo["images"])[0] - init) ** 2))
    d_hi = float(np.mean((np.asarray(hi["images"])[0] - init) ** 2))
    assert d_lo < d_hi
    assert lo["start_index"] == 8 and hi["start_index"] == 0
    assert lo["t_start"] == int(s.timesteps[8])


def test_img2img_trajectory_covers_executed_steps_only(setup):
    apply_fn, params = setup
    s = _sampler(apply_fn, steps=10)
    out = s.img2img(params, [1, 2], _init_image(2), strength=0.5,
                    capture_trajectory=True)
    assert out["trajectory"].shape == (5, 2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out["trajectory"][-1]),
                               np.asarray(out["images"]), rtol=1e-6)


def test_inpaint_keeps_known_region_exactly(setup):
    apply_fn, params = setup
    s = _sampler(apply_fn)
    init = _init_image(3)
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0  # regenerate the center only
    out = s.img2img(params, 9, init, strength=1.0, mask=mask)
    img = np.asarray(out["images"])[0]
    known = mask[:, :, None] == 0.0
    np.testing.assert_allclose(img[np.broadcast_to(known, img.shape)],
                               init[np.broadcast_to(known, img.shape)],
                               atol=1e-6)
    # the regenerated region actually changed
    assert not np.allclose(img[4:12, 4:12], init[4:12, 4:12])


def test_all_ones_mask_matches_unmasked(setup):
    apply_fn, params = setup
    s = _sampler(apply_fn)
    init = _init_image(4)
    a = s.img2img(params, 11, init, strength=0.75)
    b = s.img2img(params, 11, init, strength=0.75,
                  mask=np.ones((16, 16), np.float32))
    np.testing.assert_allclose(np.asarray(a["images"]), np.asarray(b["images"]),
                               atol=1e-6)


def test_img2img_matches_across_ddpm_and_capture(setup):
    """DDPM (stochastic posterior) path runs and is seed-deterministic."""
    apply_fn, params = setup
    s = _sampler(apply_fn, scheduler="ddpm")
    init = _init_image(5)
    a = s.img2img(params, 21, init, strength=0.5)
    b = s.img2img(params, 21, init, strength=0.5)
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))


def test_img2img_rejects_multistep_and_bad_args(setup):
    apply_fn, params = setup
    for sched in ("dpm_solver", "unipc"):
        s = _sampler(apply_fn, scheduler=sched)
        with pytest.raises(NotImplementedError):
            s.img2img(params, 1, _init_image())
    s = _sampler(apply_fn)
    with pytest.raises(ValueError):
        s.img2img(params, 1, _init_image(), strength=0.0)
    with pytest.raises(ValueError):
        s.img2img(params, 1, _init_image(), strength=1.5)
    with pytest.raises(ValueError):
        s.img2img(params, 1, np.zeros((8, 8, 3), np.float32))
    with pytest.raises(ValueError):
        s.img2img(params, 1, _init_image(), mask=np.ones((8, 8), np.float32))
    with pytest.raises(ValueError):
        # leading dim neither 1 nor the seed batch: must fail with the
        # descriptive error, not an opaque broadcast error inside the scan
        s.img2img(params, 1, _init_image(),
                  mask=np.ones((3, 16, 16, 1), np.float32))
    with pytest.raises(ValueError):
        s.img2img(params, 1, _init_image(), class_labels=2)


def test_img2img_conditional_with_cfg():
    model = UNet2D(config=UNet2DConfig(
        sample_size=16, layers_per_block=1, block_out_channels=(8, 16, 16),
        attention_head_dim=4, norm_num_groups=2,
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        num_class_embeds=8))
    params = init_unet_params(model, jax.random.PRNGKey(0))
    apply_fn = lambda p, x, t, y: model.apply({"params": p}, x, t, y)
    s = DiffusionSampler(apply_fn, DiffusionSchedule.create(),
                         SamplerConfig(num_inference_steps=6, scheduler="ddim",
                                       image_size=16, guidance_scale=2.0),
                         conditional=True, null_label=7)
    init = _init_image(6)
    a = s.img2img(params, [1, 2], init, strength=0.5, class_labels=[0, 3])
    b = s.img2img(params, [1, 2], init, strength=0.5, class_labels=[0, 3])
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
    c = s.img2img(params, [1, 2], init, strength=0.5, class_labels=[1, 3])
    assert not np.allclose(np.asarray(a["images"])[0], np.asarray(c["images"])[0])
    # unchanged label at unchanged seed stays unchanged
    np.testing.assert_array_equal(np.asarray(a["images"])[1],
                                  np.asarray(c["images"])[1])
    with pytest.raises(ValueError):
        s.img2img(params, 1, init, strength=0.5)
