"""UniPC predictor-corrector correctness: exactness, oracle accuracy, plumbing.

Like the DPM-Solver++ suite (tests/test_dpm_solver.py), correctness is
proven against analytic probability-flow ODEs with closed-form epsilon
predictors — no other implementation is consulted. The headline claim
under test: on the TRAILING grid (the framework's few-step
recommendation), UniPC's corrector buys a decisive accuracy win over
DPM-Solver++(2M) at the same number of model evaluations.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.diffusion import DiffusionSchedule, DiffusionSampler, SamplerConfig
from synt_isic_tpu.diffusion.schedules import trailing_timesteps

SCHEDULE = DiffusionSchedule.create()
AB = SCHEDULE.alphas_cumprod
X0_STAR = 0.37
TAU = 2.0


def make_sampler(apply_fn, steps, scheduler="unipc", spacing="trailing",
                 clip=False, size=1, ch=1):
    cfg = SamplerConfig(num_inference_steps=steps, scheduler=scheduler,
                        image_size=size, channels=ch, clip_sample=clip,
                        timestep_spacing=spacing)
    return DiffusionSampler(apply_fn, SCHEDULE, cfg)


def point_mass_eps(params, x, t):
    ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
    return (x - jnp.sqrt(ab) * X0_STAR) / jnp.sqrt(1.0 - ab)


def gaussian_eps(params, x, t):
    ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sqrt(1.0 - ab) * x / (ab * TAU ** 2 + 1.0 - ab)


def gaussian_error(scheduler, steps, x_init, spacing="trailing"):
    t0 = int(trailing_timesteps(1000, steps)[0])
    var0 = AB[t0] * TAU ** 2 + (1.0 - AB[t0])
    truth = np.asarray(x_init, np.float64) * np.sqrt(TAU ** 2 / var0)
    sampler = make_sampler(gaussian_eps, steps, scheduler, spacing)
    out = sampler.sample({}, np.zeros(x_init.shape[0], np.uint32),
                         initial_noise=jnp.asarray(x_init, jnp.float32))
    return float(np.max(np.abs(np.asarray(out["images"], np.float64) - truth)))


# --------------------------------------------------------------------------
# Exactness: with a point-mass data distribution both the corrector and the
# predictor are exact at any step count (the slope terms vanish and the
# first-order exponential update satisfies the semigroup property).
# --------------------------------------------------------------------------
@pytest.mark.parametrize("steps", [1, 2, 3, 10])
@pytest.mark.parametrize("spacing", ["leading", "trailing"])
def test_point_mass_exactness(steps, spacing):
    sampler = make_sampler(point_mass_eps, steps, spacing=spacing)
    out = sampler.sample({}, np.arange(4, dtype=np.uint32))
    np.testing.assert_allclose(np.asarray(out["images"]), X0_STAR, atol=5e-4)


# --------------------------------------------------------------------------
# Gaussian flow oracle (order-discriminating; see test_dpm_solver.py):
# on the trailing grid the corrector must beat DPM-Solver++(2M) decisively
# at the same model-evaluation budget, and refinement must reduce error.
# Measured values at this writing: S=8 unipc 0.092 vs dpm 0.448;
# S=20 unipc 0.011 vs dpm 0.109.
# --------------------------------------------------------------------------
def test_beats_dpm_on_trailing_grid():
    rng = np.random.default_rng(0)
    x_init = rng.standard_normal((16, 1, 1, 1))
    for steps in (8, 20):
        e_uni = gaussian_error("unipc", steps, x_init)
        e_dpm = gaussian_error("dpm_solver", steps, x_init)
        assert e_uni < 0.5 * e_dpm, (steps, e_uni, e_dpm)
    assert gaussian_error("unipc", 16, x_init) < gaussian_error("unipc", 8, x_init)
    assert gaussian_error("unipc", 32, x_init) < gaussian_error("unipc", 16, x_init)


# --------------------------------------------------------------------------
# Plumbing: determinism, capture (windowed + full + streamed), conditional.
# --------------------------------------------------------------------------
def test_deterministic_and_capture():
    sampler = make_sampler(point_mass_eps, 12, size=2, ch=3)
    seeds = np.asarray([7, 8], np.uint32)
    a = sampler.sample({}, seeds, capture_trajectory=4)
    b = sampler.sample({}, seeds, capture_trajectory=4)
    np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
    assert a["save_indices"] == [0, 4, 8, 11]
    assert a["trajectory"].shape == (4, 2, 2, 2, 3)
    full = sampler.sample({}, seeds, capture_trajectory=True)["trajectory"]
    for i, s in enumerate(a["save_indices"]):
        np.testing.assert_allclose(np.asarray(a["trajectory"][i]),
                                   np.asarray(full[s]), atol=1e-6)


def test_streamed_capture_matches_compiled():
    sampler = make_sampler(point_mass_eps, 10, size=2, ch=1)
    seeds = np.asarray([3, 4], np.uint32)
    direct = sampler.sample({}, seeds, capture_trajectory=5)
    streamed = sampler.sample({}, seeds, capture_trajectory=5,
                              stream_to_host=True)
    np.testing.assert_allclose(np.asarray(direct["images"]),
                               np.asarray(streamed["images"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(direct["trajectory"]),
                               np.asarray(streamed["trajectory"]), atol=1e-6)
    assert direct["save_indices"] == streamed["save_indices"]


def test_conditional_cfg_runs():
    """UniPC composes with the conditional/CFG predictor: labels reach the
    epsilon function and guidance runs the 2B-batched combination."""
    def cond_eps(params, x, t, labels):
        ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
        shift = 0.1 * labels.astype(jnp.float32).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(ab) * (X0_STAR + shift)) / jnp.sqrt(1.0 - ab)

    cfg = SamplerConfig(num_inference_steps=6, scheduler="unipc",
                        image_size=2, channels=1, clip_sample=False,
                        timestep_spacing="trailing", guidance_scale=2.0)
    sampler = DiffusionSampler(cond_eps, SCHEDULE, cfg, conditional=True,
                               null_label=3)
    out = sampler.sample({}, np.asarray([1, 2], np.uint32),
                         class_labels=np.asarray([0, 1], np.int32))
    imgs = np.asarray(out["images"])
    assert imgs.shape == (2, 2, 2, 1) and np.isfinite(imgs).all()
    # label 0 guided against null=3: eps-shift pushes the sample DOWN from
    # the null target; label 1 less so — outputs must differ per label
    assert not np.allclose(imgs[0], imgs[1])


def test_model_manager_creates_unipc(tmp_path):
    """The production surface accepts scheduler='unipc' end to end."""
    import torch

    from synt_isic_tpu.model_manager import ModelManager
    from synt_isic_tpu.models.unet2d import UNet2DConfig

    from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

    tiny_t = tiny_config()
    tiny_j = UNet2DConfig(
        sample_size=tiny_t["sample_size"],
        layers_per_block=tiny_t["layers_per_block"],
        block_out_channels=tiny_t["block_out_channels"],
        down_block_types=tiny_t["down_block_types"],
        up_block_types=tiny_t["up_block_types"],
        attention_head_dim=tiny_t["attention_head_dim"],
        norm_num_groups=tiny_t["norm_num_groups"])
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**tiny_t).state_dict(), tmp_path / "unet_NV_best.pth")
    mm = ModelManager(checkpoints_dir=str(tmp_path), model_config=tiny_j,
                      cache_manager=None)
    assert mm.load_model("NV")
    sampler = mm.create_sampler(4, scheduler="unipc",
                                timestep_spacing="trailing")
    out = sampler.sample(mm.loaded_params["NV"], np.asarray([5], np.uint32))
    imgs = np.asarray(out["images"])
    assert imgs.shape == (1, tiny_j.sample_size, tiny_j.sample_size, 3) \
        and np.isfinite(imgs).all()
