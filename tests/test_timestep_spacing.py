"""Trailing timestep spacing (beyond-reference few-step fix).

Leading spacing (reference parity) never visits t = T-1: at S=20 pure
N(0,1) noise enters the model labeled t=950 — a train/sample mismatch
growing as S shrinks. Trailing spacing always starts at T-1. Correctness
is proven on grids + the analytic Gaussian flow (the same oracle as
test_dpm_solver.py), and the full sidecar/reproduce plumbing is
round-tripped.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.diffusion import DiffusionSampler, DiffusionSchedule, SamplerConfig
from synt_isic_tpu.diffusion.schedules import (leading_timesteps,
                                               spaced_timesteps,
                                               trailing_timesteps)

SCHEDULE = DiffusionSchedule.create()
AB = SCHEDULE.alphas_cumprod


def test_trailing_grid_values():
    ts = trailing_timesteps(1000, 20)
    assert ts[0] == 999 and ts[-1] == 49 and len(ts) == 20
    assert np.all(np.diff(ts) == -50)
    ts50 = trailing_timesteps(1000, 50)
    assert ts50[0] == 999 and ts50[-1] == 19
    # S == T: both spacings are the full reversed schedule
    np.testing.assert_array_equal(trailing_timesteps(1000, 1000),
                                  leading_timesteps(1000, 1000))
    # non-dividing S: grid is descending, starts at T-1, correct length
    ts30 = trailing_timesteps(1000, 30)
    assert ts30[0] == 999 and len(ts30) == 30 and np.all(np.diff(ts30) < 0)
    with pytest.raises(ValueError, match="unknown timestep_spacing"):
        spaced_timesteps(1000, 10, "center")


def test_prev_from_matches_stride_on_leading_grids():
    for s in (7, 20, 50, 1000):
        ts = leading_timesteps(1000, s)
        np.testing.assert_allclose(SCHEDULE.alphas_cumprod_prev_from(ts),
                                   SCHEDULE.alphas_cumprod_prev(ts, s))


def gaussian_eps(params, x, t):
    """Exact epsilon for x0 ~ N(0, TAU^2) (see test_dpm_solver.py)."""
    ab = jnp.asarray(AB, jnp.float32)[t].reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.sqrt(1.0 - ab) * x / (ab * TAU ** 2 + 1.0 - ab)


TAU = 2.0


@pytest.mark.parametrize("scheduler", ["ddim", "dpm_solver"])
@pytest.mark.slow
def test_trailing_converges_and_removes_terminal_bias(scheduler):
    """On the analytic Gaussian flow the trailing-grid sampler converges
    to the true distribution as S grows — this validates the non-uniform
    prev tables end-to-end through the compiled scan. (A COMPARATIVE
    leading-vs-trailing claim cannot be isolated on this oracle: the two
    grids' discretization errors differ and dwarf the terminal-mismatch
    bias; the distribution-level comparison at production shape is the
    sampler ladder on a trained checkpoint — BENCHMARKS.md.)"""
    rng = np.random.default_rng(3)
    x_init = rng.standard_normal((2048, 1, 1, 1)).astype(np.float32)
    true_std = TAU * float(np.std(x_init))   # exact flow scales x by TAU

    def gen_std(spacing, steps):
        cfg = SamplerConfig(num_inference_steps=steps, scheduler=scheduler,
                            image_size=1, channels=1, clip_sample=False,
                            timestep_spacing=spacing)
        sampler = DiffusionSampler(gaussian_eps, SCHEDULE, cfg)
        out = sampler.sample({}, np.zeros(len(x_init), np.uint32),
                             initial_noise=jnp.asarray(x_init))
        return float(np.std(np.asarray(out["images"], np.float64)))

    # convergence of the trailing grid (validates the non-uniform prev
    # tables end-to-end through the compiled scan)
    errs = [abs(gen_std("trailing", s) - true_std) for s in (10, 50, 500)]
    assert errs[2] < errs[0]
    assert errs[2] / true_std < 0.01


def test_spacing_threads_through_generator_and_sidecar(tmp_path):
    """timestep_spacing reaches the executed grid via ModelManager/
    ImageGenerator, lands in the sidecar, and --reproduce honors it."""
    import jax

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.models.unet2d import (UNet2D, UNet2DConfig,
                                             init_unet_params)
    from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format

    tiny = UNet2DConfig(sample_size=16, layers_per_block=1,
                        block_out_channels=(8, 16, 16), attention_head_dim=4,
                        norm_num_groups=2,
                        down_block_types=("DownBlock2D", "AttnDownBlock2D",
                                          "DownBlock2D"),
                        up_block_types=("UpBlock2D", "AttnUpBlock2D",
                                        "UpBlock2D"))
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    params = init_unet_params(UNet2D(config=tiny), jax.random.PRNGKey(0),
                              image_size=16)
    save_checkpoint_torch_format(params, str(ckpt / "unet_NV_best.pth"))

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=tiny)
    gen.set_inference_steps(4)
    gen.scheduler_kind = "ddim"
    gen.timestep_spacing = "trailing"
    gen.set_generation_seed(5)
    r = gen.generate_images([("NV", 1)], str(tmp_path / "out"),
                            postprocess=False)
    assert r["generated"] == 1
    sampler = gen.model_manager.create_sampler(4, scheduler="ddim",
                                               timestep_spacing="trailing")
    assert int(sampler.timesteps[0]) == 999   # trailing grid was used

    import json
    sidecar = json.loads(
        (tmp_path / "out" / "NV" / "ISIC_0000001.json").read_text())
    assert sidecar["scheduler"]["timestep_spacing"] == "trailing"

    # reproduce honors the recorded spacing byte-for-byte
    from synt_isic_tpu.cli import reproduce_from_sidecar

    rc = reproduce_from_sidecar(str(tmp_path / "out" / "NV" / "ISIC_0000001.json"),
                                checkpoints_dir=str(ckpt), model_config=tiny,
                                postprocess=False,
                                output=str(tmp_path / "repro.png"))
    assert rc == 0
    orig = (tmp_path / "out" / "NV" / "ISIC_0000001.png").read_bytes()
    assert (tmp_path / "repro.png").read_bytes() == orig
