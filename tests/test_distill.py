"""Progressive-distillation tests.

Covers the three load-bearing claims of `train/distill.py`:
  1. the single-step target algebra is EXACT (one DDIM step with the
     implied epsilon reproduces the two-step endpoint bit-for-bit in f64);
  2. a distillation phase actually teaches the student the teacher's
     two-step map (endpoint error on a held-out probe drops vs the
     undistilled init);
  3. the progressive ladder writes torch-format checkpoints that load
     through the production ModelManager path and sample at the student's
     step count.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.diffusion.schedules import DiffusionSchedule
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params
from synt_isic_tpu.train.distill import (
    DistillConfig, distill_phase, implied_x0, phase_tables,
    progressive_distill)

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


class _ToyData:
    """Tiny deterministic dataset with the epoch_batches protocol."""

    def __init__(self, n=32, size=16, seed=0):
        rng = np.random.default_rng(seed)
        # smooth, structured images (not pure noise) in [-1, 1]
        base = rng.uniform(-0.8, 0.8, (n, 4, 4, 3)).astype(np.float32)
        self.images = np.stack([
            np.asarray(jax.image.resize(jnp.asarray(b), (size, size, 3),
                                        "linear"))
            for b in base])

    def __len__(self):
        return len(self.images)

    def epoch_batches(self, batch_size, rng):
        idx = rng.permutation(len(self.images))
        n_b = max(1, len(self.images) // batch_size)
        sel = idx[: n_b * batch_size].reshape(n_b, batch_size)
        return jnp.asarray(self.images[sel])

    def batches(self, batch_size, rng):
        for b in np.asarray(self.epoch_batches(batch_size, rng)):
            yield b


@pytest.mark.parametrize("spacing", ["leading", "trailing"])
@pytest.mark.parametrize("n_student", [2, 4, 10])
def test_target_algebra_exact(spacing, n_student):
    """One DDIM step with the implied x0 lands exactly on any endpoint —
    for EVERY step of the student grid, in float64."""
    schedule = DiffusionSchedule.create()
    tab = phase_tables(schedule, n_student, spacing)
    rng = np.random.default_rng(0)
    z_t = rng.normal(size=(n_student, 5)).astype(np.float64)
    z_end = rng.normal(size=(n_student, 5)).astype(np.float64)
    a_t = tab["a_t"][:, None]
    s_t = tab["s_t"][:, None]
    a_p = tab["a_p"][:, None]
    s_p = tab["s_p"][:, None]
    x0 = np.asarray(implied_x0(z_t, z_end, a_t, s_t, a_p, s_p,
                               denom=tab["denom"][:, None]))
    eps = (z_t - a_t * x0) / s_t
    reconstructed = a_p * x0 + s_p * eps
    np.testing.assert_allclose(reconstructed, z_end, atol=1e-9)


def test_phase_tables_shapes_and_monotonicity():
    schedule = DiffusionSchedule.create()
    for spacing in ("leading", "trailing"):
        tab = phase_tables(schedule, 8, spacing)
        ts = tab["ts"]
        assert np.all(np.diff(ts) < 0)                      # descending
        assert np.all(tab["t_mid"] <= ts)                   # mid between
        assert np.all(tab["denom"] > 0)                     # invertible
        # destination of the LAST step is the clean endpoint
        assert tab["a_p"][-1] == pytest.approx(1.0)
        assert tab["s_p"][-1] == pytest.approx(0.0)
    # trailing grids start at T-1 (the whole point of trailing spacing)
    assert phase_tables(schedule, 8, "trailing")["ts"][0] == 999


@pytest.mark.slow
def test_distill_phase_learns_two_step_map():
    """After one phase, the student's ONE-step map matches the teacher's
    TWO-step map much better than the undistilled init does."""
    model = UNet2D(config=TINY)
    schedule = DiffusionSchedule.create()
    data = _ToyData(n=32, size=16)
    # a lightly-trained teacher — a raw random init predicts garbage
    # epsilon, and the implied-x0 target amplifies that by ~1/denom at the
    # noisiest steps, which is not the regime distillation runs in
    from synt_isic_tpu.train.train_ddpm import (
        TrainConfig, create_train_state, make_train_step)

    tcfg = TrainConfig(image_size=16, batch_size=8, learning_rate=2e-3,
                       bf16_compute=False)
    tstate, ttx = create_train_state(model, tcfg)
    tstep = make_train_step(model, schedule, ttx, tcfg)
    trng = np.random.default_rng(3)
    for i in range(25):
        batch = np.asarray(data.epoch_batches(8, trng))[0]
        tstate, _ = tstep(tstate, jnp.asarray(batch), jax.random.PRNGKey(i))
    teacher = tstate.params
    cfg = DistillConfig(batch_size=8, steps_per_phase=60,
                        learning_rate=1e-3, warmup_steps=5,
                        ema_decay=0.0, bf16_compute=False, seed=0,
                        clip_teacher_x0=True)
    n_student = 4
    result = distill_phase(model, schedule, teacher, data, n_student, cfg,
                           log=lambda *a: None)
    student = result["params"]
    assert np.isfinite(result["history"]).all()

    # held-out probe: the phase's OWN objective (make_distill_loss) on
    # fresh images/keys — the undistilled teacher-as-student is the
    # baseline the phase must beat
    from synt_isic_tpu.train.distill import make_distill_loss

    loss_fn = jax.jit(make_distill_loss(model, schedule, cfg, n_student))
    probe = jnp.asarray(_ToyData(n=16, size=16, seed=99).images)
    keys = [jax.random.PRNGKey(1000 + i) for i in range(4)]
    err_init = float(np.mean([loss_fn(teacher, teacher, probe, k)
                              for k in keys]))
    err_distilled = float(np.mean([loss_fn(student, teacher, probe, k)
                                   for k in keys]))
    assert err_distilled < 0.6 * err_init, (err_init, err_distilled)


@pytest.mark.slow
def test_progressive_ladder_checkpoints_load_and_sample(tmp_path):
    """The halving ladder writes torch-format checkpoints consumable by the
    production load path, and the final student samples at its own step
    count through the existing sampler."""
    model = UNet2D(config=TINY)
    teacher = init_unet_params(model, jax.random.PRNGKey(1), image_size=16)
    data = _ToyData(n=16, size=16)
    cfg = DistillConfig(batch_size=8, steps_per_phase=4, learning_rate=1e-4,
                        ema_decay=0.999, bf16_compute=False, seed=1)
    out = progressive_distill(teacher, data, "NV", str(tmp_path),
                              start_steps=8, end_steps=2, config=cfg,
                              model=model, image_size=16,
                              log=lambda *a: None)
    ns = [p["n_student"] for p in out["phases"]]
    assert ns == [4, 2]
    # load the final student through the production .pth reader
    from synt_isic_tpu.io.convert import torch_to_flax
    from synt_isic_tpu.io.pth import load_pth

    path = out["phases"][-1]["checkpoint"]
    flax_params = torch_to_flax(load_pth(path))
    # and sample with it at the student's step count
    from synt_isic_tpu.diffusion import DiffusionSampler, SamplerConfig

    sampler = DiffusionSampler(
        lambda p, x, t: model.apply({"params": p}, x, t),
        DiffusionSchedule.create(),
        SamplerConfig(num_inference_steps=2, scheduler="ddim",
                      timestep_spacing=out["timestep_spacing"],
                      image_size=16))
    imgs = sampler.sample(flax_params, np.asarray([0, 1], np.uint32))["images"]
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()


@pytest.mark.slow
def test_distill_phase_mesh_layout_independent():
    """dp-sharded distillation (batch over the mesh 'data' axis, params
    replicated) produces the same loss sequence as the single-device run —
    the sharding is a layout choice, never a result change."""
    from synt_isic_tpu.parallel.mesh import create_mesh

    class _StepOnly:
        """batches()-only view so both runs take the per-step path (the
        scan path draws its per-step keys differently by design)."""

        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return len(self._inner)

        def batches(self, batch_size, rng):
            return self._inner.batches(batch_size, rng)

    model = UNet2D(config=TINY)
    schedule = DiffusionSchedule.create()
    teacher = init_unet_params(model, jax.random.PRNGKey(2), image_size=16)
    data = _StepOnly(_ToyData(n=16, size=16))
    cfg = DistillConfig(batch_size=8, steps_per_phase=3, learning_rate=1e-4,
                        ema_decay=0.0, bf16_compute=False, seed=0,
                        clip_teacher_x0=True)

    ref = distill_phase(model, schedule, teacher, data, 4, cfg,
                        log=lambda *a: None)
    mesh = create_mesh({"data": 4})
    shd = distill_phase(model, schedule, teacher, data, 4, cfg, mesh=mesh,
                        log=lambda *a: None)
    np.testing.assert_allclose(ref["history"], shd["history"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref["params"]),
                    jax.tree_util.tree_leaves(shd["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_distill_eval_every_selects_best_export():
    """With eval_every on, the phase scores the export params on a FIXED
    probe and exports the best-scoring snapshot; the recorded best_val is
    reproducible from the exported params (deterministic probe)."""
    from synt_isic_tpu.train.distill import make_distill_loss

    model = UNet2D(config=TINY)
    schedule = DiffusionSchedule.create()
    teacher = init_unet_params(model, jax.random.PRNGKey(4), image_size=16)
    data = _ToyData(n=16, size=16)
    cfg = DistillConfig(batch_size=8, steps_per_phase=6, learning_rate=1e-3,
                        ema_decay=0.0, bf16_compute=False, seed=2,
                        clip_teacher_x0=True,
                        eval_every=2, eval_probe_images=8, eval_keys=2)
    result = distill_phase(model, schedule, teacher, data, 4, cfg,
                           log=lambda *a: None)
    assert result["val_history"], "eval_every produced no validations"
    assert result["best_val"] == pytest.approx(min(result["val_history"]))
    # the exported params reproduce best_val on the same fixed probe
    probe_rng = np.random.default_rng(cfg.seed + 4 + 1)
    probe = np.concatenate([np.asarray(b)
                            for b in data.batches(8, probe_rng)])[:8]
    loss_fn = jax.jit(make_distill_loss(model, schedule, cfg, 4))
    keys = [jax.random.PRNGKey(cfg.seed + 0xD15 + i) for i in range(2)]
    val = float(np.mean([loss_fn(result["params"], teacher,
                                 jnp.asarray(probe), k) for k in keys]))
    assert val == pytest.approx(result["best_val"], rel=1e-5)


def test_train_cli_distill_uses_tuned_defaults(tmp_path, monkeypatch):
    """`--distill-from` without explicit --batch/--lr must use the
    distiller's tuned defaults (batch 32, lr 5e-5), NOT the DDPM-training
    CLI defaults (batch 2, lr 1e-4) — which silently train far off the
    validated regime. Explicit flags still override."""
    torch = pytest.importorskip("torch")

    import synt_isic_tpu.train.distill as distill_mod
    from synt_isic_tpu.train.__main__ import main

    from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

    teacher_pth = tmp_path / "unet_MEL_best.pth"
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**tiny_config()).state_dict(), teacher_pth)

    captured = {}

    def fake_progressive_distill(*args, **kwargs):
        captured["config"] = kwargs["config"]
        return {"class": "MEL", "phases": [],
                "timestep_spacing": kwargs["config"].timestep_spacing}

    monkeypatch.setattr(distill_mod, "progressive_distill",
                        fake_progressive_distill)
    base = ["--classes", "MEL", "--distill-from", str(teacher_pth),
            "--procedural", "64", "--checkpoints", str(tmp_path),
            "--distill-start", "8", "--distill-end", "4",
            "--distill-steps-per-phase", "1", "--image-size", "16"]
    assert main(base) == 0
    cfg = captured["config"]
    assert cfg.batch_size == DistillConfig.batch_size == 32
    assert cfg.learning_rate == DistillConfig.learning_rate == 5e-5

    assert main(base + ["--batch", "4", "--lr", "1e-3"]) == 0
    cfg = captured["config"]
    assert cfg.batch_size == 4
    assert cfg.learning_rate == pytest.approx(1e-3)

    # a dataset smaller than the tuned default batch clamps instead of
    # tripping distill_phase's undersized-dataset guard...
    small = [a if a != "64" else "8" for a in base]
    assert main(small) == 0
    assert captured["config"].batch_size == 8
    # ...but an EXPLICIT oversized --batch still errors loudly downstream
    # (no silent clamp of a user-chosen value)
    assert main(small + ["--batch", "16"]) == 0  # fake distill never runs the guard
    assert captured["config"].batch_size == 16
