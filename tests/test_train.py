"""Training-loop tests: loss decreases on a fixed target; checkpoints are
torch-readable (the reference app must be able to load our outputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.diffusion.schedules import DiffusionSchedule
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig
from synt_isic_tpu.train.train_ddpm import (
    TrainConfig, create_train_state, make_train_step, save_checkpoint_torch_format)
from synt_isic_tpu.train.data import enhance_color, augment_image

TINY = UNet2DConfig(sample_size=16, layers_per_block=1,
                    block_out_channels=(8, 16, 16), attention_head_dim=4,
                    norm_num_groups=2,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))


def test_train_step_decreases_loss():
    model = UNet2D(config=TINY)
    cfg = TrainConfig(image_size=16, batch_size=4, learning_rate=2e-3,
                      bf16_compute=False)
    state, tx = create_train_state(model, cfg)
    step = make_train_step(model, DiffusionSchedule.create(), tx, cfg)
    batch = jnp.asarray(np.random.default_rng(0)
                        .uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, loss = step(state, batch, jax.random.fold_in(key, i % 3))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 30


@pytest.mark.slow
def test_offset_noise_is_wired_and_trains():
    """offset_noise > 0 changes the training noise (per-image-per-channel
    constant component) and still trains to finite decreasing loss."""
    model = UNet2D(config=TINY)
    batch = jnp.asarray(np.random.default_rng(1)
                        .uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    losses = {}
    for off in (0.0, 0.3):
        cfg = TrainConfig(image_size=16, batch_size=4, learning_rate=2e-3,
                          bf16_compute=False, offset_noise=off)
        state, tx = create_train_state(model, cfg)
        step = make_train_step(model, DiffusionSchedule.create(), tx, cfg)
        seq = []
        for i in range(10):
            state, loss = step(state, batch, jax.random.fold_in(key, i % 3))
            seq.append(float(loss))
        losses[off] = seq
        assert np.all(np.isfinite(seq))
        assert seq[-1] < seq[0]
    # same keys, different noise target => different loss sequence
    assert losses[0.0][0] != losses[0.3][0]


def test_checkpoint_roundtrip_torch(tmp_path):
    torch = pytest.importorskip("torch")
    from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

    tc = tiny_config()
    model = UNet2D(config=UNet2DConfig(
        sample_size=tc["sample_size"], layers_per_block=tc["layers_per_block"],
        block_out_channels=tc["block_out_channels"],
        down_block_types=tc["down_block_types"],
        up_block_types=tc["up_block_types"],
        attention_head_dim=tc["attention_head_dim"],
        norm_num_groups=tc["norm_num_groups"]))
    cfg = TrainConfig(image_size=16, bf16_compute=False)
    state, _ = create_train_state(model, cfg)
    path = str(tmp_path / "unet_TEST_best.pth")
    save_checkpoint_torch_format(state.params, path)

    # torch must load it into the oracle module without missing keys
    tmodel = UNet2DTorch(**tiny_config())
    loaded = torch.load(path, map_location="cpu", weights_only=True)
    missing, unexpected = tmodel.load_state_dict(loaded, strict=False)
    assert not missing, f"missing keys: {missing[:5]}"
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"


def test_enhance_color_ranges():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    for cid in range(7):
        out = enhance_color(img, cid)
        assert out.min() >= 0 and out.max() <= 1
        assert out.shape == img.shape
    # uint8 input accepted too
    out = enhance_color((img * 255).astype(np.uint8), 0)
    assert out.max() <= 1.0


def test_augment_image_output_contract():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    out = augment_image(img, rng, out_size=64)
    assert out.shape == (64, 64, 3)
    assert out.min() >= -1 - 1e-6 and out.max() <= 1 + 1e-6


def test_ema_update_warmup_and_tracking():
    """Warmup: d_t = min(decay, (1+t)/(10+t)); the average must trail the
    raw params and converge toward them when params stop moving."""
    from synt_isic_tpu.train.train_ddpm import ema_update

    ema = {"w": jnp.asarray(0.0)}
    p = {"w": jnp.asarray(1.0)}
    # step 0: d = min(0.999, 1/10) = 0.1 -> ema = 0.1*0 + 0.9*1 = 0.9
    got = ema_update(ema, p, jnp.asarray(0), 0.999)
    np.testing.assert_allclose(float(got["w"]), 0.9, rtol=1e-6)
    # large step: d = 0.999 -> slow tracking
    got2 = ema_update(ema, p, jnp.asarray(100000), 0.999)
    np.testing.assert_allclose(float(got2["w"]), 0.001, rtol=1e-4)


def test_train_step_with_ema_exports_ema_weights(tmp_path):
    model = UNet2D(config=TINY)
    cfg = TrainConfig(image_size=16, batch_size=2, learning_rate=2e-3,
                      bf16_compute=False, ema_decay=0.99)
    state, tx = create_train_state(model, cfg)
    assert state.ema_params is not None
    step = make_train_step(model, DiffusionSchedule.create(), tx, cfg)
    batch = jnp.asarray(np.random.default_rng(1)
                        .uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, _ = step(state, batch, jax.random.fold_in(key, i))
    # ema must differ from the raw params but stay in their neighborhood
    raw = jax.tree_util.tree_leaves(state.params)
    ema = jax.tree_util.tree_leaves(state.ema_params)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(raw, ema)]
    assert max(diffs) > 0
    assert max(diffs) < 0.1
    # ema_decay=0 keeps the reference behavior: no ema tree at all
    state0, _ = create_train_state(model, TrainConfig(image_size=16))
    assert state0.ema_params is None


class _FixedDataset:
    """Deterministic toy dataset yielding one fixed batch per epoch."""

    def __init__(self, n, size):
        self.data = (np.random.default_rng(7)
                     .uniform(-1, 1, (n, size, size, 3)).astype(np.float32))

    def __len__(self):
        return len(self.data)

    def batches(self, batch_size, rng):
        for i in range(0, len(self.data), batch_size):
            yield self.data[i:i + batch_size]


@pytest.mark.slow
def test_train_class_mesh_matches_single_device(tmp_path):
    """Data-parallel training over the 8-device virtual mesh must produce
    the same losses and checkpoint as the single-device loop (dp changes
    layout, never values)."""
    from synt_isic_tpu.parallel.multihost import hybrid_mesh
    from synt_isic_tpu.train.train_ddpm import train_class

    model = UNet2D(config=TINY)
    cfg = TrainConfig(image_size=16, batch_size=8, learning_rate=1e-3,
                      epochs=2, bf16_compute=False, snapshot_every=100)
    ds = _FixedDataset(8, 16)
    r_single = train_class("NV", ds, str(tmp_path / "single"), cfg,
                           model=model, log=lambda *a: None)
    r_mesh = train_class("NV", ds, str(tmp_path / "mesh"), cfg,
                         model=model, mesh=hybrid_mesh(),
                         log=lambda *a: None)
    np.testing.assert_allclose(r_mesh["history"], r_single["history"],
                               rtol=2e-4, atol=2e-5)
    assert (tmp_path / "mesh" / "unet_NV_best.pth").exists()


def test_train_class_mesh_rejects_nondividing_batch(tmp_path):
    from synt_isic_tpu.parallel.multihost import hybrid_mesh
    from synt_isic_tpu.train.train_ddpm import train_class

    mesh = hybrid_mesh()
    if mesh.shape["data"] < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = TrainConfig(image_size=16, batch_size=3, epochs=1,
                      bf16_compute=False)
    with pytest.raises(ValueError, match="multiple"):
        train_class("NV", _FixedDataset(3, 16), str(tmp_path), cfg,
                    model=UNet2D(config=TINY), mesh=mesh,
                    log=lambda *a: None)


@pytest.mark.slow
def test_lr_schedule_cosine_and_min_snr_train():
    """cosine schedule: warmup from 0, decay to end_factor*peak; min-SNR
    weighting downweights low-noise timesteps (weight<=1) and still trains."""
    from synt_isic_tpu.train.train_ddpm import make_lr_schedule

    cfg = TrainConfig(image_size=16, learning_rate=1e-3, lr_schedule="cosine",
                      warmup_steps=10, lr_end_factor=0.1)
    sched = make_lr_schedule(cfg, total_steps=100)
    assert float(sched(0)) == 0.0                       # warmup start
    assert abs(float(sched(10)) - 1e-3) < 1e-9          # peak after warmup
    assert abs(float(sched(100)) - 1e-4) < 1e-9         # end value
    with pytest.raises(ValueError, match="total_steps"):
        make_lr_schedule(cfg, total_steps=None)

    model = UNet2D(config=TINY)
    batch = jnp.asarray(np.random.default_rng(2)
                        .uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    first = {}
    for gamma in (0.0, 5.0):
        cfg = TrainConfig(image_size=16, batch_size=4, learning_rate=2e-3,
                          bf16_compute=False, min_snr_gamma=gamma)
        state, tx = create_train_state(model, cfg)
        step = make_train_step(model, DiffusionSchedule.create(), tx, cfg)
        seq = []
        for i in range(8):
            state, loss = step(state, batch, jax.random.fold_in(key, i))
            seq.append(float(loss))
        assert np.all(np.isfinite(seq)) and seq[-1] < seq[0]
        first[gamma] = seq[0]
    # same init/keys: min-SNR weights are <=1 with equality only where
    # SNR<=gamma, so the weighted first-step loss must be strictly smaller
    assert first[5.0] < first[0.0]


@pytest.mark.slow
def test_eval_based_best_selection(tmp_path):
    """eval_every>0: best selection uses the deterministic probe loss; the
    eval value is reproducible call-to-call (zero sampling variance)."""
    from synt_isic_tpu.diffusion.schedules import DiffusionSchedule as DS
    from synt_isic_tpu.train.train_ddpm import make_eval_fn, train_class

    model = UNet2D(config=TINY)
    cfg = TrainConfig(image_size=16, batch_size=4, learning_rate=2e-3,
                      epochs=3, bf16_compute=False, snapshot_every=100,
                      eval_every=1, eval_probe_images=4, eval_t_points=4)
    ds = _FixedDataset(8, 16)
    result = train_class("NV", ds, str(tmp_path), cfg, model=model,
                         log=lambda *a: None)
    assert np.isfinite(result["best_val"])
    assert (tmp_path / "unet_NV_best.pth").exists()

    # determinism of the probe itself
    state, _ = create_train_state(model, cfg)
    ev = make_eval_fn(model, DS.create(), cfg,
                      jnp.asarray(ds.data[:4]))
    assert float(ev(state.params)) == float(ev(state.params))


def test_measure_train_step_harness_smoke():
    """The ONE timing harness shared by bench.py's train rung and
    scripts/profile_remat.py (train/benchmark.py): runs the real jitted
    step, returns finite raw metrics, and labels remat modes."""
    from synt_isic_tpu.train.benchmark import measure_train_step

    row = measure_train_step(False, batch=2, steps=1, size=16)
    assert row["remat"] == "none" and row["batch"] == 2
    assert row["sec_per_step"] > 0 and np.isfinite(row["loss"])
    assert row["img_per_s"] == pytest.approx(2 / row["sec_per_step"])
    row2 = measure_train_step("dots", batch=2, steps=1, size=16)
    assert row2["remat"] == "dots"
    assert np.isfinite(row2["loss"])
