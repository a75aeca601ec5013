"""Class-conditional UNet family + classifier-free guidance.

Beyond-reference capability (the reference trains seven separate per-class
UNets, `diffusion/train_diffusion.py:201-266`, and swaps 101 MB checkpoints
per class, `core/generator/model_manager.py:89-171`): ONE conditional model
(diffusers `num_class_embeds` semantics) serves every class, with CFG as a
sampling-time quality knob. Covers: the model's conditioning contract,
torch-format conversion/manifest of the embedding table, the sampler's
conditional + CFG paths (exact combination math), ModelManager's
conditional mode (shared-pytree aliasing), the generator + sidecar +
--reproduce contract, mesh layout-independence, and the trainer."""
import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synt_isic_tpu.diffusion import DiffusionSampler, DiffusionSchedule, SamplerConfig
from synt_isic_tpu.io.convert import flax_to_torch, torch_to_flax
from synt_isic_tpu.io.manifest import expected_unet2d_state_shapes, validate_state_dict
from synt_isic_tpu.io.pth import save_pth
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

CLASSES = ["MEL", "NV", "VASC"]
# tiny conditional architecture: 3 classes + 1 null row
COND = UNet2DConfig(sample_size=16, block_out_channels=(8, 8),
                    layers_per_block=1,
                    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                    norm_num_groups=4, attention_head_dim=4,
                    num_class_embeds=len(CLASSES) + 1)
BASE = dataclasses.replace(COND, num_class_embeds=None)  # what callers pass


@pytest.fixture(scope="module")
def cond_params():
    model = UNet2D(config=COND)
    return model, init_unet_params(model, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory, cond_params):
    """Fabricated conditional checkpoint + its metadata JSON."""
    _, params = cond_params
    d = tmp_path_factory.mktemp("cond_ckpt")
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    save_pth(flax_to_torch(host), str(d / "unet_conditional_best.pth"))
    (d / "unet_conditional_best.json").write_text(json.dumps({
        "classes": CLASSES, "num_class_embeds": len(CLASSES) + 1,
        "null_label": len(CLASSES)}))
    return d


# -- model contract ---------------------------------------------------------------

def test_label_sensitivity_and_determinism(cond_params):
    model, params = cond_params
    x = jnp.ones((2, 16, 16, 3)) * 0.1
    t = jnp.array([5, 7])
    a = model.apply({"params": params}, x, t, jnp.array([0, 2]))
    b = model.apply({"params": params}, x, t, jnp.array([1, 2]))
    assert a.shape == (2, 16, 16, 3)
    # different label -> different output; same label -> identical
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_labels_required_iff_conditional(cond_params):
    model, params = cond_params
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="requires class_labels"):
        model.apply({"params": params}, x, t)
    uncond = UNet2D(config=BASE)
    up = init_unet_params(uncond, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unconditional"):
        uncond.apply({"params": up}, x, t, jnp.zeros((1,), jnp.int32))


# -- conversion / manifest ----------------------------------------------------------

def test_embedding_roundtrip_and_manifest(cond_params):
    _, params = cond_params
    host = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)
    state = flax_to_torch(host)
    # the table is stored UNTRANSPOSED under the diffusers key
    assert state["class_embedding.weight"].shape == (4, 32)
    np.testing.assert_array_equal(state["class_embedding.weight"],
                                  np.asarray(params["class_embedding"]["embedding"]))
    manifest = expected_unet2d_state_shapes(**dataclasses.asdict(COND))
    assert validate_state_dict(state, manifest) == []
    # an unconditional manifest must REJECT the conditional checkpoint
    uncond_manifest = expected_unet2d_state_shapes(**dataclasses.asdict(BASE))
    problems = validate_state_dict(state, uncond_manifest)
    assert any("class_embedding" in p for p in problems)
    back = torch_to_flax(state)
    for a, b in zip(jax.tree_util.tree_leaves(host),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- sampler: conditional + CFG math ----------------------------------------------

def _toy_cond_apply(params, x, t, y):
    # label-dependent epsilon: enough structure to distinguish branches
    scale = (1.0 + y.astype(jnp.float32))[:, None, None, None]
    return 0.05 * scale * x + 0.01 * params


def test_sampler_requires_labels():
    sched = DiffusionSchedule.create(100)
    s = DiffusionSampler(_toy_cond_apply, sched,
                         SamplerConfig(num_inference_steps=3, scheduler="ddim",
                                       image_size=8),
                         conditional=True, null_label=3)
    with pytest.raises(ValueError, match="requires class_labels"):
        s.sample(jnp.float32(0.0), [1, 2])
    uncond = DiffusionSampler(lambda p, x, t: 0.05 * x, sched,
                              SamplerConfig(num_inference_steps=3,
                                            scheduler="ddim", image_size=8))
    with pytest.raises(ValueError, match="unconditional"):
        uncond.sample(jnp.float32(0.0), [1], class_labels=0)


def test_cfg_combination_math():
    """guided eps must equal eps_u + s*(eps_c - eps_u) exactly: compare the
    CFG sampler against an unconditional sampler whose apply_fn computes
    that combination in closed form."""
    sched = DiffusionSchedule.create(100)
    g = 3.0
    label, null = 1, 3
    cfg_kwargs = dict(num_inference_steps=4, scheduler="ddim", image_size=8)
    guided = DiffusionSampler(
        _toy_cond_apply, sched,
        SamplerConfig(guidance_scale=g, **cfg_kwargs),
        conditional=True, null_label=null)

    def combined_apply(params, x, t):
        b = x.shape[0]
        eps_c = _toy_cond_apply(params, x, t, jnp.full((b,), label))
        eps_u = _toy_cond_apply(params, x, t, jnp.full((b,), null))
        return eps_u + g * (eps_c - eps_u)

    manual = DiffusionSampler(combined_apply, sched, SamplerConfig(**cfg_kwargs))
    seeds = np.asarray([7, 11], np.uint32)
    a = guided.sample(jnp.float32(0.0), seeds, class_labels=label)
    b = manual.sample(jnp.float32(0.0), seeds)
    np.testing.assert_allclose(np.asarray(a["images"]), np.asarray(b["images"]),
                               atol=1e-5)
    assert a["noise_hashes"] == b["noise_hashes"]


def test_guidance_one_is_plain_conditional():
    """guidance_scale in {0, 1} = single conditional forward; both must
    equal each other bit-for-bit (same compiled math)."""
    sched = DiffusionSchedule.create(100)
    outs = []
    for g in (0.0, 1.0):
        s = DiffusionSampler(
            _toy_cond_apply, sched,
            SamplerConfig(num_inference_steps=3, scheduler="ddim",
                          image_size=8, guidance_scale=g),
            conditional=True, null_label=3)
        outs.append(np.asarray(
            s.sample(jnp.float32(0.0), [5], class_labels=2)["images"]))
    np.testing.assert_array_equal(outs[0], outs[1])


# -- ModelManager conditional mode --------------------------------------------------

def test_model_manager_conditional(ckpt_dir):
    from synt_isic_tpu.model_manager import ModelManager

    mm = ModelManager(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                      conditional=True)
    assert mm.get_available_classes() == CLASSES
    assert mm.model.config.num_class_embeds == 4
    assert mm.null_label == 3
    assert mm.class_id("NV") == 1
    assert mm.load_model("MEL")
    assert mm.load_model("NV")
    # the second class ALIASES the first load's pytree (no duplicate HBM)
    assert mm.loaded_params["NV"] is mm.loaded_params["MEL"]
    assert not mm.load_model("XXX")  # unknown class fails loudly

    sampler = mm.create_sampler(3, scheduler="ddim")
    assert sampler.conditional
    out_mel = sampler.sample(mm.loaded_params["MEL"], [42],
                             class_labels=mm.class_id("MEL"))
    out_nv = sampler.sample(mm.loaded_params["NV"], [42],
                            class_labels=mm.class_id("NV"))
    # same seed, different class -> different image, same initial noise
    assert out_mel["noise_hashes"] == out_nv["noise_hashes"]
    assert not np.allclose(np.asarray(out_mel["images"]),
                           np.asarray(out_nv["images"]))


def test_model_manager_conditional_requires_metadata(tmp_path):
    from synt_isic_tpu.model_manager import ModelManager

    with pytest.raises(FileNotFoundError, match="metadata"):
        ModelManager(checkpoints_dir=str(tmp_path), model_config=BASE,
                     conditional=True)


# -- generator + sidecar + reproduce ------------------------------------------------

@pytest.fixture(scope="module")
def cond_generator(ckpt_dir):
    from synt_isic_tpu.generator import ImageGenerator

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                         conditional=True, guidance_scale=2.0)
    gen.set_inference_steps(3)
    gen.set_save_trajectory(False)
    return gen


def test_generator_conditional_end_to_end(cond_generator, tmp_path):
    gen = cond_generator
    assert gen.get_available_classes() == CLASSES
    gen.set_generation_seed(99)
    res = gen.generate_images([("MEL", 2), ("NV", 1)], str(tmp_path))
    assert res["generated"] == 3
    sidecar = json.loads((tmp_path / "MEL" / "ISIC_0000001.json").read_text())
    sched = sidecar["scheduler"]
    assert sched["conditional"] is True
    assert sched["guidance_scale"] == 2.0
    # different classes from the same run produce different images
    a = (tmp_path / "MEL" / "ISIC_0000001.png").read_bytes()
    b = (tmp_path / "NV" / "ISIC_0000001.png").read_bytes()
    assert a != b


def test_mixed_class_block_matches_per_class_runs(ckpt_dir, tmp_path):
    """Conditional batch driver: one device block spanning classes (the
    whole point of the single checkpoint) writes byte-identical artifacts
    to separate per-class runs — per-seed RNG streams + per-image labels
    make batch composition invisible to every image."""
    from synt_isic_tpu.generator import ImageGenerator

    def make_gen(batch):
        g = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                           conditional=True)
        g.set_inference_steps(3)
        g.set_save_trajectory(False)
        g.set_generation_seed(77)
        g.batch_size = batch
        return g

    # batch 8 >= total 5: the whole request is ONE mixed-class block
    res = make_gen(8).generate_images(
        [("MEL", 2), ("NV", 2), ("VASC", 1)], str(tmp_path / "mixed"))
    assert res["generated"] == 5
    # same request, batch 1: five single-class blocks (and separate runs
    # per class would batch identically)
    res1 = make_gen(1).generate_images(
        [("MEL", 2), ("NV", 2), ("VASC", 1)], str(tmp_path / "solo"))
    assert res1["generated"] == 5
    for cls, count in [("MEL", 2), ("NV", 2), ("VASC", 1)]:
        for i in range(1, count + 1):
            name = f"ISIC_{i:07d}.png"
            a = (tmp_path / "mixed" / cls / name).read_bytes()
            b = (tmp_path / "solo" / cls / name).read_bytes()
            assert a == b, f"{cls}/{name} differs between block layouts"


def test_reproduce_conditional_mixed_block(ckpt_dir, tmp_path):
    """A sidecar from a MIXED-class conditional device block records the
    full block layout (seeds + index + classes) and reproduces by
    rebuilding that exact block — the layout is what guarantees byte
    identity under XLA's batch-shape-dependent float tiling."""
    from synt_isic_tpu.cli import reproduce_from_sidecar
    from synt_isic_tpu.generator import ImageGenerator

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                         conditional=True)
    gen.set_inference_steps(3)
    gen.set_save_trajectory(False)
    gen.set_generation_seed(31)
    gen.batch_size = 8
    res = gen.generate_images([("MEL", 2), ("NV", 2), ("VASC", 1)],
                              str(tmp_path / "run"))
    assert res["generated"] == 5

    # NV's first image sits mid-block (index 2 of the spanning block)
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000001.json"
    meta = json.loads(sidecar.read_text())
    assert meta["block"]["classes"] == ["MEL", "MEL", "NV", "NV", "VASC"]
    assert meta["block"]["index"] == 2
    assert len(meta["block"]["seeds"]) == 5

    rc = reproduce_from_sidecar(str(sidecar), str(ckpt_dir),
                                output=str(tmp_path / "redo.png"),
                                model_config=BASE)
    assert rc == 0
    assert ((tmp_path / "redo.png").read_bytes()
            == (tmp_path / "run" / "NV" / "ISIC_0000001.png").read_bytes())


def test_reproduce_conditional_sidecar(cond_generator, ckpt_dir, tmp_path):
    from synt_isic_tpu.cli import reproduce_from_sidecar

    gen = cond_generator
    out = tmp_path / "orig.png"
    ok, _ = gen.generate_single_image("VASC", str(out), seed=1234)
    assert ok
    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpt_dir),
                                output=str(tmp_path / "redo.png"),
                                model_config=BASE)
    assert rc == 0
    assert (tmp_path / "redo.png").read_bytes() == out.read_bytes()


# -- mesh layout-independence --------------------------------------------------------

def test_sharded_conditional_matches_single_device(ckpt_dir):
    from synt_isic_tpu.model_manager import ModelManager
    from synt_isic_tpu.parallel.mesh import create_mesh
    from synt_isic_tpu.parallel.sharded_sampler import ShardedSampler

    mm = ModelManager(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                      conditional=True)
    assert mm.load_model("MEL")
    sampler = mm.create_sampler(3, scheduler="ddim", guidance_scale=2.0)
    params = mm.loaded_params["MEL"]
    seeds = np.arange(5, dtype=np.uint32)  # non-multiple of 8: pads
    single = sampler.sample(params, seeds, class_labels=0)
    mesh = create_mesh({"data": -1})
    sharded = ShardedSampler(sampler, mesh).sample(params, seeds,
                                                   class_labels=0)
    np.testing.assert_allclose(np.asarray(single["images"]),
                               np.asarray(sharded["images"]), atol=2e-2)
    assert single["noise_hashes"] == sharded["noise_hashes"]


# -- trainer --------------------------------------------------------------------------

def test_labeled_mixture_materialized_and_lazy():
    from synt_isic_tpu.train.procedural import ProceduralDataset
    from synt_isic_tpu.train.train_conditional import LabeledMixtureDataset

    ds = {c: ProceduralDataset(c, n_images=4, image_size=16) for c in CLASSES}
    mix = LabeledMixtureDataset(ds, image_size=16)
    assert len(mix) == 12 and hasattr(mix, "epoch_batches")
    imgs, labels = next(mix.batches(6, np.random.default_rng(0)))
    assert imgs.shape == (6, 16, 16, 3) and labels.shape == (6,)
    eb_imgs, eb_labels = mix.epoch_batches(4, np.random.default_rng(1))
    assert eb_imgs.shape == (3, 4, 16, 16, 3) and eb_labels.shape == (3, 4)
    # labels index class_names in insertion order
    assert set(np.asarray(eb_labels).ravel()) <= {0, 1, 2}

    class Lazy:
        def __len__(self):
            return 3

        def load_raw(self, i):
            return np.full((16, 16, 3), 0.5, np.float32)

    lazy_mix = LabeledMixtureDataset({"A": Lazy(), "B": Lazy()}, image_size=16)
    assert len(lazy_mix) == 6 and not hasattr(lazy_mix, "epoch_batches")
    imgs, labels = next(lazy_mix.batches(4, np.random.default_rng(0)))
    assert imgs.shape == (4, 16, 16, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0


def test_labeled_mixture_pools_device_copies():
    """Device-resident inputs must pool on DEVICE (epoch gathers upload
    indices only — a host pool would re-upload ~full-epoch bytes every
    epoch through a tunneled link), with identical values/order."""
    import jax

    from synt_isic_tpu.train.procedural import ProceduralDataset
    from synt_isic_tpu.train.train_conditional import LabeledMixtureDataset

    ds_host = {c: ProceduralDataset(c, n_images=4, image_size=16)
               for c in CLASSES}
    ds_dev = {c: ProceduralDataset(c, n_images=4, image_size=16, device=True)
              for c in CLASSES}
    mix_host = LabeledMixtureDataset(ds_host, image_size=16)
    mix_dev = LabeledMixtureDataset(ds_dev, image_size=16)
    assert mix_host._device_images is None
    assert isinstance(mix_dev._device_images, jax.Array)

    h_imgs, h_labels = mix_host.epoch_batches(4, np.random.default_rng(3))
    d_imgs, d_labels = mix_dev.epoch_batches(4, np.random.default_rng(3))
    assert isinstance(d_imgs, jax.Array)  # gathered on device
    np.testing.assert_array_equal(np.asarray(d_imgs), np.asarray(h_imgs))
    np.testing.assert_array_equal(np.asarray(d_labels), np.asarray(h_labels))

    hb = next(mix_host.batches(6, np.random.default_rng(4)))
    db = next(mix_dev.batches(6, np.random.default_rng(4)))
    np.testing.assert_array_equal(np.asarray(db[0]), np.asarray(hb[0]))
    np.testing.assert_array_equal(np.asarray(db[1]), np.asarray(hb[1]))


def test_train_conditional_end_to_end(tmp_path):
    """Mixed-class training -> torch-format conditional checkpoint +
    metadata -> loads through ModelManager(conditional=True)."""
    from synt_isic_tpu.model_manager import ModelManager
    from synt_isic_tpu.train.procedural import ProceduralDataset
    from synt_isic_tpu.train.train_conditional import train_conditional
    from synt_isic_tpu.train.train_ddpm import TrainConfig

    datasets = {c: ProceduralDataset(c, n_images=8, image_size=16)
                for c in CLASSES}
    cfg = TrainConfig(image_size=16, batch_size=6, epochs=3, snapshot_every=3,
                      bf16_compute=False, cond_dropout=0.5, seed=0)
    model = UNet2D(config=COND)
    result = train_conditional(datasets, str(tmp_path), cfg, model=model,
                               log=lambda *a, **k: None)
    assert result["classes"] == CLASSES
    assert result["steps"] == 3 * (24 // 6)
    assert np.isfinite(result["best_loss"])
    assert (tmp_path / "unet_conditional_best.pth").exists()
    meta = json.loads((tmp_path / "unet_conditional_best.json").read_text())
    assert meta["num_class_embeds"] == 4 and meta["null_label"] == 3
    # per-class color statistics written for the postprocessing stage
    stats = json.loads((tmp_path / "color_statistics.json").read_text())
    assert set(CLASSES) <= set(stats)

    mm = ModelManager(checkpoints_dir=str(tmp_path), model_config=BASE,
                      conditional=True)
    assert mm.load_model("VASC") and mm.validate_model("VASC")
    out = mm.create_sampler(2, scheduler="ddim").sample(
        mm.loaded_params["VASC"], [3], class_labels=mm.class_id("VASC"))
    assert np.isfinite(np.asarray(out["images"])).all()


def test_mixed_block_unknown_class_does_not_poison_blockmates(ckpt_dir,
                                                              tmp_path):
    """A conditional mixed-class device block containing an unknown class
    must drop ONLY that class and still generate its block-mates' images
    (one typo'd serve request must not fail every coalesced peer)."""
    from synt_isic_tpu.generator import ImageGenerator

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                         conditional=True)
    gen.set_inference_steps(2)
    gen.set_save_trajectory(False)
    gen.set_generation_seed(321)
    gen.batch_size = 8
    out = gen.generate_images([("MEL", 2), ("BOGUS", 2), ("NV", 1)],
                              str(tmp_path / "mixed_poison"),
                              postprocess=False)
    assert out["generated"] == 3
    assert (tmp_path / "mixed_poison" / "MEL" / "ISIC_0000002.png").exists()
    assert (tmp_path / "mixed_poison" / "NV" / "ISIC_0000001.png").exists()
    assert not list((tmp_path / "mixed_poison" / "BOGUS").glob("*.png"))


def test_duplicate_class_entries_continue_seed_index(ckpt_dir, tmp_path):
    """Duplicate entries of the same class (serve builds one entry per
    coalesced request) must CONTINUE the per-class seed index: with a
    fixed base seed, restarting it would silently emit byte-identical
    images recorded as distinct samples."""
    from synt_isic_tpu.generator import ImageGenerator

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir),
                         model_config=BASE, conditional=True)
    gen.set_inference_steps(2)
    gen.set_generation_seed(42)
    gen.batch_size = 8
    out = gen.generate_images([("MEL", 2), ("MEL", 2)],
                              str(tmp_path / "dups"), postprocess=False)
    assert out["generated"] == 4
    d = tmp_path / "dups" / "MEL"
    files = sorted(d.glob("ISIC_*.png"))
    assert len(files) == 4
    blobs = [f.read_bytes() for f in files]
    assert len({hash(b) for b in blobs}) == 4, "duplicate images emitted"
    seeds = [json.loads(f.with_suffix(".json").read_text())["seed"]
             for f in files]
    assert seeds == [seeds[0] + i for i in range(4)], seeds


def test_explicit_per_class_overrides_conditional_config(ckpt_dir, tmp_path):
    """conditional=False passed explicitly must win over a config with
    compute.conditional=true (the GUI's family switch back to per-class);
    None defers to the config."""
    import torch

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.utils.config import ConfigManager
    from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

    # the per-class fallback needs a per-class checkpoint to be loadable
    torch.manual_seed(1)
    torch.save(UNet2DTorch(**tiny_config()).state_dict(),
               ckpt_dir / "unet_NV_best.pth")
    cfg = ConfigManager(config_file=str(tmp_path / "config.json"),
                        project_root=str(tmp_path))
    cfg.set("compute.conditional", True, persist=False)
    cfg.set("compute.guidance_scale", 2.5, persist=False)
    cfg.set("paths.checkpoints", str(ckpt_dir), persist=False)

    deferred = ImageGenerator(config=cfg, checkpoints_dir=str(ckpt_dir),
                              model_config=BASE)
    assert deferred.model_manager.conditional
    assert deferred.guidance_scale == 2.5

    forced = ImageGenerator(config=cfg, checkpoints_dir=str(ckpt_dir),
                            model_config=BASE,
                            conditional=False, guidance_scale=0.0)
    assert not forced.model_manager.conditional
    assert forced.guidance_scale == 0.0


def test_conditional_eval_probe_is_stratified(tmp_path, monkeypatch):
    """Best-checkpoint eval on the class-concatenated mixture pool must
    probe EVERY class, not a first-class prefix."""
    import numpy as np

    import synt_isic_tpu.train.train_ddpm as T
    from synt_isic_tpu.train.procedural import ProceduralDataset
    from synt_isic_tpu.train.train_conditional import train_conditional
    from synt_isic_tpu.train.train_ddpm import TrainConfig

    captured = {}
    orig = T.make_eval_fn

    def spy(model, schedule, config, probe, probe_labels=None):
        captured["labels"] = (None if probe_labels is None
                              else np.asarray(probe_labels))
        return orig(model, schedule, config, probe, probe_labels)

    monkeypatch.setattr(T, "make_eval_fn", spy)
    datasets = {c: ProceduralDataset(c, n_images=8, image_size=16, seed=0)
                for c in ("MEL", "NV")}
    cfg = TrainConfig(image_size=16, batch_size=4, epochs=1, eval_every=1,
                      eval_probe_images=6, eval_t_points=2, seed=0,
                      bf16_compute=False, snapshot_every=100)
    from synt_isic_tpu.models.unet2d import UNet2D
    import dataclasses as _dc
    model = UNet2D(config=_dc.replace(COND, num_class_embeds=3))
    train_conditional(datasets, str(tmp_path / "ckpt"), cfg, model=model,
                      log=lambda *a: None)
    labels = captured["labels"]
    assert labels is not None
    assert set(np.unique(labels)) == {0, 1}, labels


def test_unconditional_rng_stream_is_split3():
    """The unconditional training loss must keep drawing (t, eps, offset)
    from split(key, 3) — the historical stream — so seed-pinned runs from
    before the conditional feature still reproduce. Pinned by reproducing
    the loss externally with a split-3 key layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synt_isic_tpu.diffusion import DiffusionSchedule
    from synt_isic_tpu.models.unet2d import UNet2D, init_unet_params
    from synt_isic_tpu.train.train_ddpm import TrainConfig, create_train_state, \
        make_train_step
    import dataclasses as _dc

    cfg16 = BASE  # already a 16px tiny config
    model = UNet2D(config=cfg16)
    schedule = DiffusionSchedule.create()
    tcfg = TrainConfig(image_size=16, batch_size=2, epochs=1,
                       bf16_compute=False, cond_dropout=0.5)
    state, tx = create_train_state(model, tcfg)
    step = make_train_step(model, schedule, tx, tcfg)
    key = jax.random.PRNGKey(7)
    batch = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 3)), jnp.float32)

    # external reproduction with the split-3 layout — computed BEFORE the
    # step call (the jitted step donates the train state)
    k_t, k_eps, _k_off = jax.random.split(key, 3)
    T_train = schedule.num_train_timesteps
    t = jax.random.randint(k_t, (2,), 0, T_train)
    eps = jax.random.normal(k_eps, batch.shape, jnp.float32)
    ab = jnp.asarray(schedule.alphas_cumprod, jnp.float32)[t].reshape(2, 1, 1, 1)
    noisy = jnp.sqrt(ab) * batch + jnp.sqrt(1.0 - ab) * eps
    pred = model.apply({"params": state.params}, noisy, t)
    want = float(jnp.mean((pred.astype(jnp.float32) - eps) ** 2))

    _, loss = step(state, batch, key)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


# -- per-class guidance (round 5: guidance_table / guidance_map) --------------------

def test_guidance_table_matches_per_class_scalar_runs():
    """A batch sampled with a guidance_table must equal, per sample, the
    scalar-guidance sampler run at that sample's own weight (same seed,
    same label) — the table is exactly 'every class at its own g'."""
    sched = DiffusionSchedule.create(100)
    cfg_kwargs = dict(num_inference_steps=4, scheduler="ddim", image_size=8)
    table = (1.0, 3.0, 2.0, 0.0)  # labels 0..2 + null row
    tabled = DiffusionSampler(
        _toy_cond_apply, sched,
        SamplerConfig(guidance_table=table, **cfg_kwargs),
        conditional=True, null_label=3)
    seeds = np.asarray([7, 11], np.uint32)
    labels = np.asarray([1, 2], np.int32)
    out = np.asarray(tabled.sample(jnp.float32(0.0), seeds,
                                   class_labels=labels)["images"])
    for j, (seed, label) in enumerate(zip(seeds, labels)):
        scalar = DiffusionSampler(
            _toy_cond_apply, sched,
            SamplerConfig(guidance_scale=table[label], **cfg_kwargs),
            conditional=True, null_label=3)
        ref = np.asarray(scalar.sample(jnp.float32(0.0), [int(seed)],
                                       class_labels=int(label))["images"])
        np.testing.assert_allclose(out[j], ref[0], atol=1e-5)


def test_guidance_table_requires_null_label():
    sched = DiffusionSchedule.create(100)
    with pytest.raises(ValueError, match="null_label"):
        DiffusionSampler(
            _toy_cond_apply, sched,
            SamplerConfig(num_inference_steps=3, scheduler="ddim",
                          image_size=8, guidance_table=(1.0, 2.0)),
            conditional=True)


def test_generator_guidance_map_sidecar_and_reproduce(ckpt_dir, tmp_path):
    """guidance_map: each class samples at its own weight; the sidecar
    records BOTH the effective scalar and the full map, and reproduce
    rebuilds byte-identically from it."""
    from synt_isic_tpu.cli import reproduce_from_sidecar
    from synt_isic_tpu.generator import ImageGenerator

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                         conditional=True, guidance_scale=2.0,
                         guidance_map={"MEL": 3.0})
    gen.set_inference_steps(3)
    gen.set_save_trajectory(False)
    gen.set_generation_seed(77)
    gen.batch_size = 8
    res = gen.generate_images([("MEL", 1), ("NV", 1)], str(tmp_path / "run"))
    assert res["generated"] == 2

    mel = json.loads((tmp_path / "run" / "MEL" / "ISIC_0000001.json").read_text())
    nv = json.loads((tmp_path / "run" / "NV" / "ISIC_0000001.json").read_text())
    assert mel["scheduler"]["guidance_scale"] == 3.0   # from the map
    assert nv["scheduler"]["guidance_scale"] == 2.0    # the fallback scalar
    assert mel["scheduler"]["guidance_map"] == {"MEL": 3.0}

    rc = reproduce_from_sidecar(
        str(tmp_path / "run" / "MEL" / "ISIC_0000001.json"), str(ckpt_dir),
        output=str(tmp_path / "redo.png"), model_config=BASE)
    assert rc == 0
    assert ((tmp_path / "redo.png").read_bytes()
            == (tmp_path / "run" / "MEL" / "ISIC_0000001.png").read_bytes())


def test_guidance_map_unlisted_classes_stay_plain_conditional(ckpt_dir,
                                                              tmp_path):
    """Scalar-parity normalization: with a map and the DEFAULT
    guidance_scale=0.0, classes absent from the map must sample exactly
    as a no-map conditional run (g <= 1 means plain conditional
    everywhere in the package) — a raw 0.0 table row would silently make
    them UNCONDITIONAL (eps_null + 0*(cond - null))."""
    from synt_isic_tpu.generator import ImageGenerator

    def one_nv(**kwargs):
        gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                             conditional=True, **kwargs)
        gen.set_inference_steps(3)
        gen.set_save_trajectory(False)
        gen.set_generation_seed(77)
        out = tmp_path / f"run{len(list(tmp_path.iterdir()))}"
        res = gen.generate_images([("NV", 1)], str(out))
        assert res["generated"] == 1
        return (out / "NV" / "ISIC_0000001.png").read_bytes()

    plain = one_nv()                               # no map, default scalar
    mapped = one_nv(guidance_map={"MEL": 3.0})     # NV absent from the map
    assert mapped == plain

    # an all-<=1 map collapses to the scalar fast path entirely
    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=BASE,
                         conditional=True, guidance_map={"MEL": 1.0,
                                                         "NV": 0.5})
    assert gen._guidance_table() is None


def test_parse_guidance_map():
    from synt_isic_tpu.generator import parse_guidance_map

    assert parse_guidance_map(None) is None
    assert parse_guidance_map("") is None
    assert parse_guidance_map("MEL=2.5, NV=2") == {"MEL": 2.5, "NV": 2.0}
    with pytest.raises(ValueError):
        parse_guidance_map("MEL")
    with pytest.raises(ValueError):
        parse_guidance_map("MEL=-1")
