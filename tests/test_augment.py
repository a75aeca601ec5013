"""Production augmentation surface: ImageGenerator.augment_single_image
(img2img / inpainting, beyond reference — the reference generator is
noise-only, `core/generator/image_generator.py:395-438`), its sidecar
provenance block, the `--reproduce` byte-identity contract for augmented
runs, and the CLI driver."""
import json
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from PIL import Image

from synt_isic_tpu.generator import ImageGenerator
from synt_isic_tpu.models.unet2d import UNet2DConfig
from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

TINY = tiny_config()
TINY_JAX = UNet2DConfig(
    sample_size=TINY["sample_size"], layers_per_block=TINY["layers_per_block"],
    block_out_channels=TINY["block_out_channels"],
    down_block_types=TINY["down_block_types"],
    up_block_types=TINY["up_block_types"],
    attention_head_dim=TINY["attention_head_dim"],
    norm_num_groups=TINY["norm_num_groups"])
SIZE = TINY["sample_size"]


@pytest.fixture()
def ckpt_dir(tmp_path):
    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    return ckpt


def _write_source(path: Path, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    arr = rng.integers(40, 215, (SIZE, SIZE, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)
    return arr


def _gen(ckpt, steps=4, scheduler="ddim"):
    g = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    g.set_inference_steps(steps)
    g.scheduler_kind = scheduler
    return g


def test_augment_writes_artifacts_with_provenance(ckpt_dir, tmp_path):
    src = tmp_path / "lesion.png"
    _write_source(src)
    gen = _gen(ckpt_dir)
    out = tmp_path / "aug.png"
    ok, _ = gen.augment_single_image("NV", str(src), str(out),
                                     strength=0.5, seed=11)
    assert ok and out.exists()
    meta = json.loads(out.with_suffix(".json").read_text())
    i2i = meta["img2img"]
    assert i2i["strength"] == 0.5
    assert i2i["source"] == "lesion.png"
    assert i2i["postprocess"] is False
    assert len(i2i["source_sha256"]) == 64
    assert meta["seed"] == 11 and meta["noise_hash"]


def test_augment_determinism_and_strength(ckpt_dir, tmp_path):
    src = tmp_path / "s.png"
    src_arr = _write_source(src, 1)
    gen = _gen(ckpt_dir, steps=6)
    a, b = tmp_path / "a.png", tmp_path / "b.png"
    assert gen.augment_single_image("NV", str(src), str(a), strength=0.5,
                                    seed=3)[0]
    assert gen.augment_single_image("NV", str(src), str(b), strength=0.5,
                                    seed=3)[0]
    assert a.read_bytes() == b.read_bytes()
    lo, hi = tmp_path / "lo.png", tmp_path / "hi.png"
    assert gen.augment_single_image("NV", str(src), str(lo), strength=0.17,
                                    seed=5)[0]
    assert gen.augment_single_image("NV", str(src), str(hi), strength=1.0,
                                    seed=5)[0]
    d_lo = np.mean((np.asarray(Image.open(lo), np.float32) - src_arr) ** 2)
    d_hi = np.mean((np.asarray(Image.open(hi), np.float32) - src_arr) ** 2)
    assert d_lo < d_hi


def test_inpaint_mask_preserves_known_pixels(ckpt_dir, tmp_path):
    src = tmp_path / "s.png"
    src_arr = _write_source(src, 2)
    mask = np.zeros((SIZE, SIZE), np.uint8)
    c = SIZE // 4
    mask[c:-c, c:-c] = 255  # regenerate center only
    mask_path = tmp_path / "m.png"
    Image.fromarray(mask).save(mask_path)
    gen = _gen(ckpt_dir)
    out = tmp_path / "inp.png"
    ok, _ = gen.augment_single_image("NV", str(src), str(out), strength=1.0,
                                     mask=str(mask_path), seed=7)
    assert ok
    got = np.asarray(Image.open(out), np.int32)
    known = mask == 0
    # uint8->float->uint8 round-trip may truncate by 1
    assert np.abs(got[known] - src_arr.astype(np.int32)[known]).max() <= 1
    assert not np.array_equal(got[c:-c, c:-c], src_arr[c:-c, c:-c])
    meta = json.loads(out.with_suffix(".json").read_text())
    assert meta["img2img"]["mask"] == "m.png"
    assert len(meta["img2img"]["mask_sha256"]) == 64


def test_reproduce_augmented_sidecar_byte_identical(ckpt_dir, tmp_path):
    from synt_isic_tpu.cli import reproduce_from_sidecar

    src = tmp_path / "run" / "s.png"
    src.parent.mkdir()
    _write_source(src, 3)
    gen = _gen(ckpt_dir)
    out = tmp_path / "run" / "aug.png"
    assert gen.augment_single_image("NV", str(src), str(out), strength=0.5,
                                    seed=21)[0]
    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpt_dir),
                                output=str(tmp_path / "redo.png"),
                                model_config=TINY_JAX)
    assert rc == 0
    assert (tmp_path / "redo.png").read_bytes() == out.read_bytes()

    # tampered source -> loud sha mismatch
    _write_source(src, 99)
    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpt_dir),
                                output=str(tmp_path / "redo2.png"),
                                model_config=TINY_JAX)
    assert rc == 1


def test_reproduce_resolves_source_from_recorded_path(ckpt_dir, tmp_path):
    """Source lives elsewhere (CLI usage): the recorded absolute path wins
    when no same-name file sits next to the sidecar."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    src = tmp_path / "elsewhere" / "s.png"
    src.parent.mkdir()
    _write_source(src, 4)
    gen = _gen(ckpt_dir)
    out = tmp_path / "out" / "aug.png"
    out.parent.mkdir()
    assert gen.augment_single_image("NV", str(src), str(out), strength=0.4,
                                    seed=2)[0]
    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpt_dir),
                                output=str(tmp_path / "redo.png"),
                                model_config=TINY_JAX)
    assert rc == 0
    assert (tmp_path / "redo.png").read_bytes() == out.read_bytes()


def test_augment_array_source_reproduce_refuses(ckpt_dir, tmp_path):
    from synt_isic_tpu.cli import reproduce_from_sidecar

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
    gen = _gen(ckpt_dir)
    out = tmp_path / "aug.png"
    assert gen.augment_single_image("NV", arr, str(out), strength=0.5,
                                    seed=1)[0]
    meta = json.loads(out.with_suffix(".json").read_text())
    assert "source" not in meta["img2img"]  # in-memory input
    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpt_dir),
                                output=str(tmp_path / "redo.png"),
                                model_config=TINY_JAX)
    assert rc == 2


def test_augment_cli_driver(ckpt_dir, tmp_path):
    from synt_isic_tpu.cli import augment_from_cli

    src = tmp_path / "s.png"
    _write_source(src, 5)
    args = SimpleNamespace(
        classes=["NV"], augment_source=str(src), augment_strength=0.5,
        augment_mask=None, count=2, seed=9, output=str(tmp_path / "out"),
        checkpoints=str(ckpt_dir), steps=4, scheduler="ddim",
        timestep_spacing="leading", model_variant="best", conditional=False,
        guidance_scale=0.0, no_postprocess=False)
    assert augment_from_cli(args, model_config=TINY_JAX) == 0
    files = sorted((tmp_path / "out").glob("*.png"))
    assert len(files) == 2
    metas = [json.loads(f.with_suffix(".json").read_text()) for f in files]
    assert metas[0]["seed"] == 9 and metas[1]["seed"] == 10

    args.scheduler = "unipc"
    assert augment_from_cli(args, model_config=TINY_JAX) == 1
    args.scheduler = "ddim"
    args.classes = []
    assert augment_from_cli(args, model_config=TINY_JAX) == 1


def test_augment_multistep_scheduler_fails_loudly(ckpt_dir, tmp_path):
    src = tmp_path / "s.png"
    _write_source(src)
    gen = _gen(ckpt_dir, scheduler="dpm_solver")
    ok, _ = gen.augment_single_image("NV", str(src), str(tmp_path / "a.png"),
                                     seed=1)
    assert not ok  # logged error, no artifact
    assert not (tmp_path / "a.png").exists()


def test_reproduce_survives_stale_same_named_neighbor(ckpt_dir, tmp_path):
    """ADVICE r3: a stale same-named file next to the sidecar must not
    block reproduction when the pristine original still exists at the
    recorded absolute path — the first sha-matching candidate wins."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    src = tmp_path / "elsewhere" / "s.png"
    src.parent.mkdir()
    _write_source(src, 6)
    gen = _gen(ckpt_dir)
    out = tmp_path / "out" / "aug.png"
    out.parent.mkdir()
    assert gen.augment_single_image("NV", str(src), str(out), strength=0.4,
                                    seed=3)[0]
    # plant a DIFFERENT image under the same name next to the sidecar
    _write_source(out.parent / "s.png", 99)
    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpt_dir),
                                output=str(tmp_path / "redo.png"),
                                model_config=TINY_JAX)
    assert rc == 0
    assert (tmp_path / "redo.png").read_bytes() == out.read_bytes()


def test_dark_uint8_array_source_rescaled_by_dtype(ckpt_dir):
    """ADVICE r3: an all-dark uint8 array (max <= 1) is still 0-255 range —
    the rescale decision must come from the dtype, not the values."""
    dark = np.zeros((SIZE, SIZE, 3), np.uint8)
    dark[0, 0] = 1
    arr, name, digest = ImageGenerator._load_source_image(dark, SIZE)
    assert name is None and len(digest) == 64
    assert arr.min() >= -1.0 and arr.max() <= -0.99  # 0-1 uint8 -> ~-1.0
    # float input in [-1,1] passes through unscaled
    f = np.full((SIZE, SIZE, 3), 0.5, np.float32)
    arr2, _, _ = ImageGenerator._load_source_image(f, SIZE)
    assert np.allclose(arr2, 0.5)


def test_augment_cli_partial_failure_exits_nonzero(ckpt_dir, tmp_path,
                                                   monkeypatch):
    """ADVICE r3: fewer successes than requested must be a nonzero exit."""
    from synt_isic_tpu.cli import augment_from_cli

    src = tmp_path / "s.png"
    _write_source(src, 7)
    real = ImageGenerator.augment_single_image
    calls = {"n": 0}

    def flaky(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            return False, None
        return real(self, *a, **kw)

    monkeypatch.setattr(ImageGenerator, "augment_single_image", flaky,
                        raising=True)
    args = SimpleNamespace(
        classes=["NV"], augment_source=str(src), augment_strength=0.5,
        augment_mask=None, count=3, seed=9, output=str(tmp_path / "out"),
        checkpoints=str(ckpt_dir), steps=4, scheduler="ddim",
        timestep_spacing="leading", model_variant="best", conditional=False,
        guidance_scale=0.0, no_postprocess=False)
    assert augment_from_cli(args, model_config=TINY_JAX) == 1  # 2/3 succeeded
