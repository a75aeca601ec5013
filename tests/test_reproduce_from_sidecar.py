"""The sidecar JSON must suffice to regenerate the EXACT image: seed +
steps + scheduler config -> identical PNG bytes and noise hash (the
reproducibility contract of `image_generator.py:456-477`)."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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


def test_regenerate_from_sidecar(tmp_path):
    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    gen.set_generation_seed(None)  # random mode — the seed is *recorded*
    out = gen.generate_images([("NV", 1)], str(tmp_path / "run"),
                              postprocess=False)
    assert out["generated"] == 1

    img_path = tmp_path / "run" / "NV" / "ISIC_0000001.png"
    meta = json.loads(img_path.with_suffix(".json").read_text())

    # regenerate purely from the sidecar fields
    gen2 = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen2.set_inference_steps(meta["inference_steps"])
    ok, _ = gen2.generate_single_image("NV", str(tmp_path / "redo.png"),
                                       postprocess=False, seed=meta["seed"])
    assert ok
    assert (tmp_path / "redo.png").read_bytes() == img_path.read_bytes()
    redo_meta = json.loads((tmp_path / "redo.json").read_text())
    assert redo_meta["noise_hash"] == meta["noise_hash"]


@pytest.mark.slow
def test_cli_reproduce_flag(tmp_path, capsys):
    """`--reproduce <sidecar.json>` regenerates the exact image and verifies
    the noise hash."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    gen.set_generation_seed(123)
    gen.generate_images([("NV", 1)], str(tmp_path / "run"), postprocess=False)
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000001.json"

    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0
    assert ((tmp_path / "redo.png").read_bytes()
            == (tmp_path / "run" / "NV" / "ISIC_0000001.png").read_bytes())

    # corrupt the recorded hash -> must fail loudly
    meta = json.loads(sidecar.read_text())
    meta["noise_hash"] = "deadbeef"
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(meta))
    rc = reproduce_from_sidecar(str(bad), str(ckpt),
                                output=str(tmp_path / "redo2.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 1


def test_cli_reproduce_pins_scheduler_kind(tmp_path):
    """A sidecar written from a DDIM run must reproduce through DDIM — the
    recorded scheduler kind drives the reverse process (byte comparison
    against the original proves it; a DDPM re-run would differ)."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    gen.scheduler_kind = "ddim"
    gen.set_generation_seed(55)
    gen.generate_images([("NV", 1)], str(tmp_path / "run"), postprocess=False)
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000001.json"
    assert json.loads(sidecar.read_text())["scheduler"]["kind"] == "ddim"

    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0  # exits 0 only on byte-identity with the original here


@pytest.mark.slow
def test_cli_reproduce_pins_compute_dtype(tmp_path):
    """A sidecar written by a bf16 generator (the serving default) must
    reproduce through a bf16 generator — an f32 regeneration produces
    different bytes and previously failed with a misleading 'different
    checkpoint' error (ADVICE r2, generator.py:234)."""
    import jax.numpy as jnp

    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX,
                         compute_dtype=jnp.bfloat16)
    gen.set_inference_steps(4)
    gen.set_generation_seed(77)
    gen.generate_images([("NV", 1)], str(tmp_path / "run"), postprocess=False)
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000001.json"
    assert json.loads(sidecar.read_text())["scheduler"]["dtype"] == "bfloat16"

    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0  # byte-identity requires rebuilding with bf16 compute


@pytest.mark.slow
def test_cli_reproduce_legacy_sidecar_retries_bf16(tmp_path):
    """Sidecars that PREDATE dtype recording may come from either default:
    the CLI/GUI wrote f32 but the serve daemon wrote bf16. With the
    original image present, reproduce must try f32 then RETRY with bf16
    before declaring non-reproduction — asserting 'legacy == f32' breaks
    every served pre-dtype sidecar."""
    import jax.numpy as jnp

    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX,
                         compute_dtype=jnp.bfloat16)
    gen.set_inference_steps(4)
    gen.set_generation_seed(78)
    gen.generate_images([("NV", 1)], str(tmp_path / "run"), postprocess=False)
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000001.json"
    # simulate a pre-dtype-recording (served, bf16) sidecar
    meta = json.loads(sidecar.read_text())
    del meta["scheduler"]["dtype"]
    sidecar.write_text(json.dumps(meta))

    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0  # f32 attempt differs; the bf16 retry byte-matches
    assert ((tmp_path / "redo.png").read_bytes()
            == (tmp_path / "run" / "NV" / "ISIC_0000001.png").read_bytes())


@pytest.mark.slow
def test_reproduce_honors_model_variant(tmp_path):
    """A sidecar written from a non-'best' checkpoint variant (e.g. a
    progressive-distillation student) records the variant, and --reproduce
    samples the SAME weights — byte-identity would be impossible from the
    'best' checkpoint, which here has different weights."""
    from synt_isic_tpu.cli import reproduce_from_sidecar
    from synt_isic_tpu.model_manager import ModelManager

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")
    torch.manual_seed(7)   # DIFFERENT weights for the student
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_distill4.pth")

    mm = ModelManager(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    assert mm.available_variants("NV") == ["best", "distill4"]

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX,
                         model_variant="distill4")
    gen.set_inference_steps(4)
    gen.timestep_spacing = "trailing"
    gen.set_generation_seed(42)
    out = gen.generate_images([("NV", 1)], str(tmp_path / "run"),
                              postprocess=False)
    assert out["generated"] == 1
    img_path = tmp_path / "run" / "NV" / "ISIC_0000001.png"
    meta = json.loads(img_path.with_suffix(".json").read_text())
    assert meta["scheduler"]["model_variant"] == "distill4"

    rc = reproduce_from_sidecar(str(img_path.with_suffix(".json")), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0
    assert (tmp_path / "redo.png").read_bytes() == img_path.read_bytes()

    # sanity: the 'best' checkpoint really does produce different bytes
    gen_best = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen_best.set_inference_steps(4)
    gen_best.timestep_spacing = "trailing"
    ok, _ = gen_best.generate_single_image(
        "NV", str(tmp_path / "best.png"), postprocess=False, seed=meta["seed"])
    assert ok
    assert (tmp_path / "best.png").read_bytes() != img_path.read_bytes()


@pytest.mark.slow
def test_reproduce_honors_png_compress_level(tmp_path):
    """A non-default PNG zlib level changes the file's BYTES (not pixels);
    the sidecar records it and reproduce re-encodes with the same level so
    byte-identity holds. Default-level sidecars carry no such field
    (pre-existing sidecars stay byte-identical)."""
    from PIL import Image

    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(3)
    gen.set_generation_seed(41)
    gen.png_compress_level = 1
    gen.generate_images([("NV", 1)], str(tmp_path / "fast"), postprocess=False)
    fast_png = tmp_path / "fast" / "NV" / "ISIC_0000001.png"
    meta = json.loads(fast_png.with_suffix(".json").read_text())
    assert meta["scheduler"]["png_compress_level"] == 1

    # same image at the default level: identical pixels, different bytes
    gen2 = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen2.set_inference_steps(3)
    gen2.set_generation_seed(41)
    gen2.generate_images([("NV", 1)], str(tmp_path / "dflt"), postprocess=False)
    dflt_png = tmp_path / "dflt" / "NV" / "ISIC_0000001.png"
    dflt_meta = json.loads(dflt_png.with_suffix(".json").read_text())
    assert "png_compress_level" not in dflt_meta["scheduler"]
    np.testing.assert_array_equal(np.asarray(Image.open(fast_png)),
                                  np.asarray(Image.open(dflt_png)))
    assert fast_png.read_bytes() != dflt_png.read_bytes()

    # reproduce rebuilds with the recorded level -> byte-identity
    rc = reproduce_from_sidecar(str(fast_png.with_suffix(".json")), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0


def test_reproduce_rebuilds_recorded_device_block(tmp_path):
    """Images generated in a multi-image device block record the block
    layout (seeds + index) and reproduce by rebuilding the SAME block —
    XLA's float tiling is batch-shape-dependent, so a batch-1 regeneration
    of a batch-4 image is not guaranteed byte-identical on TPU (the chip
    parity-gauntlet failure this fixes)."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    gen.set_generation_seed(42)
    gen.batch_size = 3
    gen.generate_images([("NV", 3)], str(tmp_path / "run"), postprocess=False)

    metas = [json.loads((tmp_path / "run" / "NV" / f"ISIC_{i:07d}.json")
                        .read_text()) for i in (1, 2, 3)]
    seeds = [m["seed"] for m in metas]
    for i, m in enumerate(metas):
        assert m["block"]["index"] == i
        assert m["block"]["seeds"] == seeds          # the whole block
        assert "classes" not in m["block"]           # per-class model

    # reproduce the MIDDLE image: must go through the block path and match
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000002.json"
    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0
    assert ((tmp_path / "redo.png").read_bytes()
            == (tmp_path / "run" / "NV" / "ISIC_0000002.png").read_bytes())
    redo = json.loads((tmp_path / "redo.json").read_text())
    assert redo["block"] == metas[1]["block"]        # provenance survives

    # single-image blocks stay unannotated (pre-existing sidecar contract)
    gen.batch_size = 1
    gen.generate_images([("NV", 1)], str(tmp_path / "run1"), postprocess=False)
    one = json.loads((tmp_path / "run1" / "NV" / "ISIC_0000001.json")
                     .read_text())
    assert "block" not in one


def test_reproduce_corrects_output_extension_mismatch(tmp_path, capsys):
    """An --output extension that disagrees with the recorded artifact
    format must be corrected (with a warning), not silently re-encoded —
    a PNG artifact re-encoded as JPEG could never byte-match and used to
    report a false 'bytes DIFFER' failure."""
    from synt_isic_tpu.cli import reproduce_from_sidecar

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    gen.set_generation_seed(7)
    gen.generate_images([("NV", 1)], str(tmp_path / "run"), postprocess=False)
    sidecar = tmp_path / "run" / "NV" / "ISIC_0000001.json"

    # recorded format is PNG; ask for .jpg — must write .png and succeed
    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.jpg"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0
    assert not (tmp_path / "redo.jpg").exists()
    assert (tmp_path / "redo.png").read_bytes() == \
        (tmp_path / "run" / "NV" / "ISIC_0000001.png").read_bytes()
    err = capsys.readouterr().err
    assert "does not match the recorded artifact format" in err
    # a .jpeg spelling must hit the file branch, not mkdir a directory
    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo2.jpeg"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0
    assert not (tmp_path / "redo2.jpeg").is_dir()
    assert (tmp_path / "redo2.png").exists()


def test_reproduce_mesh_block_records_and_rebuilds_dp_mesh(tmp_path):
    """A data-parallel-sampled block is layout-dependent: the sidecar must
    record the mesh device count and --reproduce must rebuild over the
    SAME layout (and refuse, exit 2, when this host cannot provide it)."""
    import json as _json

    from synt_isic_tpu.cli import reproduce_from_sidecar
    from synt_isic_tpu.parallel.mesh import create_mesh

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_NV_best.pth")

    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    gen.set_generation_seed(11)
    gen.batch_size = 2
    gen.set_mesh(create_mesh({"data": 2}))
    gen.generate_images([("NV", 2)], str(tmp_path / "run"), postprocess=False)

    sidecar = tmp_path / "run" / "NV" / "ISIC_0000002.json"
    meta = _json.loads(sidecar.read_text())
    assert meta["block"]["dp_mesh"] == 2

    rc = reproduce_from_sidecar(str(sidecar), str(ckpt),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 0
    assert ((tmp_path / "redo.png").read_bytes()
            == (tmp_path / "run" / "NV" / "ISIC_0000002.png").read_bytes())
    redo = _json.loads((tmp_path / "redo.json").read_text())
    assert redo["block"]["dp_mesh"] == 2  # provenance survives reproduce

    # a layout this host cannot provide -> honest 'unverifiable', not a
    # false byte-DIFFER failure
    meta["block"]["dp_mesh"] = 4096
    big = tmp_path / "run" / "NV" / "big.json"
    big.write_text(_json.dumps(meta))
    rc = reproduce_from_sidecar(str(big), str(ckpt),
                                output=str(tmp_path / "redo4k.png"),
                                postprocess=False, model_config=TINY_JAX)
    assert rc == 2
