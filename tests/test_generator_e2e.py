"""End-to-end slice: fabricated tiny checkpoint -> sampler -> PNG + sidecar
+ CSV, with the reference's seed discipline.

Mirrors the minimum end-to-end behavior of the reference generation path
(`image_generator.py:308-500,547-740`, smoke script `diffusion/generate_test.py`).
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from synt_isic_tpu.generator import ImageGenerator, class_seed_offset
from synt_isic_tpu.models.unet2d import UNet2DConfig
from synt_isic_tpu.model_manager import ModelManager
from synt_isic_tpu.cache import CacheManager

from tests.torch_oracle.unet2d_torch import UNet2DTorch, tiny_config

TINY = tiny_config()
TINY_JAX = UNet2DConfig(
    sample_size=TINY["sample_size"], layers_per_block=TINY["layers_per_block"],
    block_out_channels=TINY["block_out_channels"],
    down_block_types=TINY["down_block_types"],
    up_block_types=TINY["up_block_types"],
    attention_head_dim=TINY["attention_head_dim"],
    norm_num_groups=TINY["norm_num_groups"])


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("checkpoints")
    torch.manual_seed(0)
    model = UNet2DTorch(**TINY)
    torch.save(model.state_dict(), d / "unet_NV_best.pth")
    torch.save(model.state_dict(), d / "unet_MEL_best.pth")
    # color statistics for postprocessing
    stats = {"NV": {"rgb": {"mean": [180, 140, 130], "std": [40, 35, 35]}}}
    (d / "color_statistics.json").write_text(json.dumps(stats))
    return d


@pytest.fixture(scope="module")
def generator(ckpt_dir):
    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=TINY_JAX)
    gen.set_inference_steps(4)
    return gen


def test_available_classes(generator):
    assert generator.get_available_classes() == ["MEL", "NV"]


def test_generate_images_end_to_end(generator, tmp_path):
    generator.set_generation_seed(123)
    out = generator.generate_images([("NV", 3)], str(tmp_path / "out"))
    assert out["generated"] == 3
    nv_dir = tmp_path / "out" / "NV"
    files = sorted(p.name for p in nv_dir.glob("*.png"))
    assert files == ["ISIC_0000001.png", "ISIC_0000002.png", "ISIC_0000003.png"]

    # sidecar metadata with the exact seed bookkeeping
    meta = json.loads((nv_dir / "ISIC_0000002.json").read_text())
    expected_seed = (123 + class_seed_offset("NV") + 1) & 0x7FFFFFFF
    assert meta["seed"] == expected_seed
    assert meta["class"] == "NV"
    assert meta["inference_steps"] == 4
    assert meta["scheduler"]["beta_schedule"] == "squaredcos_cap_v2"
    assert len(meta["noise_hash"]) == 16

    # CSV rows
    csv_text = (tmp_path / "out" / "synthetic_dataset.csv").read_text()
    lines = csv_text.strip().splitlines()
    assert lines[0] == "filename,class,isic_number,source,generated_at"
    assert len(lines) == 4
    assert lines[1].startswith("ISIC_0000001.png,NV,1,synthetic,")


def test_batched_equals_serial(generator, tmp_path):
    """Seed-derived noise makes batched sampling match one-at-a-time
    generation: the same per-image RNG streams feed both paths, so outputs
    agree up to XLA's batch-dependent float tiling (a few uint8 LSBs)."""
    from PIL import Image

    generator.set_generation_seed(7)
    generator.batch_size = 1
    generator.generate_images([("NV", 2)], str(tmp_path / "serial"),
                              postprocess=False)
    generator.batch_size = 2
    generator.generate_images([("NV", 2)], str(tmp_path / "batched"),
                              postprocess=False)
    for name in ("ISIC_0000001.png", "ISIC_0000002.png"):
        a = np.asarray(Image.open(tmp_path / "serial" / "NV" / name), dtype=np.int16)
        b = np.asarray(Image.open(tmp_path / "batched" / "NV" / name), dtype=np.int16)
        assert np.abs(a - b).max() <= 3
        assert np.mean(np.abs(a - b)) < 0.5
    generator.batch_size = 1


def test_fixed_seed_reproducible(generator, tmp_path):
    generator.set_generation_seed(42)
    generator.generate_images([("NV", 1)], str(tmp_path / "r1"), postprocess=False)
    generator.generate_images([("NV", 1)], str(tmp_path / "r2"), postprocess=False)
    a = (tmp_path / "r1" / "NV" / "ISIC_0000001.png").read_bytes()
    b = (tmp_path / "r2" / "NV" / "ISIC_0000001.png").read_bytes()
    assert a == b
    m1 = json.loads((tmp_path / "r1" / "NV" / "ISIC_0000001.json").read_text())
    m2 = json.loads((tmp_path / "r2" / "NV" / "ISIC_0000001.json").read_text())
    assert m1["noise_hash"] == m2["noise_hash"]


def test_random_mode_records_seed(generator, tmp_path):
    generator.set_generation_seed(None)
    generator.generate_images([("NV", 1)], str(tmp_path / "rand"), postprocess=False)
    meta = json.loads((tmp_path / "rand" / "NV" / "ISIC_0000001.json").read_text())
    assert isinstance(meta["seed"], int) and 0 <= meta["seed"] < 0x7FFFFFFF


def test_trajectory_capture_and_xai_trigger(generator, tmp_path):
    captured = {}

    class FakeAnalyzer:
        def analyze_trajectory(self, trajectory, class_name, seed,
                               inference_steps, filename, file_path):
            captured["shape"] = trajectory.shape
            captured["class"] = class_name
            captured["seed"] = seed
            return {"ok": True}

    generator.set_generation_seed(5)
    generator.set_xai_analyzer(FakeAnalyzer())
    generator.set_xai_frequency(2)
    out = generator.generate_images([("NV", 2)], str(tmp_path / "xai"),
                                    postprocess=False)
    assert out["generated"] == 2
    assert captured["shape"] == (4, TINY["sample_size"], TINY["sample_size"], 3)
    assert captured["class"] == "NV"
    # frequency=2 -> triggered on image 2, whose seed index is 1
    assert captured["seed"] == (5 + class_seed_offset("NV") + 1) & 0x7FFFFFFF
    # saved xai_results JSON exists
    assert list((tmp_path / "xai" / "xai_results" / "NV").glob("xai_*.json"))
    generator.set_xai_analyzer(None)


def test_stop_generation(generator, tmp_path):
    generator.set_generation_seed(1)
    generator.stop_generation()
    out = generator.generate_images([("NV", 2)], str(tmp_path / "stopped"))
    # stop flag is reset at entry (parity with reference), so this runs;
    # but requesting stop mid-run halts: emulate via callback
    assert out["generated"] == 2

    calls = []

    def stopper(done, total, msg):
        calls.append(done)
        generator.stop_generation()

    generator.set_progress_callback(stopper)
    out = generator.generate_images([("NV", 3)], str(tmp_path / "stopped2"))
    assert out["stopped"] is True
    assert out["generated"] < 3
    generator.set_progress_callback(None)


def test_model_manager_info_and_cache(ckpt_dir, tmp_path):
    cache = CacheManager(str(tmp_path / "cache"))
    mm = ModelManager(checkpoints_dir=str(ckpt_dir), cache_manager=cache,
                      model_config=TINY_JAX)
    assert mm.load_model("NV")
    assert mm.validate_model("NV")
    info = mm.get_loaded_models_info()
    assert info["NV"]["parameters"] > 1000
    # converted-pytree cache hit on second load
    mm2 = ModelManager(checkpoints_dir=str(ckpt_dir), cache_manager=cache,
                       model_config=TINY_JAX)
    assert mm2.load_model("NV")
    assert cache.get_cache_stats()["cached_models"] == 1
    assert mm.unload_all_models()


def test_model_manager_unwraps_training_checkpoint(ckpt_dir, tmp_path):
    """Full training checkpoints ({'model_state_dict': ...}) load too."""
    torch.manual_seed(3)
    model = UNet2DTorch(**TINY)
    wrapped = {"model_state_dict": model.state_dict(), "epoch": 9}
    ckpt2 = tmp_path / "ckpt2"
    ckpt2.mkdir()
    torch.save(wrapped, ckpt2 / "unet_DF_best.pth")
    mm = ModelManager(checkpoints_dir=str(ckpt2), model_config=TINY_JAX)
    assert mm.load_model("DF")
    assert mm.validate_model("DF")
