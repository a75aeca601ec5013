"""CPU smoke of `scripts/score_checkpoint.py` (the generic quality scorer)
and the attention-fast-math sidecar contract.

The scorer is the evidence vehicle for the fused-attention bf16-exponential
mode: `--ab-fast-math` scores each config with exact and fast attention and
reports the Fréchet delta. On CPU the Pallas kernel is not engaged (the
fused path is TPU-only), so this test pins the integration seam and the
sidecar/reproduce contract, not the numeric delta — that comes from the
chip run (artifacts/).
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from score_checkpoint import parse_configs, score_checkpoint  # noqa: E402


def _tiny_checkpoint(tmp_path, size=16):
    import jax

    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params
    from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format

    cfg = UNet2DConfig(sample_size=size, layers_per_block=1,
                       block_out_channels=(8, 16, 16), attention_head_dim=4,
                       norm_num_groups=2,
                       down_block_types=("DownBlock2D", "AttnDownBlock2D",
                                         "DownBlock2D"),
                       up_block_types=("UpBlock2D", "AttnUpBlock2D",
                                       "UpBlock2D"))
    model = UNet2D(config=cfg)
    params = init_unet_params(model, jax.random.PRNGKey(0), image_size=size)
    ckpts = tmp_path / "checkpoints"
    ckpts.mkdir()
    save_checkpoint_torch_format(params, str(ckpts / "unet_MEL_best.pth"))
    return ckpts, cfg


def test_parse_configs():
    cfgs = parse_configs("ddim:50:trailing,dpm_solver:20")
    assert cfgs == [
        {"scheduler": "ddim", "steps": 50, "spacing": "trailing"},
        {"scheduler": "dpm_solver", "steps": 20, "spacing": "leading"}]
    with pytest.raises(ValueError):
        parse_configs("ddim")


@pytest.mark.slow
def test_score_checkpoint_ab_fast_math(tmp_path, monkeypatch):
    size = 16
    ckpts, cfg = _tiny_checkpoint(tmp_path, size)
    # route the scorer at the tiny architecture instead of the e2e config
    monkeypatch.setattr(
        "e2e_loop.small_unet_config", lambda s: cfg)

    report = score_checkpoint(
        str(ckpts), str(tmp_path / "report.json"),
        parse_configs("ddim:4:trailing"), class_name="MEL", size=size,
        count=2, heldout=8, seed=0, batch=2, ab_fast_math=True,
        log=lambda *_: None)

    rows = report["rows"]
    assert [r["fast_math"] for r in rows] == [False, True]
    for r in rows:
        assert np.isfinite(r["frechet_vs_heldout"])
        assert r["img_per_s"] > 0
    assert "frechet_delta_vs_exact" in rows[1]
    saved = json.loads((tmp_path / "report.json").read_text())
    assert saved["rows"][0]["scheduler"] == "ddim"


@pytest.mark.slow
def test_fast_math_sidecar_roundtrip(tmp_path):
    """A generator with fast_math enabled records it in the sidecar, and
    --reproduce rebuilds with the same setting (byte-identical bytes)."""
    import jax.numpy as jnp

    from synt_isic_tpu.cli import reproduce_from_sidecar
    from synt_isic_tpu.generator import ImageGenerator

    size = 16
    ckpts, cfg = _tiny_checkpoint(tmp_path, size)
    gen = ImageGenerator(checkpoints_dir=str(ckpts), model_config=cfg,
                         compute_dtype=jnp.bfloat16)
    gen.set_inference_steps(4)
    gen.scheduler_kind = "ddim"
    gen.model_manager.set_attention_tuning(fast_math=True)
    assert gen.model_manager.attention_fast_math is True
    out = tmp_path / "img.png"
    ok, _ = gen.generate_single_image("MEL", str(out), postprocess=False,
                                      seed=11)
    assert ok
    meta = json.loads(out.with_suffix(".json").read_text())
    assert meta["scheduler"]["attention_fast_math"] is True

    rc = reproduce_from_sidecar(str(out.with_suffix(".json")), str(ckpts),
                                output=str(tmp_path / "redo.png"),
                                postprocess=False, model_config=cfg)
    assert rc == 0
    assert (tmp_path / "redo.png").read_bytes() == out.read_bytes()


def test_sidecar_omits_fast_math_by_default(tmp_path):
    """Default generation must NOT add the attention_fast_math key — older
    sidecars stay byte-identical."""
    import jax.numpy as jnp

    from synt_isic_tpu.generator import ImageGenerator

    size = 16
    ckpts, cfg = _tiny_checkpoint(tmp_path, size)
    gen = ImageGenerator(checkpoints_dir=str(ckpts), model_config=cfg,
                         compute_dtype=jnp.bfloat16)
    gen.set_inference_steps(2)
    out = tmp_path / "img.png"
    ok, _ = gen.generate_single_image("MEL", str(out), postprocess=False,
                                      seed=3)
    assert ok
    meta = json.loads(out.with_suffix(".json").read_text())
    assert "attention_fast_math" not in meta["scheduler"]
