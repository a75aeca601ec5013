"""CPU seam test for the augmentation quality-evidence harness
(`scripts/augment_eval.py`): the machinery must run end-to-end on a tiny
fabricated checkpoint so the chip run cannot fail on wiring."""
import json
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

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


@pytest.mark.slow
def test_augment_eval_seam(tmp_path):
    from augment_eval import run_eval

    ckpt = tmp_path / "checkpoints"
    ckpt.mkdir()
    torch.manual_seed(0)
    torch.save(UNet2DTorch(**TINY).state_dict(), ckpt / "unet_MEL_best.pth")

    out = tmp_path / "report.json"
    report = run_eval(str(ckpt), str(out), size=TINY["sample_size"],
                      count=8, heldout=16, steps=2, diversity_seeds=3,
                      strengths=(0.5, 1.0), model_config=TINY_JAX,
                      log=lambda *a, **k: None)
    assert out.exists()
    disk = json.loads(out.read_text())
    assert disk["strength_sweep"] == report["strength_sweep"]
    assert len(report["strength_sweep"]) == 2
    # lower strength stays closer to the source
    rms = {r["strength"]: r["mean_rms_to_source"]
           for r in report["strength_sweep"]}
    assert rms[0.5] < rms[1.0]
    # inpaint border is preserved exactly at float precision
    assert report["inpaint_center_box"]["border_preserved"]
    # anchors present and ordered sanely
    a = report["anchors"]
    assert a["heldout_split_floor"] < a["noise_ceiling"]
    assert report["diversity"]["mean_pairwise_feature_dist_variants"] > 0
