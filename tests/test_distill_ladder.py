"""CPU smoke of `scripts/distill_ladder.py`: the distill→score pipeline
closes end to end — teacher checkpoint in, halving ladder out, every rung
sampled through the production ImageGenerator and Fréchet-scored against
held-out procedural data.

The real-chip run (artifacts/distill_ladder/report.json) provides the
actual quality numbers; this test pins the integration seam.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from distill_ladder import run_distill_ladder  # noqa: E402


@pytest.mark.slow
def test_distill_ladder_closes(tmp_path):
    import jax
    import jax.numpy as jnp

    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params
    from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format

    size = 16
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

    report = run_distill_ladder(
        str(ckpts), str(tmp_path / "ladder"), class_name="MEL", size=size,
        start_steps=8, end_steps=4, steps_per_phase=2, batch_size=4,
        train_images=8, count=2, heldout=8, seed=0, model_config=cfg,
        log=lambda *_: None)

    tags = [r["tag"] for r in report["rungs"]]
    # teacher anchor at start steps, then per-phase (baseline, student) pairs
    assert tags == ["teacher_ddim8", "teacher_ddim4", "distill4"]
    for r in report["rungs"]:
        assert np.isfinite(r["frechet_vs_heldout"]), r
        assert r["img_per_s"] > 0
    assert np.isfinite(report["floor_train_vs_heldout"])
    assert report["ceiling_noise_vs_heldout"] > 0
    # the student checkpoint is on disk in torch format
    assert (tmp_path / "ladder" / "checkpoints"
            / "unet_MEL_distill4.pth").exists()
    assert (tmp_path / "ladder" / "report.json").exists()
