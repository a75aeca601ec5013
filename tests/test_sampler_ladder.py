"""Sampler speed-quality ladder: the measurement harness runs end-to-end
on a fabricated checkpoint and picks a quality-matched headline rung."""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from sampler_ladder import run_ladder  # noqa: E402
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params  # noqa: E402
from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format  # noqa: E402

TINY32 = UNet2DConfig(sample_size=32, layers_per_block=1,
                      block_out_channels=(16, 32, 32), attention_head_dim=8,
                      norm_num_groups=8,
                      down_block_types=("DownBlock2D", "AttnDownBlock2D",
                                        "DownBlock2D"),
                      up_block_types=("UpBlock2D", "AttnUpBlock2D",
                                      "UpBlock2D"))


def test_sampler_ladder_smoke(tmp_path):
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    params = init_unet_params(UNet2D(config=TINY32), jax.random.PRNGKey(0),
                              image_size=32)
    save_checkpoint_torch_format(params, str(ckpt_dir / "unet_MEL_best.pth"))

    report = run_ladder(str(ckpt_dir), str(tmp_path / "ladder.json"),
                        size=32, count=2, heldout=8, seed=3,
                        grid=(("ddim", 3), ("dpm_solver", 2),
                              ("unipc", 3, "trailing")),
                        model_config=TINY32, log=lambda *a: None)
    assert len(report["rungs"]) == 3
    for r in report["rungs"]:
        assert np.isfinite(r["frechet_vs_heldout"])
        assert r["img_per_s"] > 0
    assert report["headline"] in report["rungs"]
    assert np.isfinite(report["ceiling_noise_vs_heldout"])
    assert (tmp_path / "ladder.json").exists()
