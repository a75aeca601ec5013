"""End-to-end production-path validation on the real TPU.

Full-size (25M-param) UNet with random weights -> batched generation with
trajectory capture -> integrated XAI (reduced budgets) -> artifact checks.
Exercises exactly what a user runs, on hardware: ImageGenerator,
ModelManager (+converted-npz cache), the scan sampler with fused attention,
and the XAI pipeline (IG/SHAP/Time-SHAP/Grad-CAM/stats) on-device.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))


def main() -> int:
    import jax.numpy as jnp

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params
    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format
    from synt_isic_tpu.xai.integration import IntegratedXAIAnalyzer

    work = Path(tempfile.mkdtemp(prefix="e2e_tpu_"))
    ckpt_dir = work / "checkpoints"
    ckpt_dir.mkdir()
    print(f"workdir: {work}", flush=True)

    # fabricate a full-size checkpoint (random weights, real architecture)
    t0 = time.time()
    params = init_unet_params(UNet2D(config=UNet2DConfig()), jax.random.PRNGKey(0))
    save_checkpoint_torch_format(params, str(ckpt_dir / "unet_NV_best.pth"))
    print(f"checkpoint fabricated ({time.time()-t0:.1f}s)", flush=True)

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir),
                         compute_dtype=jnp.bfloat16)
    gen.set_inference_steps(20)
    gen.set_generation_seed(42)
    gen.batch_size = 2

    clf = LesionClassifier.random_init(num_classes=7)
    gen.set_xai_analyzer(IntegratedXAIAnalyzer(
        classifier=clf, verbose=False, ig_n_steps=8, shap_n_samples=32,
        n_bootstrap=100, n_permutations=200, with_sanity=False))
    gen.set_xai_frequency(2)

    t0 = time.time()
    result = gen.generate_images([("NV", 2)], str(work / "out"))
    print(f"generation+XAI: {result} ({time.time()-t0:.1f}s)", flush=True)
    assert result["generated"] == 2, result

    out_nv = work / "out" / "NV"
    pngs = sorted(p.name for p in out_nv.glob("*.png"))
    assert pngs == ["ISIC_0000001.png", "ISIC_0000002.png"], pngs
    meta = json.loads((out_nv / "ISIC_0000001.json").read_text())
    assert meta["noise_hash"] and meta["inference_steps"] == 20
    xai_runs = [p for p in (work / "out" / "xai_results" / "NV").glob("*_*")
                if p.is_dir()]  # the per-image summary JSON sits alongside
    assert xai_runs, "no XAI artifact dir"
    arts = {p.name for p in xai_runs[0].iterdir()}
    for required in ("analysis_results.json", "full_results.pkl",
                     "time_shap_analysis.png", "trajectory_all_steps.png"):
        assert required in arts, (required, sorted(arts)[:10])
    print(f"artifacts OK: {len(arts)} files in {xai_runs[0]}")
    print("E2E TPU CHECK PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
