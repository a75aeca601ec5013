"""Quickstart tour of the framework's Python API.

Runs anywhere (CPU or TPU) by fabricating a small random-weight checkpoint
when none exists; with real `unet_<CLASS>_best.pth` checkpoints in
`checkpoints/`, point `--checkpoints` there and skip fabrication.

  python examples/quickstart.py [--checkpoints DIR] [--steps 20]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from synt_isic_tpu import ImageGenerator, create_integrated_xai_analyzer
    from synt_isic_tpu.models.unet2d import (UNet2D, UNet2DConfig,
                                             init_unet_params)
    from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()

    work = Path(args.out) if args.out else Path(tempfile.mkdtemp(prefix="synt_"))
    ckpt_dir = Path(args.checkpoints) if args.checkpoints else work / "checkpoints"

    # 1. checkpoints: use real ones if present, else fabricate a random UNet
    if not any(ckpt_dir.glob("unet_*_best.pth")):
        print(f"[1] fabricating a random-weight checkpoint in {ckpt_dir}")
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        import jax
        params = init_unet_params(UNet2D(config=UNet2DConfig()),
                                  jax.random.PRNGKey(0))
        save_checkpoint_torch_format(params, str(ckpt_dir / "unet_NV_best.pth"))
    else:
        print(f"[1] using checkpoints in {ckpt_dir}")

    # 2. batched generation with the reference's seed discipline
    print("[2] generating 2 images (fixed seed 42)")
    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir),
                         compute_dtype=jnp.bfloat16)
    gen.set_inference_steps(args.steps)
    gen.set_generation_seed(42)
    gen.batch_size = 2
    cls = gen.get_available_classes()[0]
    result = gen.generate_images([(cls, 2)], str(work / "generated"))
    print(f"    -> {result}")

    # 3. integrated XAI on the captured trajectory
    print("[3] integrated XAI (reduced budgets for the demo)")
    gen.set_xai_analyzer(create_integrated_xai_analyzer(
        ig_n_steps=8, shap_n_samples=32, n_bootstrap=100, n_permutations=200,
        with_sanity=False, verbose=False))
    gen.set_xai_frequency(1)
    gen.generate_images([(cls, 1)], str(work / "generated_xai"))
    xai_dirs = list((work / "generated_xai" / "xai_results" / cls).glob("*_*"))
    print(f"    -> artifacts in {xai_dirs[0] if xai_dirs else '??'}")

    # 4. fairness audit over the generated pool
    print("[4] fairness audit (heuristic phototype split)")
    from PIL import Image

    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.xai.fairness import FairnessAuditor, estimate_phototype_mask

    imgs = []
    for p in sorted((work / "generated").rglob("*.png")):
        arr = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        imgs.append(arr * 2 - 1)
    images = np.stack(imgs * 8)  # replicate for a larger demo pool
    clf = LesionClassifier.random_init()
    auditor = FairnessAuditor(clf)
    report = auditor.audit(images, estimate_phototype_mask(images))
    print(f"    -> verdict: {report['verdict']}")

    # 5. serving: hot models behind a TCP protocol
    print("[5] serving (ephemeral port, one request, shutdown)")
    from synt_isic_tpu.serve import GenerationServer, request

    gen.set_xai_analyzer(None)  # serve plain generation

    server = GenerationServer(gen, port=0,
                              output_root=str(work / "serve")).start()
    host, port = server.address
    reply = request(host, port, {"op": "generate", "class": cls, "count": 1,
                                 "seed": 7})
    print(f"    -> {reply['files']}")
    server.stop()

    print(f"done. outputs in {work}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
