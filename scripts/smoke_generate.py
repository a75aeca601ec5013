"""Smoke sampler: N images per available class, minimal dependencies.

Rebuild of reference `diffusion/generate_test.py` (whole file): iterate the
available class checkpoints (best or epoch-selected), run the sampler, save
PNGs — the quickest end-to-end visual check of a checkpoint set.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from synt_isic_tpu.diffusion.sampler import to_uint8_images
from synt_isic_tpu.io.images import save_image
from synt_isic_tpu.model_manager import ModelManager


def main() -> int:
    p = argparse.ArgumentParser(description="per-class smoke generation")
    p.add_argument("--checkpoints", default="checkpoints")
    p.add_argument("--output", default="test_generated")
    p.add_argument("--samples", type=int, default=4)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--epoch", type=int, default=None,
                   help="load unet_<CLASS>_epoch<N>.pth instead of best")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    mm = ModelManager(checkpoints_dir=args.checkpoints)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    classes = mm.get_available_classes()
    if not classes:
        print(f"no checkpoints found in {args.checkpoints}")
        return 1
    print(f"classes: {classes}")

    for cls in classes:
        ckpt = None
        if args.epoch is not None:
            cand = Path(args.checkpoints) / f"unet_{cls}_epoch{args.epoch}.pth"
            ckpt = str(cand) if cand.exists() else None
        if not mm.load_model(cls, checkpoint_path=ckpt):
            print(f"  {cls}: load failed, skipping")
            continue
        sampler = mm.create_sampler(args.steps)
        seeds = (np.arange(args.samples) + args.seed * 1000).astype(np.uint32)
        t0 = time.time()
        out = sampler.sample(mm.loaded_params[cls], seeds)
        images = to_uint8_images(out["images"])
        for i in range(args.samples):
            from PIL import Image
            save_image(Image.fromarray(images[i]),
                       str(out_dir / f"{cls}_sample{i}.png"))
        print(f"  {cls}: {args.samples} samples in {time.time() - t0:.1f}s")
        mm.unload_model(cls)
    return 0


if __name__ == "__main__":
    sys.exit(main())
