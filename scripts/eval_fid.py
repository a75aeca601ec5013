"""FID-style evaluation between two image sets (or checkpoint generations).

Usage:
  python scripts/eval_fid.py --a data/real/NV --b generated_images/NV
  python scripts/eval_fid.py --a data/real/NV --generate NV --count 256
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from synt_isic_tpu.metrics.fid import FeatureExtractor, compute_fid
from synt_isic_tpu.models.classifier import LesionClassifier


def load_dir(directory: str, limit: int) -> np.ndarray:
    from PIL import Image

    paths = (sorted(Path(directory).rglob("*.png")) +
             sorted(Path(directory).rglob("*.jpg")))[:limit]
    if not paths:
        raise SystemExit(f"no images in {directory}")
    out = []
    for p in paths:
        arr = np.asarray(Image.open(p).convert("RGB").resize((128, 128)),
                         dtype=np.float32) / 255.0
        out.append(arr * 2 - 1)
    return np.stack(out)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True, help="first image dir")
    p.add_argument("--b", help="second image dir")
    p.add_argument("--generate", help="generate set B for this class instead")
    p.add_argument("--checkpoints", default="checkpoints")
    p.add_argument("--count", type=int, default=256)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    a = load_dir(args.a, args.count)
    if args.b:
        b = load_dir(args.b, args.count)
    elif args.generate:
        from synt_isic_tpu.model_manager import ModelManager

        mm = ModelManager(checkpoints_dir=args.checkpoints)
        if not mm.load_model(args.generate):
            raise SystemExit(f"no checkpoint for {args.generate}")
        sampler = mm.create_sampler(args.steps, scheduler="ddim")
        rng = np.random.default_rng(args.seed)
        chunks = []
        done = 0
        while done < args.count:
            n = min(64, args.count - done)
            seeds = rng.integers(0, 2**31 - 1, n).astype(np.uint32)
            chunks.append(np.asarray(
                sampler.sample(mm.loaded_params[args.generate], seeds)["images"]))
            done += n
        b = np.concatenate(chunks)
    else:
        raise SystemExit("provide --b or --generate")

    inception_path = Path(args.checkpoints) / "inception_v3.pth"
    if inception_path.exists():
        from synt_isic_tpu.metrics.fid import InceptionFeatureExtractor
        fid = compute_fid(a, b, InceptionFeatureExtractor(str(inception_path)))
        print(f"FID (standard InceptionV3 pool3): {fid:.4f}  "
              f"(n_a={len(a)}, n_b={len(b)})")
        return 0
    clf_path = Path(args.checkpoints) / "classifier.pth"
    clf = (LesionClassifier.from_checkpoint(str(clf_path))[0]
           if clf_path.exists() else LesionClassifier.random_init())
    fid = compute_fid(a, b, FeatureExtractor(clf))
    print(f"frechet_distance (classifier-feature embedding, NOT Inception-FID; "
          f"add checkpoints/inception_v3.pth via scripts/convert_inception.py "
          f"for standard FID): {fid:.4f}  (n_a={len(a)}, n_b={len(b)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
