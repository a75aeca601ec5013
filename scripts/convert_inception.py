"""Produce `checkpoints/inception_v3.pth` for standard Inception-FID.

Run this ON A MACHINE WITH EGRESS + torchvision (this build environment
has neither); copy the resulting file into `checkpoints/` here. The FID
module (`synt_isic_tpu/metrics/fid.py`) picks it up automatically and
switches from the classifier-feature fallback to standard pool3 FID.

    python scripts/convert_inception.py [--out checkpoints/inception_v3.pth]

The file is a plain torchvision `inception_v3` state dict; the Flax loader
(`models/inception_v3.load_inception_params`) validates every key/shape
against its vendored manifest before converting, so a wrong file cannot
load silently.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/inception_v3.pth")
    args = ap.parse_args()

    try:
        import torch
        import torchvision
    except ImportError as exc:
        print(f"needs torch + torchvision ({exc}); run where they are "
              f"installed and copy the output here")
        return 1

    model = torchvision.models.inception_v3(
        weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save(model.state_dict(), out)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")

    # sanity: the Flax loader must accept it
    try:
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from synt_isic_tpu.models.inception_v3 import load_inception_params
        load_inception_params(str(out))
        print("manifest validation: ok")
    except Exception as exc:
        print(f"manifest validation FAILED: {exc}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
