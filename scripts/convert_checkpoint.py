"""Checkpoint conversion utility: torch `.pth` <-> converted flax `.npz`.

Useful for shipping pre-converted parameter archives (skip the zip-pickle
parse + transposes at load time) or exporting flax-trained weights back to
the torch format the reference app consumes.

Usage:
  python scripts/convert_checkpoint.py to-npz checkpoints/unet_NV_best.pth
  python scripts/convert_checkpoint.py to-pth unet_NV_best.npz out.pth
  python scripts/convert_checkpoint.py inspect checkpoints/unet_NV_best.pth
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from synt_isic_tpu.io.convert import flax_to_torch, torch_to_flax
from synt_isic_tpu.io.pth import load_pth, save_pth
from synt_isic_tpu.model_manager import _flatten, _unflatten


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["to-npz", "to-pth", "inspect"])
    p.add_argument("src")
    p.add_argument("dst", nargs="?")
    args = p.parse_args()
    src = Path(args.src)

    if args.mode == "inspect":
        state = load_pth(str(src))
        total = 0
        for key, arr in state.items():
            print(f"  {key:60s} {str(arr.shape):>20s} {arr.dtype}")
            total += int(np.prod(arr.shape))
        print(f"{len(state)} tensors, {total / 1e6:.2f} M parameters")
        return 0

    if args.mode == "to-npz":
        dst = Path(args.dst) if args.dst else src.with_suffix(".npz")
        tree = torch_to_flax(load_pth(str(src)))
        np.savez(dst, **_flatten(tree))
        print(f"wrote {dst}")
        return 0

    dst = Path(args.dst) if args.dst else src.with_suffix(".pth")
    with np.load(src) as data:
        tree = _unflatten({k: data[k] for k in data.files})
    save_pth(flax_to_torch(tree), str(dst))
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
