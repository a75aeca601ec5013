"""Per-class color statistics + postprocessing.

Parity with the reference's two postprocessing variants:
  * GUI engine: mean/std matching with scale clipped to [0.6, 1.4] and
    alpha=0.35 blend with the original
    (`core/generator/image_generator.py:502-545`);
  * console engine: plain mean shift
    (`diffusion/console_generator_server.py:129-168`).
Statistics come from `checkpoints/color_statistics.json` keyed by class with
`{"rgb": {"mean": [r,g,b], "std": [r,g,b]}}` (`image_generator.py:142-170`).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def load_color_statistics(path) -> Dict[str, Any]:
    p = Path(path)
    if not p.exists():
        return {}
    try:
        with open(p, "r", encoding="utf-8") as f:
            return json.load(f)
    except Exception:
        return {}


def apply_color_postprocessing(img_uint8: np.ndarray, stats: Optional[Dict[str, Any]],
                               alpha: float = 0.35,
                               scale_clip=(0.6, 1.4)) -> np.ndarray:
    """Moment-matching variant (GUI engine). img_uint8: (H,W,3) uint8."""
    if not stats or "rgb" not in stats or "mean" not in stats.get("rgb", {}):
        return img_uint8
    rgb = stats["rgb"]
    target_mean = np.asarray(rgb.get("mean", [128, 128, 128]), dtype=np.float32)
    target_std = np.asarray(rgb.get("std", [50, 50, 50]), dtype=np.float32)
    arr = img_uint8.astype(np.float32)
    current_mean = arr.mean(axis=(0, 1))
    current_std = np.maximum(arr.std(axis=(0, 1)), 1e-6)
    scale = np.clip(target_std / current_std, scale_clip[0], scale_clip[1])
    shifted = (arr - current_mean) * scale + target_mean
    blended = alpha * shifted + (1.0 - alpha) * arr
    return np.clip(blended, 0, 255).astype(np.uint8)


def apply_mean_shift_postprocessing(img_uint8: np.ndarray,
                                    stats: Optional[Dict[str, Any]]) -> np.ndarray:
    """Mean-shift-only variant (console engine)."""
    if not stats or "rgb" not in stats or "mean" not in stats.get("rgb", {}):
        return img_uint8
    target_mean = np.asarray(stats["rgb"]["mean"], dtype=np.float32)
    arr = img_uint8.astype(np.float32)
    correction = target_mean - arr.mean(axis=(0, 1))
    return np.clip(arr + correction, 0, 255).astype(np.uint8)
