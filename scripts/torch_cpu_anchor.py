#!/usr/bin/env python
"""Full-image torch-CPU baseline anchor (VERDICT r4 #6).

bench.py's `vs_baseline` ratio was extrapolated from 3 timed steps; this
script measures COMPLETE single-image generations (the reference's own
per-step loop shape, `core/generator/image_generator.py:395-438`: UNet
forward + host-side DDPM scheduler math per step, batch 1) with the torch
oracle transcription of the same architecture, and records the result in
`artifacts/torch_cpu_fullimage.json`. bench.py prefers this measured
anchor over the 3-step extrapolation when the file exists.

    python scripts/torch_cpu_anchor.py --steps 50   # ~2 min on this host
    python scripts/torch_cpu_anchor.py --steps 1000 # ~35 min on this host

Repeated runs merge into the same JSON (one entry per step count).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def time_full_image(steps: int, log=print) -> dict:
    import torch

    from torch_oracle.unet2d_torch import UNet2DTorch

    from synt_isic_tpu.diffusion.schedules import (DiffusionSchedule,
                                                   leading_timesteps)

    torch.manual_seed(0)
    model = UNet2DTorch().eval()
    schedule = DiffusionSchedule.create()
    ts = leading_timesteps(1000, steps)
    stride = 1000 // steps
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        model(x, torch.tensor([int(ts[0])]))  # warmup / allocator
        t0 = time.time()
        for k, t in enumerate(int(t) for t in ts):
            eps = model(x, torch.tensor([t]))
            # per-step DDPM ancestral update on host, like the reference
            ab_t = schedule.alphas_cumprod[t]
            prev_t = t - stride
            ab_prev = schedule.alphas_cumprod[prev_t] if prev_t >= 0 else 1.0
            x0 = ((x - float(np.sqrt(1 - ab_t)) * eps)
                  / float(np.sqrt(ab_t))).clamp(-1, 1)
            beta_cur = float(1 - ab_t / ab_prev)
            c0 = float(np.sqrt(ab_prev)) * beta_cur / float(1 - ab_t)
            ct = (float(np.sqrt(ab_t / ab_prev)) * float(1 - ab_prev)
                  / float(1 - ab_t))
            x = c0 * x0 + ct * x
            if t > 0:
                var = max(float((1 - ab_prev) / (1 - ab_t)) * beta_cur, 1e-20)
                x = x + float(np.sqrt(var)) * torch.randn_like(x)
            if (k + 1) % 50 == 0:
                el = time.time() - t0
                log(f"[torch-anchor] step {k + 1}/{steps} "
                    f"({el:.0f}s, {el / (k + 1):.2f} s/step)")
        wall = time.time() - t0
    return {"steps": steps, "seconds_per_image": round(wall, 2),
            "seconds_per_step": round(wall / steps, 4),
            "images_per_sec": round(1.0 / wall, 6),
            "batch": 1, "size": 128,
            "host": "this build host (1-core CPU)",
            "measured": time.strftime("%Y-%m-%d %H:%M:%S")}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=str(REPO / "artifacts"
                                         / "torch_cpu_fullimage.json"))
    args = ap.parse_args()
    out = Path(args.out)
    record = json.loads(out.read_text()) if out.exists() else {
        "note": "FULL single-image torch-CPU generations (not "
                "extrapolations) — reference per-step loop shape, "
                "image_generator.py:395-438; torch oracle UNet "
                "(tests/torch_oracle), batch 1, 128x128."}
    entry = time_full_image(args.steps)
    record[f"T{args.steps}"] = entry
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(record, indent=2))
    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    sys.exit(main())
