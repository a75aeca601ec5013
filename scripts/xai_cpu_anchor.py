"""Torch-CPU anchor for the XAI throughput rung.

Measures the reference-shaped per-frame attribution cost on this host's
CPU with the SAME classifier topology (ResNet18, 224-square ImageNet
preprocess — `/root/reference/xai/XAI.py:357-471`) and the reference's
constants (IG n_steps=50, SHAP n_samples=512, patch 16 —
`XAI.py:240-241,1111-1175`):

  * IG: captum-style batched alpha grid (one fwd+bwd over the
    interpolated batch, `riemann_right`), extrapolated linearly from a
    probe subset of steps — cost is linear in steps on a 1-core host;
  * patch-SHAP: single-image masked forwards with a host-side Python
    patch-mask loop, exactly the reference's sampling loop shape
    (`XAI.py:1145-1175`), extrapolated from a probe subset of samples.

Same honesty framing as bench.py's sampling anchor: this host is a
starved 1-core CPU and the reference targets CUDA, so the ratio is a
sanity anchor, not a headline — quote the absolute chip figure
(BENCHMARKS.md `frame_attribution_ig50_shap512`). Weights are random:
attribution throughput is weight-independent.

Usage: python scripts/xai_cpu_anchor.py [--out artifacts/xai_cpu_anchor.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

IG_N_STEPS = 50        # reference xai/XAI.py:240
SHAP_N_SAMPLES = 512   # reference xai/XAI.py:241
PATCH = 16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/xai_cpu_anchor.json")
    ap.add_argument("--ig-probe", type=int, default=10,
                    help="alpha steps actually timed (extrapolated to 50)")
    ap.add_argument("--shap-probe", type=int, default=16,
                    help="mask samples actually timed (extrapolated to 512)")
    args = ap.parse_args()

    import torch
    import torch.nn.functional as F

    from torch_oracle.resnet18_torch import ResNet18Torch

    torch.manual_seed(0)
    model = ResNet18Torch(num_classes=7).eval()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def score(x, target: int):
        # reference preprocess: [-1,1] -> [0,1] -> 224-square -> ImageNet
        x = ((x + 1.0) / 2.0).clamp(0, 1)
        x = F.interpolate(x, size=(224, 224), mode="bilinear",
                          align_corners=False)
        logits = model((x - mean) / std)
        p = torch.softmax(logits, dim=-1)
        return torch.log(p[:, target] + 1e-8)

    frame = torch.randn(1, 3, 128, 128).clamp(-1, 1)
    baseline = torch.randn_like(frame) * 0.1

    # --- IG, captum-like batched alpha grid (riemann_right) ---
    def ig_batch(n_steps: int) -> None:
        alphas = torch.linspace(1.0 / n_steps, 1.0, n_steps).view(-1, 1, 1, 1)
        interp = (baseline + alphas * (frame - baseline)).requires_grad_(True)
        score(interp, 0).sum().backward()
        _ = interp.grad.mean(0)  # integral estimate (shape check)

    ig_batch(2)  # warm lazy allocators
    t0 = time.time()
    ig_batch(args.ig_probe)
    ig_s = (time.time() - t0) / args.ig_probe * IG_N_STEPS

    # --- patch-SHAP, the reference's per-sample host loop ---
    nph = npw = 128 // PATCH
    rng = np.random.default_rng(0)

    def shap_sample() -> None:
        masked = frame.clone()
        mask = rng.random((nph, npw)) > 0.5
        for i in range(nph):            # host-side double loop, as the
            for j in range(npw):        # reference does (XAI.py:1152-1156)
                if not mask[i, j]:      # reference zeroes where the patch
                    # mask is False (masked_image[:, :, ~full_mask] = 0,
                    # XAI.py:1160-1161) — ADVICE r4: polarity must match
                    # the cited semantics, not just the ~50% cost
                    masked[:, :, i * PATCH:(i + 1) * PATCH,
                           j * PATCH:(j + 1) * PATCH] = 0.0
        with torch.no_grad():
            score(masked, 0)

    shap_sample()  # warm
    t0 = time.time()
    for _ in range(args.shap_probe):
        shap_sample()
    shap_s = (time.time() - t0) / args.shap_probe * SHAP_N_SAMPLES

    per_frame_s = ig_s + shap_s
    cpu_per_hr = 3600.0 / per_frame_s

    # chip figure: read live from the BENCHMARKS.md row bench_suite.py
    # maintains (so a re-measured chip rate propagates instead of going
    # silently stale — ADVICE r4); the constant is the round-4 measurement,
    # used only when the row is missing, and the record says which.
    chip_per_hr, chip_src = 92134.9, "constant (round-4 BENCHMARKS.md)"
    bench_md = Path(__file__).resolve().parent.parent / "BENCHMARKS.md"
    try:
        for line in bench_md.read_text().splitlines():
            cells = [c.strip() for c in line.split("|")]
            if len(cells) > 2 and cells[1] == "frame_attribution_ig50_shap512":
                chip_per_hr = float(cells[2])
                chip_src = "BENCHMARKS.md frame_attribution_ig50_shap512 row"
                break
    except OSError:
        pass
    rec = {
        "host": "1-core CPU (starved; reference targets CUDA — sanity "
                "anchor only)",
        "config": {"ig_steps": IG_N_STEPS, "shap_samples": SHAP_N_SAMPLES,
                   "patch": PATCH, "ig_probe": args.ig_probe,
                   "shap_probe": args.shap_probe},
        "ig_s_per_frame": round(ig_s, 3),
        "shap_s_per_frame": round(shap_s, 3),
        "per_frame_s": round(per_frame_s, 3),
        "attributions_per_hr_cpu": round(cpu_per_hr, 2),
        "attributions_per_hr_chip": chip_per_hr,
        "attributions_per_hr_chip_source": chip_src,
        "chip_vs_cpu_anchor": round(chip_per_hr / cpu_per_hr, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
