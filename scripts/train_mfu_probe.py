#!/usr/bin/env python
"""Measured train-step MFU artifact (VERDICT r4 #3).

One number pair: the steady-state jitted train step's wall time and XLA's
own cost analysis of that exact HLO (fwd + bwd + adam + min-SNR + EMA —
not a fwd-times-3 approximation), over the chip's dense-bf16 peak.
Writes artifacts/train_mfu.json; bench.py emits the same figure as
`train_mfu_pct` (reference anchor: the AMP train loop this replaces,
`/root/reference/diffusion/train_diffusion.py:219-245`).

    python scripts/train_mfu_probe.py [--batch 32] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--out", default=str(REPO / "artifacts/train_mfu.json"))
    args = p.parse_args()

    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from synt_isic_tpu.train.benchmark import measure_train_step
    from synt_isic_tpu.utils.compute import TPU_PEAKS

    r = measure_train_step(False, args.batch, args.steps)
    entry = TPU_PEAKS.get(jax.devices()[0].device_kind)
    if entry and r.get("flops_per_step"):
        r["train_mfu_pct"] = round(
            r["flops_per_step"] / r["sec_per_step"] / entry[0] * 100, 1)
        r["chip_peak_flops"] = entry[0]
        r["device_kind"] = jax.devices()[0].device_kind
    Path(args.out).write_text(json.dumps(r, indent=2))
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
