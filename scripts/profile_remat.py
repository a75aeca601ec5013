"""Remat-mode x batch-size sweep for the flagship training step on chip.

Round-3 measured full remat at b64 as a net LOSS (36 img/s vs 202 at
b32/no-remat) and b64-without-remat OOMs the 16G chip. The policy modes
(models/unet2d.py `remat`) are finer trades:

  hires — recompute only the two highest-resolution blocks (largest
          activations, ~half the saved bytes for ~a quarter of the
          recompute FLOPs of "all")
  attn  — recompute only attention-bearing blocks
  dots  — jax.checkpoint_policies.dots_with_no_batch_dims_saveable over
          every block: matmul outputs stay resident, elementwise/norm
          intermediates recompute

This sweep answers: does any (mode, batch) beat the b32/no-remat champion
on steady-state img/s? Inputs vary per step (the tunnel coalesces
byte-identical dispatches) and stay device-resident.

Run: python scripts/profile_remat.py [--steps 30] [--out artifacts/remat_sweep.json]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

from synt_isic_tpu.train.benchmark import measure_train_step

# (remat_mode, batch) grid: the champion config first as the reference row.
GRID = [
    (False, 32),
    (False, 48),
    ("dots", 32),
    ("dots", 64),
    ("hires", 48),
    ("hires", 64),
    ("attn", 64),
    (True, 64),          # the round-3 loser, re-measured for the record
]


def measure(mode, batch, steps, size=128):
    # one shared harness with bench.py's train rung (train/benchmark.py)
    row = measure_train_step(mode, batch, steps, size=size)
    return dict(row, sec_per_step=round(row["sec_per_step"], 4),
                img_per_s=round(row["img_per_s"], 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--grid", default=None, metavar="SPEC",
                   help="comma list of mode:batch (e.g. 'none:32,dots:64') "
                        "instead of the default sweep")
    p.add_argument("--out", default="artifacts/remat_sweep.json")
    args = p.parse_args()

    grid = GRID
    if args.grid:
        grid = []
        for spec in args.grid.split(","):
            m, b = spec.split(":")
            grid.append((False if m == "none" else (True if m == "all" else m),
                         int(b)))

    rows = []
    for mode, batch in grid:
        label = mode if isinstance(mode, str) else ("all" if mode else "none")
        try:
            row = measure(mode, batch, args.steps, size=args.size)
            print(f"remat={label:>5} b{batch}: {row['sec_per_step']*1000:7.1f} ms/step "
                  f"{row['img_per_s']:7.1f} img/s "
                  f"peak={row.get('peak_bytes_in_use', 0)/2**30:.1f}G", flush=True)
        except Exception as exc:  # XlaRuntimeError OOM etc. — record, move on
            row = {"remat": label, "batch": batch, "error": str(exc)[:200]}
            print(f"remat={label:>5} b{batch}: FAILED — {str(exc)[:120]}", flush=True)
        rows.append(row)
        # drop the config's donated state/executable references before the
        # next rung — an OOM'd rung must not pin HBM into its successors
        import gc
        gc.collect()

    ok = [r for r in rows if "img_per_s" in r]
    best = max(ok, key=lambda r: r["img_per_s"]) if ok else None
    report = {"grid": rows, "best": best, "size": args.size,
              "note": "steady-state donated train step, device-resident "
                      "varying inputs, flagship full-width topology"}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({"remat_sweep": "ok", "best": best}))


if __name__ == "__main__":
    main()
