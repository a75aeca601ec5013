#!/usr/bin/env python
"""Re-judge family consistency from saved samples + merge per-class reports.

Why this exists: the round-5 wedge-recovery pattern ran `score_family.py`
once per class in fresh processes. Before `--probe-classes` existed, each
run retrained the SHARED probe on its own single class — a degenerate
always-that-class judge (MEL probe "1.00", every other class "0.00").
The per-class Fréchet numbers are sound (no classifier involved) and every
run's samples persist under `family_score_samples/<CLASS>/`, so the fix is:

  1. retrain the shared probe ONCE over the full taxonomy
     (`train_probe`, the round-5 recipe: 256 img/class x 24 epochs,
     hard 0.6, target MEL held-out >= 0.70);
  2. reclassify the SAVED samples per class (no resampling — the
     generation evidence is untouched);
  3. merge the per-class `family_score_<C>.json` reports into the single
     `family_score.json` the round artifacts expect, with consistency,
     probe accuracy, and the absolute + skill-relative verdicts rebuilt
     from the competent probe.

Usage:
    python scripts/rescore_family_consistency.py \
        --checkpoints artifacts/family_full/checkpoints \
        --samples artifacts/family_score_samples \
        --reports 'artifacts/family_score_{C}.json' \
        --out artifacts/family_score.json
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from e2e_loop import load_generated_images  # noqa: E402

CLASSES = ["MEL", "NV", "BCC", "AKIEC", "BKL", "DF", "VASC"]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--samples", default="artifacts/family_score_samples")
    p.add_argument("--reports", default="artifacts/family_score_{C}.json")
    p.add_argument("--out", default="artifacts/family_score.json")
    p.add_argument("--classes", default=",".join(CLASSES))
    p.add_argument("--clf-per-class", type=int, default=256)
    p.add_argument("--clf-epochs", type=int, default=24)
    p.add_argument("--clf-hard", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-probe", action="store_true",
                   help="reuse classifier.pth (must already be the "
                        "full-taxonomy probe)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from score_family import train_probe
    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.train.data import CLASS_NAMES

    classes = [c.strip() for c in args.classes.split(",") if c.strip()]
    ckpt_dir = Path(args.checkpoints)
    clf_path = ckpt_dir / "classifier.pth"

    if args.skip_probe and clf_path.exists():
        probe_info = {"reused": str(clf_path)}
    else:
        probe_info = train_probe(ckpt_dir, classes, 128, args.clf_per_class,
                                 args.clf_epochs, args.clf_hard, args.seed)
    clf, _ = LesionClassifier.from_checkpoint(str(clf_path))
    held_acc = probe_info.get("heldout_acc")
    if held_acc is None:
        from synt_isic_tpu.train.procedural import procedural_images

        held_acc = {}
        for c in classes:
            held = procedural_images(c, 128, 128, seed=args.seed,
                                     start_index=30_000_000,
                                     hard=args.clf_hard)
            pred = np.asarray(clf.predict(jnp.asarray(held)))
            held_acc[c] = float(np.mean(pred == CLASS_NAMES.index(c)))
        probe_info["heldout_acc"] = held_acc

    merged: dict = {"checkpoints_dir": str(ckpt_dir), "classes": classes,
                    "probe": probe_info,
                    "merged_from": args.reports,
                    "note": ("per-class Frechet from the split runs "
                             "(classifier-free, still valid); consistency "
                             "re-judged on the SAVED samples by the "
                             "full-taxonomy probe — see module docstring"),
                    "rescored": time.strftime("%Y-%m-%d %H:%M:%S"),
                    "per_class": {}}
    for c in classes:
        rp = Path(args.reports.replace("{C}", c))
        entry = json.loads(rp.read_text())["per_class"][c]
        # score_family passes work/<C> as the run dir and the generator
        # nests per-class subdirs, so samples land at work/<C>/<C>/
        samples = load_generated_images(Path(args.samples) / c / c,
                                        entry.get("count", 64) or 64)
        pred = np.asarray(clf.predict(jnp.asarray(samples)))
        cons = float(np.mean(pred == CLASS_NAMES.index(c)))
        entry["class_consistency"] = round(cons, 4)
        entry["probe_heldout_acc"] = round(held_acc[c], 4)
        entry["consistency_absolute_ok"] = bool(cons >= 0.70)
        entry["consistency_vs_judge_skill"] = (
            round(cons / held_acc[c], 3) if held_acc[c] > 0 else None)
        merged["per_class"][c] = entry
        print(f"[rescore] {c}: F={entry['frechet_vs_heldout']} "
              f"cons={cons:.2f} (probe {held_acc[c]:.2f})")

    pc = merged["per_class"]
    merged["family_converged"] = bool(
        all(v["model_converged"] for v in pc.values()))
    merged["family_consistent_absolute"] = bool(
        all(v["consistency_absolute_ok"] for v in pc.values()))
    merged["probe_competent"] = bool(
        all(held_acc[c] >= 0.70 for c in classes))
    Path(args.out).write_text(json.dumps(merged, indent=2))
    print(json.dumps({
        "family_converged": merged["family_converged"],
        "family_consistent_absolute": merged["family_consistent_absolute"],
        "probe_competent": merged["probe_competent"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
