#!/usr/bin/env python
"""Per-class quality table for the full-size checkpoint FAMILY (VERDICT r4
#1/#2): one shared 7-class probe, then per-class Fréchet + consistency.

The reference's shipped artifact is seven per-class checkpoints
(`/root/reference/core/generator/model_manager.py:39`); this scores that
production shape the way `e2e_conditional.py` scores the conditional one,
so the two tables are directly comparable:

  1. train ONE probe classifier over all 7 procedural classes at the
     calibrated hardness (0.6) — with the round-5 recipe (4x data, 3x
     epochs vs round 4) targeting MEL held-out accuracy >= 0.70 so the
     flagship class is judged by a competent classifier
     (reference classifier contract: `/root/reference/xai/XAI.py:357-471`);
  2. per class: sample through the production ImageGenerator from that
     class's OWN checkpoint (DDIM-50 trailing, raw — postprocessing must
     not manufacture convergence), pixel-Fréchet vs a held-out procedural
     set with floor/ceiling anchors, probe consistency, and the absolute
     + judge-skill-relative verdicts.

Usage (real chip, after scripts/train_family.py):
    python scripts/score_family.py --checkpoints artifacts/family_full/checkpoints \
        --out artifacts/family_score.json

Tiny CPU smoke (tests/test_score_family.py):
    python scripts/score_family.py --checkpoints <tiny> --size 32 --cpu \
        --count 4 --heldout 8 --clf-per-class 8 --clf-epochs 2 --steps 4
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from e2e_loop import load_generated_images, unet_config  # noqa: E402


def train_probe(ckpt_dir: Path, classes, size: int, clf_per_class: int,
                clf_epochs: int, hard: float, seed: int,
                heldout_per_class: int = 128, log=print) -> dict:
    """Train the shared 7-class probe into `<ckpt_dir>/classifier.pth` and
    report per-class held-out accuracy (the consistency ceiling)."""
    import jax.numpy as jnp
    import numpy as np

    from synt_isic_tpu.models.classifier import (LesionClassifier,
                                                 preprocess_for_classifier)
    from synt_isic_tpu.train.data import CLASS_NAMES
    from synt_isic_tpu.train.procedural import procedural_images
    from synt_isic_tpu.train.train_classifier import (ClassifierTrainConfig,
                                                      train_classifier)

    t0 = time.time()
    imgs = np.concatenate([procedural_images(c, clf_per_class, size,
                                             seed=seed,
                                             start_index=20_000_000,
                                             hard=hard)
                           for c in classes])
    labels = np.asarray(sum(([CLASS_NAMES.index(c)] * clf_per_class
                             for c in classes), []), np.int32)
    rng = np.random.default_rng(seed + 7)
    bs = min(32, len(imgs))

    def batches(epoch):
        order = rng.permutation(len(imgs))
        for s in range(0, len(order) - bs + 1, bs):
            idx = order[s:s + bs]
            yield (preprocess_for_classifier(jnp.asarray(imgs[idx])),
                   labels[idx])

    clf_path = ckpt_dir / "classifier.pth"
    res = train_classifier(
        batches, ClassifierTrainConfig(epochs=clf_epochs, batch_size=bs,
                                       seed=seed),
        checkpoint_path=str(clf_path), log=log)
    clf, _ = LesionClassifier.from_checkpoint(str(clf_path))
    held_acc = {}
    for c in classes:
        held = procedural_images(c, heldout_per_class, size, seed=seed,
                                 start_index=30_000_000, hard=hard)
        pred = np.asarray(clf.predict(jnp.asarray(held)))
        held_acc[c] = float(np.mean(pred == CLASS_NAMES.index(c)))
    info = {"train_acc": res["best_acc"], "heldout_acc": held_acc,
            "per_class_images": clf_per_class, "epochs": clf_epochs,
            "hard": hard, "seconds": round(time.time() - t0, 1),
            "checkpoint": str(clf_path)}
    log(f"[family-score] probe: train {res['best_acc']:.3f}, held-out "
        + "  ".join(f"{c}:{a:.2f}" for c, a in held_acc.items())
        + f" ({info['seconds']}s)")
    return info


def score_family(checkpoints: str, out_path: str, classes=None,
                 size: int = 128, width: str = "full", count: int = 64,
                 heldout: int = 128, steps: int = 50, seed: int = 0,
                 clf_per_class: int = 256, clf_epochs: int = 24,
                 hard: float = 0.6, skip_probe: bool = False,
                 probe_classes=None, work_dir: str = None,
                 log=print) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.metrics.fid import PixelFeatureExtractor, compute_fid
    from synt_isic_tpu.models.classifier import LesionClassifier
    from synt_isic_tpu.train.data import CLASS_NAMES
    from synt_isic_tpu.train.procedural import procedural_images

    ckpt_dir = Path(checkpoints)
    have = sorted(p.name[5:-9] for p in ckpt_dir.glob("unet_*_best.pth")
                  if p.name != "unet_conditional_best.pth")
    classes = classes or have
    missing = [c for c in classes if c not in have]
    if missing:
        raise FileNotFoundError(
            f"family incomplete: no unet_<C>_best.pth for {missing} in "
            f"{ckpt_dir} — run scripts/train_family.py first")
    cfg = unet_config(size, width)
    report: dict = {"checkpoints_dir": str(ckpt_dir), "classes": classes,
                    "size": size, "width": width, "count": count,
                    "steps": steps, "seed": seed,
                    "started": time.strftime("%Y-%m-%d %H:%M:%S")}

    # --- 1. the shared probe ------------------------------------------------
    clf_path = ckpt_dir / "classifier.pth"
    if skip_probe and clf_path.exists():
        clf, _ = LesionClassifier.from_checkpoint(str(clf_path))
        held_acc = {}
        for c in classes:
            h = procedural_images(c, 128, size, seed=seed,
                                  start_index=30_000_000, hard=hard)
            pred = np.asarray(clf.predict(jnp.asarray(h)))
            held_acc[c] = float(np.mean(pred == CLASS_NAMES.index(c)))
        report["probe"] = {"reused": str(clf_path), "heldout_acc": held_acc,
                           "hard": hard}
    else:
        # the probe is SHARED across the family: train it over the full
        # taxonomy (probe_classes, default: every checkpoint on disk) even
        # when scoring a subset — a probe trained on one class is a
        # degenerate always-that-class judge and its consistency numbers
        # are meaningless (observed live when the round-5 wedge-recovery
        # split ran the probe with classes=[MEL])
        report["probe"] = train_probe(ckpt_dir, probe_classes or have, size,
                                      clf_per_class, clf_epochs, hard, seed,
                                      log=log)
        clf, _ = LesionClassifier.from_checkpoint(str(clf_path))
        held_acc = {c: report["probe"]["heldout_acc"][c] for c in classes}

    # --- 2. per-class sampling + metrics ------------------------------------
    pix = PixelFeatureExtractor()

    def frechet(a, b):
        return float(compute_fid(a, b, extractor=pix))

    work = Path(work_dir or (Path(out_path).parent / "family_score_samples"))
    rng = np.random.default_rng(seed)
    per_class: dict = {}
    for c in classes:
        held = procedural_images(c, heldout, size, seed=seed,
                                 start_index=10_000_000)
        noise = rng.standard_normal(held.shape).astype(np.float32).clip(-1, 1)
        floor = frechet(
            procedural_images(c, heldout, size, seed=seed), held)
        ceiling = frechet(noise, held)

        gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=cfg,
                             compute_dtype=jnp.bfloat16)
        gen.scheduler_kind = "ddim"
        gen.timestep_spacing = "trailing"
        gen.set_inference_steps(steps)
        gen.set_generation_seed(seed + 1)
        gen.batch_size = min(count, 64)
        gen.set_save_trajectory(False)
        run_dir = work / c
        t0 = time.time()
        result = gen.generate_images([(c, count)], str(run_dir),
                                     postprocess=False)
        if "error" in result:
            raise RuntimeError(f"{c} sampling failed: {result['error']}")
        samples = load_generated_images(run_dir / c, count)
        f = frechet(samples, held)
        pred = np.asarray(clf.predict(jnp.asarray(samples)))
        cons = float(np.mean(pred == CLASS_NAMES.index(c)))
        per_class[c] = {
            "frechet_vs_heldout": round(f, 4),
            "floor_train_vs_heldout": round(floor, 4),
            "ceiling_noise_vs_heldout": round(ceiling, 4),
            # strict e2e bar: an order of magnitude under the garbage
            # ceiling on RAW samples (same as e2e_loop model_converged)
            "quality_bar": round(0.1 * ceiling, 4),
            "model_converged": bool(f < 0.1 * ceiling),
            "class_consistency": round(cons, 4),
            # absolute bar (VERDICT r4 #2: MEL must pass THIS one, with a
            # probe competent enough that the bar is meaningful)
            "consistency_absolute_ok": bool(cons >= 0.70),
            "consistency_vs_judge_skill": (
                round(cons / held_acc[c], 3) if held_acc[c] > 0 else None),
            "probe_heldout_acc": round(held_acc[c], 4),
            "img_per_s": result.get("images_per_second"),
            "seconds": round(time.time() - t0, 1),
        }
        log(f"[family-score] {c}: F={f:.2f} (bar {0.1 * ceiling:.2f}) "
            f"cons={cons:.2f} (probe {held_acc[c]:.2f}) "
            f"{result.get('images_per_second')} img/s")

    report["per_class"] = per_class
    report["family_converged"] = bool(
        all(v["model_converged"] for v in per_class.values()))
    report["family_consistent_absolute"] = bool(
        all(v["consistency_absolute_ok"] for v in per_class.values()))
    report["probe_competent"] = bool(
        all(a >= 0.70 for a in held_acc.values()))
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    log(f"[family-score] report -> {out}")
    print(json.dumps({
        "family_converged": report["family_converged"],
        "family_consistent_absolute": report["family_consistent_absolute"],
        "probe_competent": report["probe_competent"],
        "frechet": {c: v["frechet_vs_heldout"] for c, v in per_class.items()},
        "consistency": {c: v["class_consistency"]
                        for c, v in per_class.items()}}))
    return report


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--out", default="artifacts/family_score.json")
    p.add_argument("--classes", default=None,
                   help="comma list; default: every unet_*_best.pth found")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--width", choices=("quarter", "full"), default="full")
    p.add_argument("--count", type=int, default=64)
    p.add_argument("--heldout", type=int, default=128)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clf-per-class", type=int, default=256)
    p.add_argument("--clf-epochs", type=int, default=24)
    p.add_argument("--clf-hard", type=float, default=0.6)
    p.add_argument("--probe-classes", default=None,
                   help="classes the SHARED probe trains over (default: "
                        "every checkpoint on disk) — keep this the full "
                        "taxonomy even when --classes scores a subset")
    p.add_argument("--skip-probe", action="store_true",
                   help="reuse an existing classifier.pth instead of "
                        "retraining the probe")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    # fresh per-class processes (the wedge-recovery pattern) must not pay
    # the multi-minute DDIM-50 sampler recompile every time
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()
    classes = ([c.strip() for c in args.classes.split(",") if c.strip()]
               if args.classes else None)
    report = score_family(
        args.checkpoints, args.out, classes=classes, size=args.size,
        width=args.width, count=args.count, heldout=args.heldout,
        steps=args.steps, seed=args.seed, clf_per_class=args.clf_per_class,
        clf_epochs=args.clf_epochs, hard=args.clf_hard,
        skip_probe=args.skip_probe,
        probe_classes=([c.strip() for c in args.probe_classes.split(",")
                        if c.strip()] if args.probe_classes else None))
    return 0 if report["family_converged"] else 1


if __name__ == "__main__":
    sys.exit(main())
