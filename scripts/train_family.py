#!/usr/bin/env python
"""Train the full-size PER-CLASS checkpoint family (VERDICT r4 #1).

The reference's shipped artifact is seven per-class checkpoints
(`/root/reference/core/generator/model_manager.py:39` glob
`unet_*_best.pth`; `core/cache/metadata/cache_metadata.json:61` — 7 models,
~101 MB each).  Round 4 exercised that production shape at full width for
ONE class (MEL, `artifacts/e2e_loop_full`).  This script completes the
family: it trains each requested class with the exact flagship recipe the
MEL run used (384 imgs x 1000 epochs, EMA, cosine LR, min-SNR-5, offset
noise, deterministic-probe best selection) into ONE shared checkpoints
dir, so `parity_gauntlet.py` and `score_family.py` can run across all 7.

Crash-safe / resumable by design: a class whose `unet_<CLASS>_best.pth`
already exists is skipped (its color-statistics entry is still ensured),
and `--resume` continues a killed class from its `train_state_<CLASS>.npz`
optimizer snapshot.  The per-class report is appended to
`<out>/family_train.json` after EVERY class, not at the end.

Usage (real chip, ~41 min/class at full width):
    python scripts/train_family.py --out artifacts/family_full \
        --classes MEL,NV,BCC,AKIEC,BKL,DF,VASC --width full --resume

Tiny CPU smoke (tests/test_train_family.py):
    python scripts/train_family.py --out <tmp> --classes MEL,NV --size 32 \
        --train-images 8 --epochs 2 --batch 4 --cpu
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from e2e_loop import unet_config  # noqa: E402  (same flagship topology)


def train_family(out_dir: str, classes, size: int = 128,
                 train_images: int = 384, epochs: int = 1000,
                 batch_size: int = 32, width: str = "full", seed: int = 0,
                 resume: bool = False, force: bool = False,
                 log=print) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synt_isic_tpu.io.color_stats import update_color_statistics_file
    from synt_isic_tpu.models.unet2d import UNet2D
    from synt_isic_tpu.train.procedural import ProceduralDataset
    from synt_isic_tpu.train.train_ddpm import (TrainConfig,
                                                dataset_color_statistics,
                                                train_class)

    out = Path(out_dir)
    ckpt_dir = out / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    report_path = out / "family_train.json"
    report: dict = (json.loads(report_path.read_text())
                    if report_path.exists() else {})
    report.setdefault("config", {
        "size": size, "width": width, "train_images": train_images,
        "epochs": epochs, "batch": batch_size, "seed": seed})
    report.setdefault("classes", {})

    on_accel = jax.devices()[0].platform != "cpu"
    cfg = unet_config(size, width)
    stats_path = ckpt_dir / "color_statistics.json"

    def save():
        report_path.write_text(json.dumps(report, indent=2))

    trained_now = []
    for class_name in classes:
        best = ckpt_dir / f"unet_{class_name}_best.pth"
        have_stats = False
        if stats_path.exists():
            have_stats = class_name in json.loads(stats_path.read_text())
        # a lingering optimizer snapshot means the class was INTERRUPTED
        # mid-train (clean completions delete it below) — the best file on
        # disk is then only a periodic snapshot, not the finished model:
        # fall through to train_class(resume=...) instead of skipping
        interrupted = (ckpt_dir / f"train_state_{class_name}.npz").exists()
        if best.exists() and not force and not interrupted:
            log(f"[family:{class_name}] checkpoint exists — skipping train")
            entry = report["classes"].setdefault(
                class_name, {"skipped_existing": True})
            if not have_stats:
                dataset = ProceduralDataset(class_name, train_images, size,
                                            seed=seed)
                stats = dataset_color_statistics(dataset)
                if stats is not None:
                    update_color_statistics_file(stats_path, class_name, stats)
                    log(f"[family:{class_name}] color stats backfilled")
            entry["checkpoint"] = str(best)
            save()
            continue

        t0 = time.time()
        dataset = ProceduralDataset(class_name, train_images, size,
                                    seed=seed, device=on_accel)
        fused = on_accel
        model = UNet2D(config=cfg, dtype=jnp.bfloat16,
                       use_fused_attention=fused, fast_norm=fused)
        tcfg = TrainConfig(
            image_size=size, batch_size=min(batch_size, train_images),
            epochs=epochs, ema_decay=0.9995, seed=seed,
            learning_rate=2e-4, lr_schedule="cosine", warmup_steps=500,
            min_snr_gamma=5.0, eval_every=25, eval_probe_images=16,
            eval_t_points=8, offset_noise=0.05,
            snapshot_every=max(5, epochs // 6))
        result = train_class(class_name, dataset, str(ckpt_dir), tcfg,
                             model=model, resume=resume, log=log)
        dt = time.time() - t0
        report["classes"][class_name] = {
            "best_loss": result["best_loss"],
            "best_val": result.get("best_val"),
            "steps": result["steps"],
            "first_epoch_loss": result["history"][0],
            "last_epoch_loss": result["history"][-1],
            "seconds": round(dt, 1),
            "checkpoint": str(best),
        }
        save()
        log(f"[family:{class_name}] done in {dt / 60:.1f} min "
            f"(loss {result['history'][0]:.4f} -> "
            f"{result['history'][-1]:.4f}, best {result['best_loss']:.4g})")
        # the resume snapshot is ~3x the checkpoint size (params + opt
        # state + EMA); drop it once the class completed cleanly
        resume_snap = ckpt_dir / f"train_state_{class_name}.npz"
        if resume_snap.exists():
            resume_snap.unlink()
        trained_now.append(class_name)

    have = sorted(p.name[5:-9] for p in ckpt_dir.glob("unet_*_best.pth"))
    report["family_complete"] = all(
        (ckpt_dir / f"unet_{c}_best.pth").exists() for c in classes)
    log(f"[family] {len(have)} checkpoints on disk ({', '.join(have)}); "
        f"trained this run: {trained_now or 'none'}")
    save()
    return report


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", default="artifacts/family_full")
    p.add_argument("--classes", default="MEL,NV,BCC,AKIEC,BKL,DF,VASC")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--train-images", type=int, default=384)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--width", choices=("quarter", "full"), default="full")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="continue a killed class from its optimizer snapshot")
    p.add_argument("--force", action="store_true",
                   help="retrain classes whose checkpoint already exists")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        # env alone is overridden by the axon TPU plugin; the config API
        # wins (same pattern as e2e_loop.py --cpu)
        import jax

        jax.config.update("jax_platforms", "cpu")
    # the axon tunnel has been observed to wedge a long-lived client stream
    # mid-class (chip healthy for new clients, trainer hung in a futex) —
    # recovery is kill + --resume, so make restarts cheap: the persistent
    # compile cache turns the ~8 min full-width epoch-scan recompile into
    # a sub-minute cache hit (scripts/train_family_babysit.sh automates
    # the watchdog loop)
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()
    report = train_family(
        args.out, [c.strip() for c in args.classes.split(",") if c.strip()],
        size=args.size, train_images=args.train_images, epochs=args.epochs,
        batch_size=args.batch, width=args.width, seed=args.seed,
        resume=args.resume, force=args.force)
    return 0 if report.get("family_complete") else 1


if __name__ == "__main__":
    sys.exit(main())
