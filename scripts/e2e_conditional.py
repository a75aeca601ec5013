"""Conditional-family evidence loop: ONE model, every class, CFG sweep.

Closes the same train -> checkpoint -> sample -> metric loop as
scripts/e2e_loop.py, but for the class-conditional family
(train/train_conditional.py): a single UNet with a class-embedding table
trained on the mixed MEL/NV/VASC procedural stream with CFG label dropout,
then sampled PER CLASS through the production conditional path
(ModelManager(conditional=True) -> ImageGenerator) at several guidance
scales. Evidence emitted per (class, guidance):

  * pixel-Frechet vs that class's held-out set (same floor/ceiling anchors
    as the sampler ladder);
  * class-consistency: share of samples the independently trained
    classifier assigns to the REQUESTED class — the direct measure of how
    strongly the embedding row steers generation (and of what CFG buys).

Run on-chip: `python scripts/e2e_conditional.py --out artifacts/e2e_cond`.
CPU seam test: tests/test_e2e_conditional.py (tiny sizes, --cpu).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_CLASSES = ["MEL", "NV", "VASC"]


def run(out_dir: str, size: int = 128, train_images: int = 256,
        heldout: int = 128, epochs: int = 400, batch_size: int = 32,
        sample_count: int = 64, ddim_steps: int = 50,
        guidance_scales=(1.0, 2.0, 3.0), cond_dropout: float = 0.1,
        clf_per_class: int = 64, clf_epochs: int = 8, seed: int = 0,
        skip_train: bool = False, classes=None, width: str = "quarter",
        clf_hard: float = 0.0, remat: bool = False,
        train_fused: bool = True, resume: bool = False, log=print) -> dict:
    CLASSES = list(classes) if classes else list(DEFAULT_CLASSES)
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.metrics.fid import PixelFeatureExtractor, compute_fid
    from synt_isic_tpu.models.classifier import (LesionClassifier,
                                                 preprocess_for_classifier)
    from synt_isic_tpu.models.unet2d import UNet2D
    from synt_isic_tpu.train.data import CLASS_NAMES
    from synt_isic_tpu.train.procedural import ProceduralDataset, procedural_images
    from synt_isic_tpu.train.train_classifier import (ClassifierTrainConfig,
                                                      train_classifier)
    from synt_isic_tpu.train.train_conditional import train_conditional
    from synt_isic_tpu.train.train_ddpm import TrainConfig

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from e2e_loop import unet_config

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ckpt_dir = out / "checkpoints"
    report: dict = {"classes": CLASSES, "size": size, "width": width,
                    "clf_hard": clf_hard, "epochs": epochs,
                    "train_images_per_class": train_images,
                    "guidance_scales": list(guidance_scales)}

    on_accel = jax.devices()[0].platform != "cpu"
    t0 = time.time()
    datasets = {c: ProceduralDataset(c, train_images, size, seed=seed,
                                     device=on_accel) for c in CLASSES}
    held = {c: procedural_images(c, heldout, size, seed=seed,
                                 start_index=10_000_000) for c in CLASSES}
    log(f"[cond] data: {len(CLASSES)}x{train_images} train + {heldout} "
        f"held-out per class ({time.time() - t0:.1f}s)")

    # --- train the conditional model ---------------------------------------
    cfg = dataclasses.replace(unet_config(size, width),
                              num_class_embeds=len(CLASSES) + 1)
    fused = bool(train_fused and on_accel)   # see e2e_loop.py rationale
    model = UNet2D(config=cfg, dtype=jnp.bfloat16, remat=remat,
                   use_fused_attention=fused, fast_norm=fused)
    report["train_fused"] = fused
    tcfg = TrainConfig(image_size=size, batch_size=batch_size, epochs=epochs,
                       ema_decay=0.9995, seed=seed, learning_rate=2e-4,
                       lr_schedule="cosine", warmup_steps=500,
                       min_snr_gamma=5.0, eval_every=max(1, epochs // 16),
                       eval_probe_images=16, eval_t_points=8,
                       offset_noise=0.05, cond_dropout=cond_dropout,
                       snapshot_every=max(5, epochs // 6))
    best = ckpt_dir / "unet_conditional_best.pth"
    if skip_train:
        if not best.exists():
            raise FileNotFoundError(f"--skip-train: no checkpoint at {best}")
        report["train"] = {"reused_checkpoint": str(best)}
        log(f"[cond] skip-train: reusing {best}")
    else:
        t0 = time.time()
        tr = train_conditional(datasets, str(ckpt_dir), tcfg, model=model,
                               resume=resume, log=log)
        report["train"] = {"best_loss": tr["best_loss"], "steps": tr["steps"],
                           "best_val": tr.get("best_val"),
                           "first_epoch_loss": tr["history"][0],
                           "last_epoch_loss": tr["history"][-1],
                           "seconds": round(time.time() - t0, 1)}
        log(f"[cond] trained {tr['steps']} steps in "
            f"{report['train']['seconds']:.0f}s: loss "
            f"{tr['history'][0]:.4f} -> {tr['history'][-1]:.4f}")

    # --- independent classifier (class-consistency judge) ------------------
    clf_imgs = np.concatenate([procedural_images(c, clf_per_class, size,
                                                 seed=seed,
                                                 start_index=20_000_000,
                                                 hard=clf_hard)
                               for c in CLASSES])
    clf_labels = np.asarray(sum(([CLASS_NAMES.index(c)] * clf_per_class
                                 for c in CLASSES), []), np.int32)
    clf_rng = np.random.default_rng(seed + 7)
    clf_bs = min(32, len(clf_imgs))

    def clf_batches(epoch):
        order = clf_rng.permutation(len(clf_imgs))
        for s in range(0, len(order) - clf_bs + 1, clf_bs):
            idx = order[s:s + clf_bs]
            yield (preprocess_for_classifier(jnp.asarray(clf_imgs[idx])),
                   clf_labels[idx])

    clf_path = ckpt_dir / "classifier.pth"
    t0 = time.time()
    clf_res = train_classifier(
        clf_batches, ClassifierTrainConfig(epochs=clf_epochs,
                                           batch_size=clf_bs, seed=seed),
        checkpoint_path=str(clf_path), log=log)
    clf, _ = LesionClassifier.from_checkpoint(str(clf_path))
    # sanity: the judge must separate the REAL classes before judging
    held_acc = {}
    for c in CLASSES:
        pred = np.asarray(clf.predict(jnp.asarray(held[c][:64])))
        held_acc[c] = float(np.mean(pred == CLASS_NAMES.index(c)))
    report["classifier"] = {"train_acc": clf_res["best_acc"],
                            "heldout_acc": held_acc,
                            "seconds": round(time.time() - t0, 1)}
    log(f"[cond] classifier: train {clf_res['best_acc']:.3f}, held-out "
        f"{held_acc}")

    # --- per-(class, guidance) sampling + metrics ---------------------------
    # deterministic pooled-pixel Fréchet — the trustworthy weight-free
    # verdict metric (see e2e_loop.py's battery rationale)
    pix = PixelFeatureExtractor()

    def frechet(a, b):
        return float(compute_fid(a, b, extractor=pix))

    # anchors per class: floor (train vs held-out) and noise ceiling
    anchors = {}
    rng = np.random.default_rng(seed)
    for c in CLASSES:
        train_imgs = np.asarray(datasets[c].images[:heldout])
        noise = rng.standard_normal(held[c].shape).astype(np.float32).clip(-1, 1)
        anchors[c] = {"floor_train_vs_heldout": frechet(train_imgs, held[c]),
                      "ceiling_noise_vs_heldout": frechet(noise, held[c])}
    report["anchors"] = anchors

    results: dict = {}
    for g in guidance_scales:
        gen = ImageGenerator(checkpoints_dir=str(ckpt_dir), model_config=cfg,
                             compute_dtype=jnp.bfloat16, conditional=True,
                             guidance_scale=float(g))
        gen.set_inference_steps(ddim_steps)
        gen.scheduler_kind = "ddim"
        gen.timestep_spacing = "trailing"
        gen.set_save_trajectory(False)
        gen.batch_size = min(64, sample_count)
        gen.set_generation_seed(seed + 1000)
        gdir = out / f"samples_g{g:g}"
        t0 = time.time()
        res = gen.generate_images([(c, sample_count) for c in CLASSES],
                                  str(gdir), postprocess=False)
        dt = time.time() - t0
        per_class = {}
        for c in CLASSES:
            from e2e_loop import load_generated_images

            samples = load_generated_images(gdir / c, sample_count)
            pred = np.asarray(clf.predict(jnp.asarray(samples)))
            cons = float(np.mean(pred == CLASS_NAMES.index(c)))
            per_class[c] = {
                "frechet_vs_heldout": frechet(samples, held[c]),
                "class_consistency": cons,
                # the judge's own held-out accuracy on REAL images of this
                # class is the attainable consistency ceiling (a hard=0.6
                # de-saturated judge tops out well below 1.0 — e.g. 0.53
                # for MEL): report consistency as a fraction of judge skill
                "consistency_vs_judge_skill": (
                    round(cons / held_acc[c], 3) if held_acc[c] > 0 else None),
                # absolute bar (VERDICT r4 #2): meaningful once the probe
                # itself is competent (held-out acc >= 0.70 for the class)
                "consistency_absolute_ok": bool(cons >= 0.70),
            }
        results[f"g{g:g}"] = {
            "per_class": per_class,
            "img_per_s": round(res["generated"] / dt, 3) if dt > 0 else 0,
            "unet_evals_per_step": 2 if g > 1.0 else 1,
        }
        log(f"[cond] g={g:g}: " + "  ".join(
            f"{c}: F={per_class[c]['frechet_vs_heldout']:.2f} "
            f"cons={per_class[c]['class_consistency']:.2f}"
            for c in CLASSES) + f"  ({results[f'g{g:g}']['img_per_s']} img/s)")
    report["results"] = results

    # verdict: the model is class-steerable when every class's samples are
    # (a) closer to their held-out set than to noise by a wide margin and
    # (b) assigned to the requested class at >= 70% of the judge's OWN
    #     held-out accuracy on real images of that class (an absolute bar
    #     would punish classes where the de-saturated judge itself is
    #     weak, e.g. MEL at 0.53), with a 0.30 floor (~2x the 7-class
    #     chance rate) so a near-blind judge can't vacuously pass
    best_g = max(results, key=lambda k: np.mean(
        [results[k]["per_class"][c]["class_consistency"] for c in CLASSES]))
    ok = all(results[best_g]["per_class"][c]["frechet_vs_heldout"]
             < 0.25 * anchors[c]["ceiling_noise_vs_heldout"]
             and results[best_g]["per_class"][c]["class_consistency"]
             >= max(0.7 * held_acc[c], 0.30)
             for c in CLASSES)
    report["best_guidance"] = best_g
    report["conditional_ok"] = bool(ok)
    # per-class serving defaults: the guidance that wins each class on each
    # axis (MEL's Fréchet-vs-consistency tradeoff is real — round-4 v2:
    # F 2.11 at g=2 vs consistency 0.89 at g=3 — so deployments pick per
    # class instead of one global g; DEPLOYMENT.md documents the knob)
    report["per_class_best_guidance"] = {
        c: {"by_frechet": min(
                results, key=lambda k:
                results[k]["per_class"][c]["frechet_vs_heldout"]),
            "by_consistency": max(
                results, key=lambda k:
                results[k]["per_class"][c]["class_consistency"])}
        for c in CLASSES}
    # the round-5 verdict asked for: does every class clear the ABSOLUTE
    # consistency bar at its own best guidance, judged by a probe that is
    # itself competent on that class?
    report["consistent_absolute_all"] = bool(all(
        any(results[g]["per_class"][c]["consistency_absolute_ok"]
            for g in results)
        for c in CLASSES))
    report["probe_competent_all"] = bool(all(
        a >= 0.70 for a in held_acc.values()))
    (out / "report.json").write_text(json.dumps(report, indent=2))
    log(f"[cond] report -> {out / 'report.json'}")
    print(json.dumps({"e2e_conditional": "ok" if ok else "weak",
                      "best_guidance": best_g,
                      "results": {k: {c: round(v["per_class"][c]["class_consistency"], 3)
                                      for c in CLASSES}
                                  for k, v in results.items()}}))
    return report


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/e2e_conditional")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--train-images", type=int, default=256)
    p.add_argument("--heldout", type=int, default=128)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--sample-count", type=int, default=64)
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--guidance", type=str, default="1,2,3",
                   help="comma-separated guidance scales to sweep")
    p.add_argument("--cond-dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--classes", type=str, default=",".join(DEFAULT_CLASSES),
                   help="comma-separated class list (any subset of the "
                        "7-class ISIC taxonomy)")
    p.add_argument("--width", choices=("quarter", "full"), default="quarter")
    p.add_argument("--clf-hard", type=float, default=0.0)
    p.add_argument("--clf-per-class", type=int, default=64,
                   help="probe training images per class (round-5 recipe "
                        "uses 256 — 4x round 4 — so the hard-0.6 MEL "
                        "boundary is learnable, VERDICT r4 #2)")
    p.add_argument("--clf-epochs", type=int, default=8,
                   help="probe training epochs (round-5 recipe: 24)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-train-fused", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="continue a killed run from the trainer's "
                        "train_state_conditional.npz snapshot (params + "
                        "optimizer state); epochs counts the REMAINING "
                        "epochs to run")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke mode)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(args.out, size=args.size, train_images=args.train_images,
        heldout=args.heldout, epochs=args.epochs, batch_size=args.batch,
        sample_count=args.sample_count, ddim_steps=args.ddim_steps,
        guidance_scales=[float(x) for x in args.guidance.split(",")],
        cond_dropout=args.cond_dropout, seed=args.seed,
        skip_train=args.skip_train,
        classes=[c.strip() for c in args.classes.split(",") if c.strip()],
        width=args.width, clf_hard=args.clf_hard,
        clf_per_class=args.clf_per_class, clf_epochs=args.clf_epochs,
        remat=args.remat,
        train_fused=not args.no_train_fused, resume=args.resume)
    return 0


if __name__ == "__main__":
    sys.exit(main())
