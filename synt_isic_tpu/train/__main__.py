"""Training entry point: `python -m synt_isic_tpu.train`.

Parity with reference `diffusion/train_diffusion.py`'s run surface:
interactive class-selection menu (:142-197; numbered list, 'all', comma
lists) plus non-interactive flags. Trains per-class DDPMs with the
reference hyperparameters by default (batch 2, Adam 1e-4, 50 epochs,
<=500 images/class) and writes torch-format `unet_<CLASS>_best.pth`.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List

from ..utils.config import CLASS_NAMES
from .data import SingleClassDataset
from .train_ddpm import TrainConfig, train_class


def select_classes_interactive() -> List[str]:
    print("available classes:")
    for i, cls in enumerate(CLASS_NAMES, 1):
        print(f"  {i}. {cls}")
    print("select: numbers/names (comma-separated) or 'all'")
    line = input("> ").strip()
    if not line:
        return []
    if line.lower() == "all":
        return list(CLASS_NAMES)
    chosen = []
    for tok in line.split(","):
        tok = tok.strip()
        if tok.isdigit() and 1 <= int(tok) <= len(CLASS_NAMES):
            chosen.append(CLASS_NAMES[int(tok) - 1])
        elif tok.upper() in CLASS_NAMES:
            chosen.append(tok.upper())
    return chosen


def _explicit_batch_lr(args) -> dict:
    """Only EXPLICIT --batch/--lr reach the config — each mode's dataclass
    default applies when omitted (DDPM batch 2 / lr 1e-4 reference parity,
    classifier batch 16, distillation batch 32 / lr 5e-5), so retuning a
    dataclass default can never silently diverge from the CLI."""
    kw = {}
    if args.batch is not None:
        kw["batch_size"] = args.batch
    if args.lr is not None:
        kw["learning_rate"] = args.lr
    return kw


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="synt-isic-train")
    p.add_argument("--classes", nargs="*", help="class names (default: ask)")
    p.add_argument("--data-dir", required=False,
                   default="data/ISIC2018_Task3_Training_Input")
    p.add_argument("--csv", required=False,
                   default="data/ISIC2018_Task3_Training_GroundTruth.csv")
    p.add_argument("--checkpoints", default="checkpoints")
    p.add_argument("--epochs", type=int, default=50)
    # defaults are PER-MODE (dataclass defaults apply when omitted):
    # DDPM training batch 2 / lr 1e-4 (reference parity), classifier
    # batch 16 / lr 1e-4, distillation batch 32 / lr 5e-5 — a single
    # hardcoded default would silently drag the distiller off its tuned
    # regime
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--max-samples", type=int, default=500)
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                   help="EMA decay for exported weights (e.g. 0.9999; "
                        "0 = off = reference behavior)")
    p.add_argument("--offset-noise", type=float, default=0.0, metavar="S",
                   help="offset-noise strength (e.g. 0.1): trains the model "
                        "to control the global mean/hue channel, removing "
                        "the low-frequency color drift of linear-schedule "
                        "DDPMs (0 = off = reference behavior)")
    p.add_argument("--lr-schedule", choices=("constant", "cosine"),
                   default="constant",
                   help="'cosine': linear warmup (--warmup-steps) then "
                        "cosine decay over the run (0 = off = reference "
                        "constant-LR behavior)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--min-snr", type=float, default=0.0, metavar="GAMMA",
                   help="min-SNR loss weighting gamma (e.g. 5.0): stops "
                        "low-noise timesteps from dominating the gradient "
                        "(0 = off = reference behavior)")
    p.add_argument("--eval-every", type=int, default=0, metavar="N",
                   help="select the best checkpoint by a DETERMINISTIC "
                        "probe loss every N epochs instead of the noisy "
                        "per-epoch train loss (0 = off = reference "
                        "behavior; recommended when epochs are short)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp-mesh", action="store_true",
                   help="data-parallel training over all devices (and all "
                        "hosts when JAX_COORDINATOR_ADDRESS is set); "
                        "--batch is then the GLOBAL batch and must be a "
                        "multiple of the device count")
    p.add_argument("--train-classifier", action="store_true",
                   help="train the ResNet18 lesion classifier instead of DDPMs")
    p.add_argument("--conditional", action="store_true",
                   help="train ONE class-conditional model on the selected "
                        "classes' mixed stream (CFG label dropout; writes "
                        "unet_conditional_best.pth + .json metadata) instead "
                        "of per-class models")
    p.add_argument("--cond-dropout", type=float, default=0.1, metavar="P",
                   help="CFG label-dropout probability for --conditional")
    p.add_argument("--procedural", type=int, default=0, metavar="N",
                   help="train on N procedural class-conditional images "
                        "instead of the ISIC archive (asset-free; see "
                        "train/procedural.py) — for pipeline validation "
                        "and environments without the dataset")
    p.add_argument("--distill-from", metavar="CKPT",
                   help="progressive distillation: halve sampling steps "
                        "starting from this teacher checkpoint "
                        "(unet_<CLASS>_best.pth, flagship architecture at "
                        "--image-size). Writes unet_<CLASS>_distill<N>.pth "
                        "per phase; sample them with "
                        "num_inference_steps=N and --distill-spacing")
    p.add_argument("--distill-start", type=int, default=64, metavar="N",
                   help="teacher step count the first phase halves "
                        "(default 64 -> students at 32, 16, ...)")
    p.add_argument("--distill-end", type=int, default=4, metavar="N",
                   help="smallest student step count (default 4)")
    p.add_argument("--distill-steps-per-phase", type=int, default=2000)
    p.add_argument("--distill-spacing", choices=("leading", "trailing"),
                   default="trailing",
                   help="timestep spacing of the student grids (trailing "
                        "is the measured few-step winner)")
    args = p.parse_args(argv)

    from ..utils.compute import enable_compilation_cache

    enable_compilation_cache()

    # joins a multi-host runtime when the JAX_COORDINATOR_* env vars are
    # set; silently single-host otherwise
    from ..parallel import initialize_multihost
    from ..parallel.multihost import hybrid_mesh

    initialize_multihost()
    mesh = hybrid_mesh() if args.dp_mesh else None

    if args.train_classifier:
        import numpy as np

        from .data import MultiClassDataset
        from .train_classifier import ClassifierTrainConfig, train_classifier

        dataset = MultiClassDataset(args.data_dir, args.csv,
                                    image_size=args.image_size,
                                    max_samples_per_class=args.max_samples,
                                    seed=args.seed)
        if len(dataset) == 0:
            print("no classifier training data found")
            return 1
        print(f"classifier training set: {len(dataset)} images")
        rng = np.random.default_rng(args.seed)
        cfg = ClassifierTrainConfig(epochs=args.epochs,
                                    bf16_compute=not args.no_bf16,
                                    seed=args.seed,
                                    **_explicit_batch_lr(args))
        result = train_classifier(
            lambda epoch: dataset.batches(cfg.batch_size, rng),
            cfg, checkpoint_path=str(Path(args.checkpoints) / "classifier.pth"))
        print(f"classifier done: best_acc={result['best_acc']:.3f}")
        return 0

    classes = args.classes or select_classes_interactive()
    if not classes:
        print("no classes selected")
        return 1

    if args.distill_from:
        import jax.numpy as jnp

        from ..io.convert import torch_to_flax
        from ..io.pth import load_pth, unwrap_state_dict
        from ..models.unet2d import UNet2D, UNet2DConfig
        from .distill import DistillConfig, progressive_distill

        if len(classes) > 1 and "{CLASS}" not in args.distill_from:
            print("--distill-from with multiple classes needs a {CLASS} "
                  "placeholder in the path (each class has its own teacher)")
            return 1
        from .train_ddpm import default_fused_flags

        fused = default_fused_flags()
        model = UNet2D(config=UNet2DConfig(sample_size=args.image_size),
                       dtype=jnp.bfloat16 if not args.no_bf16 else jnp.float32,
                       use_fused_attention=fused, fast_norm=fused)
        # only explicit --batch/--lr override the distiller's tuned
        # defaults (batch 32, lr 5e-5) — the DDPM-training defaults
        # (batch 2, lr 1e-4) are the wrong regime for distillation
        dcfg = DistillConfig(steps_per_phase=args.distill_steps_per_phase,
                             seed=args.seed,
                             timestep_spacing=args.distill_spacing,
                             bf16_compute=not args.no_bf16,
                             **_explicit_batch_lr(args))
        for cls in classes:
            class_id = CLASS_NAMES.index(cls)
            if args.procedural:
                from .procedural import ProceduralDataset

                dataset = ProceduralDataset(cls, args.procedural,
                                            image_size=args.image_size,
                                            seed=args.seed)
            else:
                dataset = SingleClassDataset(args.data_dir, args.csv,
                                             class_id,
                                             image_size=args.image_size,
                                             max_samples=args.max_samples)
            if len(dataset) == 0:
                print(f"!! no data for {cls}, skipping")
                continue
            cfg_cls = dcfg
            if args.batch is None and len(dataset) < dcfg.batch_size:
                # smoke/small-corpus runs: clamp the DEFAULT batch to the
                # dataset instead of tripping distill_phase's undersized-
                # dataset guard (an explicit --batch still errors loudly)
                import dataclasses as _dc

                print(f"   {len(dataset)} images < default batch "
                      f"{dcfg.batch_size}; clamping batch_size to "
                      f"{len(dataset)}")
                cfg_cls = _dc.replace(dcfg, batch_size=len(dataset))
            teacher = torch_to_flax(unwrap_state_dict(load_pth(
                args.distill_from.replace("{CLASS}", cls))))
            print(f"== distilling {cls}: {args.distill_start} -> "
                  f"{args.distill_end} steps ==")
            out = progressive_distill(
                teacher, dataset, cls, args.checkpoints,
                start_steps=args.distill_start, end_steps=args.distill_end,
                config=cfg_cls, model=model, image_size=args.image_size,
                mesh=mesh)
            for ph in out["phases"]:
                print(f"  T={ph['n_student']}: {ph['checkpoint']} "
                      f"(loss {ph['final_loss']:.5f})")
        return 0

    cfg = TrainConfig(image_size=args.image_size,
                      **_explicit_batch_lr(args), epochs=args.epochs,
                      bf16_compute=not args.no_bf16, seed=args.seed,
                      ema_decay=args.ema, offset_noise=args.offset_noise,
                      lr_schedule=args.lr_schedule,
                      warmup_steps=args.warmup_steps,
                      min_snr_gamma=args.min_snr,
                      eval_every=args.eval_every,
                      cond_dropout=args.cond_dropout)

    def _dataset_for(cls: str):
        if args.procedural:
            from .procedural import ProceduralDataset

            return ProceduralDataset(cls, args.procedural,
                                     image_size=args.image_size,
                                     seed=args.seed)
        return SingleClassDataset(args.data_dir, args.csv,
                                  CLASS_NAMES.index(cls),
                                  image_size=args.image_size,
                                  max_samples=args.max_samples)

    if args.conditional:
        from .train_conditional import train_conditional

        datasets = {cls: _dataset_for(cls) for cls in classes}
        datasets = {c: d for c, d in datasets.items() if len(d) > 0}
        if not datasets:
            print("no training data found for any selected class")
            return 1
        total = sum(len(d) for d in datasets.values())
        print(f"== training conditional model on {list(datasets)}: "
              f"{total} images ==")
        result = train_conditional(datasets, args.checkpoints, cfg,
                                   resume=args.resume, mesh=mesh)
        print(f"== conditional done: best_loss={result['best_loss']:.5f} "
              f"-> {result['checkpoint']} ==")
        return 0

    for cls in classes:
        dataset = _dataset_for(cls)
        if len(dataset) == 0:
            print(f"!! no data for {cls}, skipping")
            continue
        print(f"== training {cls}: {len(dataset)} images ==")
        result = train_class(cls, dataset, args.checkpoints, cfg,
                             resume=args.resume, mesh=mesh)
        print(f"== {cls} done: best_loss={result['best_loss']:.5f} ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
