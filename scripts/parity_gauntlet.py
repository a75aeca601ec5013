#!/usr/bin/env python
"""THE command to run when real checkpoints land (VERDICT r2 #6).

Given a `checkpoints/` tree (real `unet_<CLASS>_best.pth` files, optional
`classifier.pth`, optional `inception_v3.pth`), run the full parity
battery end to end and emit ONE pass/fail report:

  1. manifest validation — every checkpoint's key/shape set against the
     vendored diffusers UNet2DModel manifest (reference load path
     `core/generator/model_manager.py:89-171`);
  2. smoke samples per class through the production ImageGenerator
     (PNG + sidecar + CSV artifact path);
  3. sidecar reproduce — regenerate one image per class from its sidecar
     and require BYTE identity (`synt-isic --reproduce` contract);
  4. integrated XAI end-to-end on a captured trajectory (one class);
  5. FID between two independently-seeded sample sets (standard Inception
     FID when `inception_v3.pth` is present; otherwise the step reports
     `skipped: no inception weights` rather than silently proxying).

    python scripts/parity_gauntlet.py --checkpoints checkpoints \
        [--out gauntlet_report.json] [--samples-per-class 2] [--steps 50]

Exit 0 iff every non-skipped step passed. Exercised in CI with fabricated
tiny checkpoints (tests/test_parity_gauntlet.py).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_gauntlet(checkpoints_dir: str, out_path: str = "gauntlet_report.json",
                 samples_per_class: int = 2, steps: int = 50,
                 model_config=None, work_dir: str = None,
                 xai_class: str = None, conditional: bool = None,
                 log=print) -> dict:
    import numpy as np
    import jax.numpy as jnp

    from synt_isic_tpu.cli import reproduce_from_sidecar
    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.io.manifest import (expected_unet2d_state_shapes,
                                           validate_state_dict)
    from synt_isic_tpu.io.pth import load_pth
    from synt_isic_tpu.models.unet2d import UNet2DConfig

    ckpt = Path(checkpoints_dir)
    cfg = model_config or UNet2DConfig()
    work = Path(work_dir or tempfile.mkdtemp(prefix="gauntlet_"))
    report: dict = {"checkpoints_dir": str(ckpt), "steps": {},
                    "started": time.strftime("%Y-%m-%d %H:%M:%S")}

    def record(name, ok, detail, skipped=False):
        report["steps"][name] = {"ok": bool(ok), "skipped": bool(skipped),
                                 "detail": detail}
        tag = "SKIP" if skipped else ("ok" if ok else "FAIL")
        log(f"[gauntlet] {name}: {tag} — {detail}")

    # --- 0. mode detection: per-class family vs ONE conditional checkpoint
    # (train/train_conditional.py writes unet_conditional_best.pth + .json
    # metadata; the reference family is always per-class, so conditional is
    # a rebuild extension — still gated by the exact same battery).
    cond_ckpt = ckpt / "unet_conditional_best.pth"
    per_class = sorted(p for p in ckpt.glob("unet_*_best.pth")
                       if p.name != cond_ckpt.name)
    if conditional is None:
        conditional = cond_ckpt.exists() and not per_class
    report["mode"] = "conditional" if conditional else "per_class"

    # --- 1. manifest validation -------------------------------------------
    if conditional:
        meta_path = cond_ckpt.with_suffix(".json")
        if not cond_ckpt.exists() or not meta_path.exists():
            record("manifest", False,
                   f"conditional mode needs {cond_ckpt.name} + metadata "
                   f"{meta_path.name} under {ckpt}")
            report["passed"] = False
            Path(out_path).write_text(json.dumps(report, indent=2))
            return report
        meta = json.loads(meta_path.read_text(encoding="utf-8"))
        n_embed = int(meta.get("num_class_embeds", len(meta["classes"]) + 1))
        cfg = dataclasses.replace(cfg, num_class_embeds=n_embed)
        found = [cond_ckpt]
    else:
        found = per_class
    manifest = expected_unet2d_state_shapes(**dataclasses.asdict(cfg))
    if not found:
        record("manifest", False, f"no unet_*_best.pth under {ckpt}")
        report["passed"] = False
        Path(out_path).write_text(json.dumps(report, indent=2))
        return report
    bad = {}
    for p in found:
        try:
            problems = validate_state_dict(load_pth(str(p)), manifest)
        except Exception as exc:
            problems = [f"unreadable: {exc}"]
        if problems:
            bad[p.name] = problems[:3]
    record("manifest", not bad,
           f"{len(found) - len(bad)}/{len(found)} checkpoints valid "
           f"({report['mode']})"
           + (f"; first failure: {next(iter(bad.items()))}" if bad else ""))

    if conditional:
        classes = list(meta["classes"]) if not bad else []
    else:
        classes = [p.name[len("unet_"):-len("_best.pth")] for p in found
                   if p.name not in bad]
    if not classes:
        report["passed"] = False
        Path(out_path).write_text(json.dumps(report, indent=2))
        return report

    # --- 2. smoke samples per class ---------------------------------------
    gen = ImageGenerator(checkpoints_dir=str(ckpt), model_config=cfg,
                         compute_dtype=jnp.bfloat16, conditional=conditional)
    gen.set_inference_steps(steps)
    gen.set_generation_seed(1234)
    gen.save_trajectory = False
    gen.batch_size = max(samples_per_class, 1)
    smoke_dir = work / "smoke"
    t0 = time.time()
    result = gen.generate_images([(c, samples_per_class) for c in classes],
                                 str(smoke_dir), postprocess=True)
    n_expected = samples_per_class * len(classes)
    produced = sum(1 for _ in smoke_dir.rglob("ISIC_*.png"))
    record("smoke_samples", produced == n_expected and "error" not in result,
           f"{produced}/{n_expected} images across {len(classes)} classes "
           f"in {time.time() - t0:.1f}s")

    # --- 3. sidecar reproduce (byte identity) -----------------------------
    t0 = time.time()
    repro_fail = []
    for c in classes:
        sidecars = sorted((smoke_dir / c).glob("ISIC_*.json"))
        if not sidecars:
            repro_fail.append(f"{c}: no sidecar")
            continue
        rc = reproduce_from_sidecar(str(sidecars[0]), str(ckpt),
                                    output=str(work / f"repro_{c}.png"),
                                    postprocess=True, model_config=cfg)
        if rc != 0:
            repro_fail.append(f"{c}: exit {rc}")
    record("sidecar_reproduce", not repro_fail,
           f"{len(classes) - len(repro_fail)}/{len(classes)} byte-identical "
           f"in {time.time() - t0:.1f}s"
           + (f"; {repro_fail[0]}" if repro_fail else ""))

    # --- 4. XAI end-to-end on a captured trajectory -----------------------
    from synt_isic_tpu.xai.integration import IntegratedXAIAnalyzer

    t0 = time.time()
    xai_cls = xai_class or classes[0]
    clf_path = ckpt / "classifier.pth"
    try:
        analyzer = IntegratedXAIAnalyzer(
            classifier_path=str(clf_path) if clf_path.exists() else None,
            verbose=False, ig_n_steps=8, shap_n_samples=32,
            n_bootstrap=200, n_permutations=500, with_sanity=False)
        gen.set_xai_analyzer(analyzer)
        gen.set_xai_frequency(1)
        gen.save_trajectory = True
        xai_dir = work / "xai"
        result = gen.generate_images([(xai_cls, 1)], str(xai_dir),
                                     postprocess=False)
        runs = [p for p in (xai_dir / "xai_results" / xai_cls).glob("*")
                if p.is_dir()]
        n_art = sum(len(list(p.glob("*"))) for p in runs)
        record("xai_e2e", n_art > 0 and "error" not in result,
               f"{n_art} artifacts ({'real' if clf_path.exists() else 'random'}"
               f"-weights classifier) in {time.time() - t0:.1f}s")
    except Exception as exc:
        record("xai_e2e", False, f"raised: {exc}")
    finally:
        gen.set_xai_analyzer(None)
        gen.save_trajectory = False

    # --- 5. FID (standard weights only; honest skip otherwise) ------------
    inception = ckpt / "inception_v3.pth"
    if not inception.exists():
        record("fid", True, "skipped: no inception_v3.pth (run "
               "`python -m synt_isic_tpu.app.download_models` to bootstrap "
               "standard FID)", skipped=True)
    else:
        from synt_isic_tpu.metrics.fid import compute_fid, default_extractor

        t0 = time.time()
        try:
            n = max(16, 4 * samples_per_class)
            # one device block per set — batch_size was left at the smoke
            # step's samples_per_class, which splits n into many tiny
            # dispatch+transfer round-trips on a tunneled chip
            gen.batch_size = min(n, 64)
            gen.set_generation_seed(777)
            d1 = work / "fid_a"
            gen.generate_images([(classes[0], n)], str(d1), postprocess=False)
            gen.set_generation_seed(888)
            d2 = work / "fid_b"
            gen.generate_images([(classes[0], n)], str(d2), postprocess=False)

            from PIL import Image
            def load(d):
                fs = sorted((d / classes[0]).glob("ISIC_*.png"))
                return np.stack([np.asarray(Image.open(f), np.float32) / 127.5 - 1
                                 for f in fs])
            ex = default_extractor(str(ckpt), require_standard=True)
            fid = compute_fid(load(d1), load(d2), ex)
            # two same-model sample sets must be NEAR each other
            record("fid", np.isfinite(fid),
                   f"standard Inception FID between independent sample sets: "
                   f"{fid:.2f} ({time.time() - t0:.1f}s)")
            report["fid_value"] = float(fid)
        except Exception as exc:
            record("fid", False, f"raised: {exc}")

    report["passed"] = all(s["ok"] for s in report["steps"].values())
    report["finished"] = time.strftime("%Y-%m-%d %H:%M:%S")
    Path(out_path).write_text(json.dumps(report, indent=2))
    log(f"[gauntlet] {'PASS' if report['passed'] else 'FAIL'} -> {out_path}")
    return report


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoints", default="checkpoints")
    p.add_argument("--out", default="gauntlet_report.json")
    p.add_argument("--samples-per-class", type=int, default=2)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--xai-class", default=None)
    p.add_argument("--conditional", action="store_true", default=None,
                   help="force conditional single-checkpoint mode (default: "
                        "auto-detect — conditional iff unet_conditional_best"
                        ".pth is present and no per-class checkpoints are)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from synt_isic_tpu.utils.compute import enable_compilation_cache
        enable_compilation_cache()
    report = run_gauntlet(args.checkpoints, args.out,
                          samples_per_class=args.samples_per_class,
                          steps=args.steps, xai_class=args.xai_class,
                          conditional=args.conditional)
    return 0 if report.get("passed") else 1


if __name__ == "__main__":
    raise SystemExit(main())
