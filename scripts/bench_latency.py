"""Interactive latency: warmed end-to-end per-call time at small batches.

The GUI preview UX (reference `main.py:890-966`) lives and dies on b1
latency, not throughput. This measures the full production call —
ImageGenerator sampling + uint8 conversion + PNG + sidecar + CSV — per
(batch, sampler) cell with executables warmed, and prints the b1/b4/b8 x
DDIM-50/DPM-20 table for BENCHMARKS.md plus one JSON line.

    python scripts/bench_latency.py [--checkpoints DIR] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser(description="warmed small-batch latency")
    p.add_argument("--checkpoints", default=None)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--batches", default="1,4,8")
    p.add_argument("--configs", default="ddim:50,dpm_solver:20",
                   help="comma list of scheduler:steps[:spacing]; e.g. "
                        "'ddim:8:trailing' = the distilled-student config")
    p.add_argument("--mesh", default=None, metavar="N|auto|DxT",
                   help="measure on a device mesh; 'DxT' (e.g. 1x8) "
                        "channel-shards the UNet over the 'model' axis — "
                        "the tensor-parallel latency config for pods")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (structural smoke; the env "
                        "var alone is overridden by the TPU plugin)")
    p.add_argument("--tiny", action="store_true",
                   help="quarter-width 32px fabricated checkpoint — pairs "
                        "with --cpu for a fast structural smoke")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()
    work = Path(tempfile.mkdtemp(prefix="bench_lat_"))
    model_config = None
    if args.tiny:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from e2e_loop import small_unet_config

        model_config = small_unet_config(32)
    if args.checkpoints:
        ckpt_dir = Path(args.checkpoints)
    else:
        from synt_isic_tpu.models.unet2d import (UNet2D, UNet2DConfig,
                                                 init_unet_params)
        from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format

        cfg = model_config or UNet2DConfig()
        ckpt_dir = work / "ckpt"
        ckpt_dir.mkdir(parents=True)
        params = init_unet_params(UNet2D(config=cfg), jax.random.PRNGKey(0),
                                  image_size=cfg.sample_size)
        save_checkpoint_torch_format(params, str(ckpt_dir / "unet_NV_best.pth"))

    batches = [int(b) for b in args.batches.split(",")]
    # scheduler:steps[:spacing] — e.g. 'ddim:8:trailing' is the
    # progressive-distillation student config (train/distill.py)
    def _parse(tok):
        parts = tok.split(":")
        return (parts[0], int(parts[1]),
                parts[2] if len(parts) > 2 else "leading")

    configs = [_parse(s) for s in args.configs.split(",")]

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir),
                         compute_dtype=jnp.bfloat16,
                         model_config=model_config)
    gen.save_trajectory = False
    if args.mesh:
        from synt_isic_tpu.parallel.mesh import apply_dp_mesh

        mesh = apply_dp_mesh(gen, args.mesh)
        print(f"latency over a {dict(mesh.shape)} mesh", flush=True)
    cls = gen.get_available_classes()[0]

    rows = {}
    run_id = 0

    def cfg_key(s, n, sp):
        # spacing participates in the key or leading/trailing rungs of the
        # same (scheduler, steps) would overwrite each other
        return f"{s}{n}" + ("" if sp == "leading" else f"_{sp}")

    for scheduler, steps, spacing in configs:
        gen.scheduler_kind = scheduler
        gen.timestep_spacing = spacing
        gen.set_inference_steps(steps)
        for b in batches:
            gen.batch_size = b
            # warm (compile + paths), then timed reps with fresh seeds/dirs
            gen.set_generation_seed(run_id * 1000)
            gen.generate_images([(cls, b)], str(work / f"warm{run_id}"),
                                postprocess=False)
            times = []
            for rep in range(args.reps):
                run_id += 1
                gen.set_generation_seed(run_id * 1000)
                t0 = time.time()
                r = gen.generate_images([(cls, b)], str(work / f"r{run_id}"),
                                        postprocess=False)
                times.append(time.time() - t0)
                assert r.get("generated") == b, r
            med = float(np.median(times))
            rows[f"{cfg_key(scheduler, steps, spacing)}_b{b}"] = {
                "call_s": round(med, 3),
                "s_per_image": round(med / b, 3)}
            print(f"{cfg_key(scheduler, steps, spacing)} b{b}: {med:.3f}s/call "
                  f"= {med / b:.3f}s/image (reps={times})", flush=True)

    print("\n| batch | " + " | ".join(cfg_key(s, n, sp)
                                           for s, n, sp in configs) + " |")
    print("|---" * (len(configs) + 1) + "|")
    for b in batches:
        cells = [str(rows[f"{cfg_key(s, n, sp)}_b{b}"]["call_s"]) + " s/call"
                 for s, n, sp in configs]
        print(f"| {b} | " + " | ".join(cells) + " |")

    # headline cell: smallest measured batch of the last config (the
    # interactive-most cell) — hardcoding _b1 crashed any --batches list
    # without 1 after all measurements had already completed
    last = cfg_key(*configs[-1])
    b_head = min(batches)
    headkey = f"{last}_b{b_head}"
    print(json.dumps({"metric": f"latency_b{b_head}_{last}_s",
                      "value": rows[headkey]["call_s"], "unit": "seconds",
                      "cells": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
