"""End-to-end SERVED throughput: full-size model behind the TCP daemon.

Measures what a production client actually gets — generation + PNG +
sidecar + CSV + protocol — under concurrent load with request coalescing,
against the raw sampler rate (bench.py). History: 2.84 img/s before the
round-2 host-path fixes (write pipeline, block fetches, numpy uint8),
13.3 after = 86% of the raw 16.1 img/s sampler rate on one chip.

    python scripts/bench_serve.py [--clients 4] [--count 64] [--steps 50]

`--mixed` runs the MIXED-LOAD scenario instead (VERDICT r2 #4): one long
research job (count x steps above interactive_cost) is in flight while a
stream of interactive requests (b1, few steps) arrives — measures the
interactive p50/p95 a preview client sees behind bulk traffic, exercising
the priority fast lane. Without the lane an interactive request waits for
the WHOLE research job; with it, at most one device batch.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_mixed(host, port, cls, args) -> int:
    """Mixed-load: one long research job + a stream of interactive b1
    requests; report interactive p50/p95 while the bulk job is in flight."""
    import json

    from synt_isic_tpu.serve import request

    bulk_result = {}

    def bulk():
        bulk_result.update(request(
            host, port, {"op": "generate", "class": cls,
                         "count": args.count, "steps": args.steps,
                         "postprocess": False}, timeout=7200))

    bulk_thread = threading.Thread(target=bulk)
    t_bulk0 = time.time()
    bulk_thread.start()
    time.sleep(1.0)  # let the bulk job reach the device

    inter_lat = []
    inter_ok = []
    while bulk_thread.is_alive() and len(inter_lat) < args.interactive_n:
        t0 = time.time()
        payload = {"op": "generate", "class": cls, "count": 1,
                   "postprocess": False}
        if getattr(args, "fast_variant", None):
            payload["fast"] = True
        else:
            payload["steps"] = args.interactive_steps
        r = request(host, port, payload, timeout=3600)
        inter_lat.append(time.time() - t0)
        inter_ok.append(bool(r.get("ok")))
        time.sleep(args.interactive_gap)
    bulk_thread.join()
    bulk_s = time.time() - t_bulk0

    lat = sorted(inter_lat)
    pct = lambda q: lat[min(len(lat) - 1, int(round(q * (len(lat) - 1))))] if lat else 0  # noqa: E731
    n_bulk = len(bulk_result.get("files", []))
    # zero interactive samples = nothing was measured (bulk finished before
    # the first probe): all([])=True would otherwise report a fabricated
    # perfect p95 of 0.0 with ok:true
    measured = len(lat) > 0
    # in --fast-variant mode the interactive requests ran at the FAST
    # generator's step count through the distilled student, not
    # --interactive-steps
    inter_desc = (f"fast-lane T={args.fast_steps} ({args.fast_variant})"
                  if getattr(args, "fast_variant", None)
                  else f"T={args.interactive_steps}")
    print(f"bulk: {n_bulk} imgs T={args.steps} in {bulk_s:.1f}s; "
          f"{len(lat)} interactive b1 {inter_desc} during it: "
          f"p50={pct(.5):.2f}s p95={pct(.95):.2f}s "
          f"(ok={measured and all(inter_ok) and bulk_result.get('ok', False)})")
    if not measured:
        print("warning: bulk job finished before any interactive request "
              "completed — no latency was measured; raise --count or lower "
              "--interactive-gap", file=sys.stderr)
    ok = measured and all(inter_ok) and bool(bulk_result.get("ok"))
    print(json.dumps({
        "metric": f"mixed_interactive_p95_s_bulk{args.count}xT{args.steps}"
                  + (f"_b1fast{args.fast_steps}" if getattr(args, "fast_variant", None)
                     else f"_b1T{args.interactive_steps}"),
        "value": round(pct(.95), 3) if measured else None, "unit": "seconds",
        "p50_s": round(pct(.5), 3) if measured else None,
        "n_interactive": len(lat),
        "bulk_elapsed_s": round(bulk_s, 1),
        "ok": ok}))
    return 0 if ok else 1


def main() -> int:
    p = argparse.ArgumentParser(description="served-throughput benchmark")
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--count", type=int, default=64, help="images per client")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=64, help="device block size")
    p.add_argument("--scheduler", default="ddim")
    p.add_argument("--checkpoints", default=None,
                   help="real checkpoints dir (default: fabricate random)")
    p.add_argument("--mixed", action="store_true",
                   help="mixed-load scenario: interactive latency behind a "
                        "long research job (see module docstring)")
    p.add_argument("--interactive-n", type=int, default=12)
    p.add_argument("--interactive-steps", type=int, default=20)
    p.add_argument("--interactive-gap", type=float, default=0.5)
    p.add_argument("--fast-variant", default=None, metavar="V",
                   help="serve a fast-preview lane on this distilled "
                        "variant (e.g. distill8) and send the mixed-load "
                        "interactive stream as {'fast': true} requests "
                        "(fabricated-checkpoint mode creates the variant "
                        "file with random weights — throughput-only)")
    p.add_argument("--fast-steps", type=int, default=8)
    p.add_argument("--mesh", default=None, metavar="N|auto",
                   help="serve over a data-parallel mesh of N devices "
                        "('auto' = all visible) — measures multi-chip "
                        "served throughput (serve.py --mesh)")
    p.add_argument("--conditional", action="store_true",
                   help="serve the single class-conditional checkpoint and "
                        "point every client at a DIFFERENT class — measures "
                        "cross-class request coalescing (one mixed-label "
                        "MXU batch; a per-class server would dispatch once "
                        "per class). Fabricated mode writes a random-weight "
                        "conditional checkpoint")
    p.add_argument("--guidance-scale", type=float, default=0.0)
    p.add_argument("--spread-classes", type=int, default=1, metavar="N",
                   help="per-class BASELINE for the conditional comparison: "
                        "fabricate N per-class checkpoints (same weights) "
                        "and spread clients across them — different-class "
                        "requests then hit separate models and cannot "
                        "coalesce (measures what the conditional server's "
                        "mixed-class batching buys)")
    p.add_argument("--warm-rounds", type=int, default=0, metavar="N",
                   help="fire the identical client burst N times untimed "
                        "first, so the measured round is free of first-jit "
                        "for the coalesced block shapes")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from synt_isic_tpu.generator import ImageGenerator
    from synt_isic_tpu.serve import GenerationServer, request
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()
    work = Path(tempfile.mkdtemp(prefix="bench_serve_"))
    if args.checkpoints:
        # never write into a user-supplied checkpoint directory
        ckpt_dir = Path(args.checkpoints)
        want = ("unet_conditional_best.pth" if args.conditional
                else "unet_*_best.pth")
        if not any(ckpt_dir.glob(want)):
            print(f"error: no {want} in {ckpt_dir}", file=sys.stderr)
            return 1
    else:
        import dataclasses
        import json as _json

        from synt_isic_tpu.models.unet2d import (UNet2D, UNet2DConfig,
                                                 init_unet_params)
        from synt_isic_tpu.train.train_ddpm import save_checkpoint_torch_format

        ckpt_dir = work / "ckpt"
        ckpt_dir.mkdir(parents=True)
        if args.conditional:
            cond_classes = ["MEL", "NV", "VASC"]
            cfg = dataclasses.replace(UNet2DConfig(),
                                      num_class_embeds=len(cond_classes) + 1)
            params = init_unet_params(UNet2D(config=cfg), jax.random.PRNGKey(0))
            save_checkpoint_torch_format(
                params, str(ckpt_dir / "unet_conditional_best.pth"))
            (ckpt_dir / "unet_conditional_best.json").write_text(_json.dumps({
                "classes": cond_classes,
                "num_class_embeds": len(cond_classes) + 1,
                "null_label": len(cond_classes)}))
        else:
            params = init_unet_params(UNet2D(config=UNet2DConfig()),
                                      jax.random.PRNGKey(0))
            save_checkpoint_torch_format(params,
                                         str(ckpt_dir / "unet_NV_best.pth"))
            # per-class baseline for the conditional comparison: the same
            # weights under several class names — different-class requests
            # then hit SEPARATE models and can never share a device batch
            from synt_isic_tpu.train.data import CLASS_NAMES
            extras = [c for c in CLASS_NAMES if c != "NV"]
            if args.spread_classes - 1 > len(extras):
                print(f"--spread-classes capped at {len(extras) + 1} "
                      f"(the {len(CLASS_NAMES)} ISIC classes)", flush=True)
            for extra in extras[:max(0, args.spread_classes - 1)]:
                save_checkpoint_torch_format(
                    params, str(ckpt_dir / f"unet_{extra}_best.pth"))
            if args.fast_variant:
                save_checkpoint_torch_format(
                    params, str(ckpt_dir / f"unet_NV_{args.fast_variant}.pth"))
        print("fabricated random-weight checkpoint", flush=True)

    gen = ImageGenerator(checkpoints_dir=str(ckpt_dir),
                         compute_dtype=jnp.bfloat16,
                         conditional=args.conditional,
                         guidance_scale=args.guidance_scale)
    gen.set_inference_steps(args.steps)
    gen.scheduler_kind = args.scheduler
    gen.batch_size = args.batch
    if args.mesh:
        from synt_isic_tpu.parallel.mesh import apply_dp_mesh

        mesh = apply_dp_mesh(gen, args.mesh)
        print(f"serving over a {dict(mesh.shape)} mesh "
              f"(device block {gen.batch_size})", flush=True)
    cls = gen.get_available_classes()[0]
    fast_gen = None
    if args.fast_variant:
        fast_gen = ImageGenerator(checkpoints_dir=str(ckpt_dir),
                                  compute_dtype=jnp.bfloat16,
                                  model_variant=args.fast_variant)
        fast_gen.set_inference_steps(args.fast_steps)
        fast_gen.timestep_spacing = "trailing"
        fast_gen.save_trajectory = False
    srv = GenerationServer(gen, port=0, output_root=str(work / "out"),
                           max_batch=args.clients * args.count,
                           fast_generator=fast_gen).start()
    host, port = srv.address
    request(host, port, {"op": "warmup", "class": cls}, timeout=1800)
    # one warm pass to populate executables/paths outside the timed window
    request(host, port, {"op": "generate", "class": cls, "count": args.batch,
                         "postprocess": False}, timeout=1800)

    if args.mixed:
        # warm the b1 interactive executable too
        if args.fast_variant:
            request(host, port, {"op": "warmup", "class": cls, "fast": True,
                                 "compile": True}, timeout=1800)
            request(host, port, {"op": "generate", "class": cls, "count": 1,
                                 "fast": True, "postprocess": False},
                    timeout=1800)
        else:
            request(host, port, {"op": "generate", "class": cls, "count": 1,
                                 "steps": args.interactive_steps,
                                 "postprocess": False}, timeout=1800)
        rc = run_mixed(host, port, cls, args)
        srv.stop()
        return rc

    results = []
    # conditional serving: every client asks for a different class — the
    # server coalesces them into mixed-label device batches (one dispatch);
    # a per-class server would need one dispatch per class
    all_classes = (gen.get_available_classes()
                   if args.conditional or args.spread_classes > 1 else [cls])

    def go(i=0):
        results.append(request(
            host, port, {"op": "generate",
                         "class": all_classes[i % len(all_classes)],
                         "count": args.count, "postprocess": False},
            timeout=3600))

    def burst():
        threads = [threading.Thread(target=go, args=(i,))
                   for i in range(args.clients)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.time() - t0

    if args.warm_rounds:
        # fire the identical burst first so the timed round measures the
        # serving path, not first-jit of whatever block shapes the
        # coalescer produced (coalesced sizes depend on arrival order, so
        # a plain per-class warmup op cannot pre-build them)
        for _ in range(args.warm_rounds):
            burst()
            print(f"warm round done ({len(results)} replies)", flush=True)
            results.clear()
    dt = burst()
    n = sum(len(r.get("files", [])) for r in results)
    ok = all(r.get("ok") for r in results)
    kind = ("conditional mixed-class" if args.conditional
            else "per-class spread" if args.spread_classes > 1
            else "single-class")
    print(f"served {n} images in {dt:.1f}s = {n / dt:.2f} img/s "
          f"(ok={ok}, coalesced={sorted(r.get('coalesced', 0) for r in results)}, "
          f"{args.clients} clients x {args.count} [{kind}], "
          f"{args.scheduler} T={args.steps} block={args.batch})")
    import json

    print(json.dumps({
        "metric": f"served_images_per_sec_{args.scheduler}_T{args.steps}"
                  f"_c{args.clients}x{args.count}"
                  + ("_conditional_mixed" if args.conditional
                     else "_perclass_spread" if args.spread_classes > 1
                     else ""),
        "value": round(n / dt, 3), "unit": "images/sec", "ok": ok,
        "coalesced": sorted(r.get("coalesced", 0) for r in results)}))
    srv.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
