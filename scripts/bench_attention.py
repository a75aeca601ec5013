#!/usr/bin/env python
"""Micro-benchmark the fused attention kernel at the flagship model's shapes.

The round-2 trace attributed ~45% of DDIM step time to the attention blocks
(checkpoint-fixed head_dim 8 -> both matmuls run the MXU at K=8 / M=8, an
intrinsic 16x underutilization — see PERFORMANCE.md). The remaining knobs
that do NOT change the math are:

  * heads_per_program (G): heads computed per grid program. G=1 means
    4096 programs per 32x32 layer at b128 with 16 KB operand tiles; larger
    G amortizes grid + DMA overhead.
  * fast_math: exponentials in bf16 with the 1/sum folded into PV
    (bf16-level output deviation; quality evidence must come from the
    Frechet battery — scripts/score_checkpoint.py --fast-math).

This script times the kernel (and the XLA einsum fallback) at the real
shapes: 32x32 (T=1024) and 16x16 (T=256) maps, 32 heads of dim 8, and a
full-model forward for the winning configuration.

Usage (real chip):  python scripts/bench_attention.py
Output: artifacts/bench_attention.json + a table on stdout.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/bench_attention.json")
    p.add_argument("--batches", type=int, nargs="*", default=[8, 32, 128])
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from synt_isic_tpu.ops.pallas.attention import fused_attention
    from synt_isic_tpu.utils.compute import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    H, D = 32, 8
    results = {"device": dev.device_kind, "heads": H, "head_dim": D,
               "cases": []}

    def xla_attn(q, k, v):
        scale = 1.0 / (D ** 0.5)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    xla_attn = jax.jit(xla_attn)

    for B in args.batches:
        for T in (256, 1024):
            key = jax.random.PRNGKey(0)
            q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                         (B, H, T, D), jnp.bfloat16)
                       for i in range(3))
            flops = 2 * 2 * B * H * T * T * D
            row = {"batch": B, "tokens": T, "configs": {}}
            ms = bench(xla_attn, q, k, v, iters=args.iters) * 1e3
            row["configs"]["xla_einsum"] = {
                "ms": round(ms, 4),
                "eff_tflops": round(flops / ms / 1e9, 2)}
            for g in (1, 2, 4, 8):
                for fast in (False, True):
                    try:
                        ms = bench(lambda q, k, v: fused_attention(
                            q, k, v, heads_per_program=g, fast_math=fast),
                            q, k, v, iters=args.iters) * 1e3
                    except Exception as e:  # VMEM overflow at large G x T
                        row["configs"][f"pallas_g{g}" +
                                       ("_fast" if fast else "")] = {
                            "error": str(e).splitlines()[0][:120]}
                        continue
                    row["configs"][f"pallas_g{g}" + ("_fast" if fast else "")] = {
                        "ms": round(ms, 4),
                        "eff_tflops": round(flops / ms / 1e9, 2)}
            results["cases"].append(row)
            best = min((c for c in row["configs"].values() if "ms" in c),
                       key=lambda c: c["ms"])
            print(f"B={B:4d} T={T:5d}: " + "  ".join(
                f"{name}={cfg.get('ms', 'ERR'):>8}ms"
                for name, cfg in row["configs"].items()
                if "ms" in cfg) + f"   best={best['ms']}ms")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
