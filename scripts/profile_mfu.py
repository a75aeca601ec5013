"""On-device profiler trace + MFU accounting for the full-size UNet2D.

Produces the evidence behind BENCHMARKS.md's performance claims:
  * XLA cost analysis (FLOPs / HBM bytes) of one UNet forward per batch size;
  * measured per-forward wall time from a scan of chained forwards (per
    NOTES_ROUND1.md, standalone dispatch timings through the axon tunnel
    are unreliable — only in-scan timings are trusted);
  * MFU = achieved FLOP/s vs the chip's bf16 peak;
  * arithmetic intensity (FLOPs/byte) vs the chip's compute/bandwidth knee,
    to show whether the kernel mix is compute- or bandwidth-bound;
  * a jax.profiler trace of a short sampling scan, written to
    artifacts/profile/ for op-level inspection.

Usage: python scripts/profile_mfu.py [--batches 1,8,32] [--no-trace]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# chip peaks (dense bf16) + HBM bandwidth — single shared table
from synt_isic_tpu.utils.compute import TPU_PEAKS as PEAKS  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--scan-len", type=int, default=32)
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--out", default="artifacts/profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    repo = Path(__file__).resolve().parents[1]
    jax.config.update("jax_compilation_cache_dir", str(repo / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

    dev = jax.devices()[0]
    peak_flops, peak_bw = PEAKS.get(dev.device_kind, (float("nan"), float("nan")))
    print(f"device: {dev.device_kind} ({dev.platform}), "
          f"peak {peak_flops/1e12:.0f} TFLOP/s bf16, {peak_bw/1e9:.0f} GB/s HBM")

    on_tpu = dev.platform == "tpu"
    model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16,
                   use_fused_attention=on_tpu, fast_norm=on_tpu)
    params = init_unet_params(
        UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16), jax.random.PRNGKey(0))

    results = {}
    for batch in [int(b) for b in args.batches.split(",")]:
        x = jnp.zeros((batch, 128, 128, 3), jnp.float32)
        t = jnp.full((batch,), 500, jnp.int32)

        def forward(p, x, t):
            return model.apply({"params": p}, x, t)

        lowered = jax.jit(forward).lower(params, x, t)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        hbm_bytes = float(cost.get("bytes accessed", float("nan")))

        # chained scan of K forwards: output eps is reused as next input, so
        # nothing can be elided/coalesced; timing = K dependent forwards
        K = args.scan_len

        @jax.jit
        def chained(p, x, t):
            def body(carry, _):
                eps = model.apply({"params": p}, carry, t)
                return eps.astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out

        # The axon tunnel coalesces byte-identical execution requests, so
        # every rep gets fresh input AND the output is fetched to host —
        # both are required for honest timings here.
        rng = np.random.default_rng(0)
        xs = [jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
              for _ in range(4)]
        np.asarray(chained(params, xs[0], t))[0, 0, 0, 0]  # compile+warm
        t0 = time.time()
        n_rep = 3
        for r in range(n_rep):
            out = chained(params, xs[1 + r], t)
            np.asarray(out[0, 0, 0, 0])  # force full execution + fetch
        dt = (time.time() - t0) / (n_rep * K)

        mfu = flops / dt / peak_flops
        bw_util = hbm_bytes / dt / peak_bw
        intensity = flops / hbm_bytes if hbm_bytes else float("nan")
        results[batch] = dict(ms_per_forward=dt * 1e3, gflops=flops / 1e9,
                              hbm_gb=hbm_bytes / 1e9, mfu=mfu,
                              bw_util=bw_util, intensity=intensity,
                              ms_per_image=dt * 1e3 / batch)
        print(f"b{batch:<3d} {dt*1e3:7.2f} ms/fwd  {dt*1e3/batch:6.2f} ms/img  "
              f"{flops/1e9:8.1f} GFLOP  {hbm_bytes/1e9:6.2f} GB  "
              f"MFU {mfu*100:5.1f}%  BW {bw_util*100:5.1f}%  "
              f"AI {intensity:6.1f} FLOP/B (knee {peak_flops/peak_bw:.0f})")

    if not args.no_trace:
        from synt_isic_tpu.diffusion import (DiffusionSampler, DiffusionSchedule,
                                             SamplerConfig)
        apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)
        sampler = DiffusionSampler(
            apply_fn, DiffusionSchedule.create(),
            SamplerConfig(num_inference_steps=50, scheduler="ddim",
                          dtype=jnp.bfloat16))
        seeds = np.arange(8, dtype=np.uint32)
        sampler.sample(params, seeds)["images"].block_until_ready()  # warm
        trace_dir = repo / args.out
        trace_dir.mkdir(parents=True, exist_ok=True)
        with jax.profiler.trace(str(trace_dir)):
            sampler.sample(params, seeds)["images"].block_until_ready()
        print(f"profiler trace written to {trace_dir}")

    out_json = repo / args.out / "mfu.json"
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(
        {"device": dev.device_kind, "peak_flops": peak_flops,
         "peak_bw": peak_bw, "results": results}, indent=2))
    print(f"summary -> {out_json}")


if __name__ == "__main__":
    main()
