"""Bounded XLA compiler-flag sweep on the headline sampling config.

Round-2 traces attributed the remaining headline gap (31% MFU vs the 78%
bandwidth-bound cap) to the checkpoint-fixed attention shape; per-step
data movement is already clean (copy 1.6%, convert/reduce 1.6%).  The one
untried axis is the XLA TPU backend's own scheduling/fusion knobs.  Each
candidate flag set runs the DDIM-50 b128 bf16 scan (the exact bench.py
headline body) in a SUBPROCESS — XLA_FLAGS are frozen at backend init, so
per-config isolation is mandatory — with a hard timeout so a bad flag
can't wedge the sweep on the tunneled device.

Usage: python scripts/xla_flag_sweep.py [--out artifacts/xla_flag_sweep.json]

MEASURED OUTCOME (round 3, session 7 — negative, recorded): the axon
plugin's libtpu FATALLY rejects every TPU-backend tuning flag tried
(`parse_flags_from_env.cc: Unknown flag in XLA_FLAGS` at backend init, for
latency-hiding scheduler, async collectives, scoped-VMEM limits, and
rwb-fusion — artifacts/xla_flag_sweep.json). This stack exposes no usable
XLA TPU flag surface, so compiler-knob tuning is NOT an available lever
here; the script stays as the probe to re-fire on a stack with a full
libtpu. (The baseline rung timed out under CPU contention from a
concurrently running test suite — its reference number is bench.py's.)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from synt_isic_tpu.diffusion import DiffusionSchedule, DiffusionSampler, SamplerConfig
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig, init_unet_params

on_tpu = jax.devices()[0].platform == "tpu"
model = UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16,
               use_fused_attention=on_tpu, fast_norm=on_tpu)
params = init_unet_params(UNet2D(config=UNet2DConfig(), dtype=jnp.bfloat16),
                          jax.random.PRNGKey(0))
sampler = DiffusionSampler(
    lambda p, x, t: model.apply({{"params": p}}, x, t),
    DiffusionSchedule.create(),
    SamplerConfig(num_inference_steps=50, scheduler="ddim", dtype=jnp.bfloat16))
batch = 128
seeds = np.arange(batch, dtype=np.uint32)
out = sampler.sample(params, seeds)
out["images"].block_until_ready()
t0 = time.time()
n_runs = 2
for r in range(n_runs):
    out = sampler.sample(params, seeds + (r + 1) * batch)
    out["images"].block_until_ready()
dt = time.time() - t0
print("IPS_RESULT", (batch * n_runs) / dt)
"""

# Candidate sets. Baseline first; each candidate is baseline + one lever so
# wins are attributable. No persistent compilation cache: flag changes must
# recompile, and we want each config's own compile.
CONFIGS = [
    ("baseline", ""),
    ("latency_hiding", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("async_collectives", "--xla_tpu_enable_async_all_gather=true "
                          "--xla_tpu_enable_async_collective_permute=true"),
    ("scoped_vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("flash_fusion", "--xla_tpu_use_enhanced_scoped_vmem_code_generation=true"),
    ("aggressive_fusion", "--xla_tpu_rwb_fusion=true"),
]


def run_config(name: str, flags: str, timeout_s: float) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    env.pop("JAX_PLATFORMS", None)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", CHILD.format(repo=REPO)],
                           capture_output=True, text=True, timeout=timeout_s,
                           env=env)
    except subprocess.TimeoutExpired:
        return {"name": name, "flags": flags, "ok": False, "error": "timeout"}
    ips = None
    for line in r.stdout.splitlines():
        if line.startswith("IPS_RESULT"):
            ips = float(line.split()[1])
    if r.returncode != 0 or ips is None:
        tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        return {"name": name, "flags": flags, "ok": False,
                "error": " | ".join(tail)}
    return {"name": name, "flags": flags, "ok": True,
            "images_per_sec": round(ips, 3),
            "wall_s": round(time.time() - t0, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "xla_flag_sweep.json"))
    ap.add_argument("--timeout", type=float, default=420.0)
    args = ap.parse_args()

    results = []
    for name, flags in CONFIGS:
        res = run_config(name, flags, args.timeout)
        results.append(res)
        print(json.dumps(res), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": "ddim_T50_b128_bf16", "results": results}, f,
                  indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
