#!/bin/bash
# Round-3 session-5 final measurement pass. Runs after the 5b queue
# (e2e retrain + distill ladder) releases the chip, with an otherwise idle
# host — the earlier bench_latency/bench.py numbers were taken while the
# CPU-bound test suite competed for this host's single core.
set -x
cd "$(dirname "$0")/.."
mkdir -p artifacts/chip_logs
if [ -f /tmp/chipqueue5.pid ]; then
  while kill -0 "$(cat /tmp/chipqueue5.pid)" 2>/dev/null; do sleep 60; done
fi
# 1. fused-attention tuning sweep (heads-per-program x fast_math) at the
#    flagship shapes
timeout 3600 python scripts/bench_attention.py \
  2>&1 | tee artifacts/chip_logs/bench_attention.log
# 2. fast-math quality evidence on the freshly trained e2e checkpoint
timeout 3600 python scripts/score_checkpoint.py \
  --checkpoints artifacts/e2e_loop_r5/checkpoints \
  --configs ddim:50:trailing,dpm_solver:20:trailing --ab-fast-math \
  --out artifacts/score_fastmath.json \
  2>&1 | tee artifacts/chip_logs/score_fastmath.log
# 3. mixed-load serve with the student fast lane (crashed in the 5a queue
#    during a mid-edit window; rerun)
timeout 3600 python scripts/bench_serve.py --mixed --fast-variant distill8 \
  2>&1 | tee artifacts/chip_logs/bench_serve_mixed.log
# 4. clean headline bench + warmed latency (idle host this time)
timeout 3600 python bench.py 2>&1 | tee artifacts/chip_logs/bench_clean.log
timeout 3600 python scripts/bench_latency.py \
  --configs ddim:50,dpm_solver:20,ddim:8:trailing \
  2>&1 | tee artifacts/chip_logs/bench_latency_clean.log
