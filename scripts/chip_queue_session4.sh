#!/bin/bash
# Round-3 chip queue (NOTES_ROUND3.md): run when the axon tunnel recovers.
# Each step is independently resumable; artifacts land under artifacts/.
set -x
cd "$(dirname "$0")/.."
mkdir -p artifacts/chip_logs
# 1. distillation quality evidence (the DDIM-8 rung's justification)
timeout 10800 python scripts/distill_ladder.py \
  --checkpoints artifacts/e2e_loop_r4/checkpoints \
  --out artifacts/distill_ladder 2>&1 | tee artifacts/chip_logs/distill_ladder.log
# 2. headline bench refresh (incl. the DDIM-8 rung)
timeout 3600 python bench.py 2>&1 | tee artifacts/chip_logs/bench.log
# 3. warmed b1 latency incl. the distilled trailing config
# (no --checkpoints: fabricates a full-size random-weight model — latency
# is weight-independent; quality evidence is the distill ladder above)
timeout 3600 python scripts/bench_latency.py \
  --configs ddim:50,dpm_solver:20,ddim:8:trailing \
  2>&1 | tee artifacts/chip_logs/bench_latency.log
# 4. mixed-load serve with the fast-preview lane on the student
timeout 3600 python scripts/bench_serve.py --mixed --fast-variant distill8 \
  2>&1 | tee artifacts/chip_logs/bench_serve_mixed.log
