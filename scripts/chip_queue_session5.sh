#!/bin/bash
# Round-3 session-5 chip queue: regenerate the converged e2e teacher
# checkpoint (the r4 run's checkpoints/ were local-only and did not
# survive the session), then run the distillation quality ladder on it.
# Waits for the session-4 queue (bench/latency/serve) to release the chip.
set -x
cd "$(dirname "$0")/.."
mkdir -p artifacts/chip_logs
if [ -f /tmp/chipqueue.pid ]; then
  while kill -0 "$(cat /tmp/chipqueue.pid)" 2>/dev/null; do sleep 30; done
fi
# 1. regenerate the converged teacher: same recipe as the r4 run
#    (384 images, 33.6k steps = 2800 epochs x 12 steps, quality levers on)
timeout 14400 python scripts/e2e_loop.py \
  --out artifacts/e2e_loop_r5 --train-images 384 --epochs 2800 \
  2>&1 | tee artifacts/chip_logs/e2e_loop_r5.log
# 2. distillation quality evidence (the DDIM-8 rung's justification)
timeout 10800 python scripts/distill_ladder.py \
  --checkpoints artifacts/e2e_loop_r5/checkpoints \
  --out artifacts/distill_ladder 2>&1 | tee artifacts/chip_logs/distill_ladder.log
