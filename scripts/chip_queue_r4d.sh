#!/bin/bash
# Round-4 chip queue, part D (chained after part C):
#  1. re-score the flagship e2e verdict with the SDE 20-step rung — the
#     full-width ladder showed dpm_solver_sde-20 (3.24) passes the strict
#     bar deterministic dpm_solver-20 (5.90) misses; reuses part A's
#     trained checkpoint via --skip-train (no retraining)
#  2. remat-mode x batch sweep for the training step (can any policy mode
#     beat the b32/no-remat 202 img/s champion?)
cd "$(dirname "$0")/.."
LOGS=artifacts/chip_logs_r4
mkdir -p "$LOGS"

step() {
  local name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%SZ)) ==="
  if timeout "${STEP_TIMEOUT:-14400}" "$@" > "$LOGS/$name.log" 2>&1; then
    echo "=== $name OK ($(date -u +%H:%M:%SZ)) ==="
  else
    echo "=== $name FAILED rc=$? ($(date -u +%H:%M:%SZ)) — see $LOGS/$name.log ==="
  fi
}

mkdir -p artifacts/e2e_loop_full_sde
ln -sfn ../e2e_loop_full/checkpoints artifacts/e2e_loop_full_sde/checkpoints
step e2e_full_sde python scripts/e2e_loop.py --width full \
    --out artifacts/e2e_loop_full_sde --skip-train \
    --fast-scheduler dpm_solver_sde --train-images 384 \
    --batch 32 --clf-hard 0.6 --seed 0

step remat_sweep python scripts/profile_remat.py --steps 30 \
    --out artifacts/remat_sweep.json

echo "=== QUEUE D DONE ($(date -u +%H:%M:%SZ)) ==="
