#!/bin/bash
# Round-4 chip queue, part E (chained after part D):
#  1. re-run the per-class flagship parity gauntlet — the first run failed
#     sidecar reproduce because the smoke step generated at batch 4 and
#     reproduce regenerated at batch 1 (XLA float tiling is batch-shape-
#     dependent); sidecars now record the device-block layout and
#     --reproduce rebuilds the SAME block
#  2. re-run the 8000-sample fairness audit — the auditor now reports
#     group_underrepresented for an empty heuristic group instead of
#     fabricating a ~1.0 parity gap from an all-zeros distribution
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

step gauntlet_full_v2 python scripts/parity_gauntlet.py \
    --checkpoints artifacts/e2e_loop_full/checkpoints \
    --out artifacts/parity_gauntlet_full.json --samples-per-class 4

step fairness_8000_v2 python scripts/fairness_audit.py \
    --generate MEL:8000 --checkpoints artifacts/e2e_loop_full/checkpoints \
    --target-class MEL --batch 64 --out artifacts/fairness_audit_8000.json

echo "=== QUEUE E DONE ($(date -u +%H:%M:%SZ)) ==="
