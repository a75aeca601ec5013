#!/bin/bash
# Round-4 chip queue, part C: runs after part B (chained on its PID).
# The conditional-family release gate — parity gauntlet in conditional
# single-checkpoint mode on the flagship 7-class family part B trained
# (VERDICT r3 #7 asked for the gauntlet on the FULL family, not just the
# unconditional class).
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

step gauntlet_cond_full python scripts/parity_gauntlet.py \
    --checkpoints artifacts/e2e_conditional_full/checkpoints \
    --out artifacts/parity_gauntlet_conditional.json --samples-per-class 2

echo "=== QUEUE C DONE ($(date -u +%H:%M:%SZ)) ==="
