#!/bin/bash
# Resume of queue F: the 450-epoch full-size conditional retrain was
# killed at ~epoch 180 when the builder session restarted; the trainer
# checkpoints every 75 epochs and --resume restores optimizer state
# from train_state_conditional.npz, so this continues rather than
# restarts. Same gauntlet follow-up as chip_queue_r4f.sh.
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

step e2e_cond_full_v2_resume python scripts/e2e_conditional.py --width full \
    --classes MEL,NV,BCC,AKIEC,BKL,DF,VASC \
    --out artifacts/e2e_conditional_full_v2 \
    --train-images 384 --epochs 450 --batch 32 --clf-hard 0.6 \
    --guidance 1,2,3 --seed 0 --resume

step gauntlet_cond_v2 python scripts/parity_gauntlet.py \
    --checkpoints artifacts/e2e_conditional_full_v2/checkpoints \
    --out artifacts/parity_gauntlet_conditional_v2.json \
    --samples-per-class 2

echo "=== QUEUE F DONE ($(date -u +%H:%M:%SZ)) ==="
