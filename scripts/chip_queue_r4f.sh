#!/bin/bash
# Round-4 chip queue, part F: the 7-class conditional retrain the
# first full-width run showed is needed — at 230 epochs (12.9k steps)
# the conditional loss (2.3e-3) was still falling and NV/BKL missed the
# consistency bar; the per-class flagship run needed ~3x more optimizer
# work (1000 epochs) to reach its best 1.4e-3. This run gives the
# conditional model the same budget: 384 img/class (more diversity for
# the weak classes) x 450 epochs = 37.8k steps (~3x run 1), then
# re-runs the release gauntlet on the new checkpoint.
#
# Driven by scripts/guard_bench.sh: if the round-end driver bench
# starts, the whole queue process group is killed so the bench numbers
# stay uncontended.
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

step e2e_cond_full_v2 python scripts/e2e_conditional.py --width full \
    --classes MEL,NV,BCC,AKIEC,BKL,DF,VASC \
    --out artifacts/e2e_conditional_full_v2 \
    --train-images 384 --epochs 450 --batch 32 --clf-hard 0.6 \
    --guidance 1,2,3 --seed 0

step gauntlet_cond_v2 python scripts/parity_gauntlet.py \
    --checkpoints artifacts/e2e_conditional_full_v2/checkpoints \
    --out artifacts/parity_gauntlet_conditional_v2.json \
    --samples-per-class 2

echo "=== QUEUE F DONE ($(date -u +%H:%M:%SZ)) ==="
