#!/bin/bash
# Round-5 chip queue part A: complete the full-size PER-CLASS checkpoint
# family (VERDICT r4 "Next round" #1). Round 4 trained MEL at full width
# (artifacts/e2e_loop_full); this queue seeds the family dir with that
# checkpoint and trains the remaining six classes with the identical
# flagship recipe (~41 min/class measured), crash-safe and resumable.
#
# Driven under scripts/guard_bench.sh: if the round-end driver bench
# starts, the queue process group is killed so bench numbers stay
# uncontended — train_family.py --resume continues where it stopped.
cd "$(dirname "$0")/.."
LOGS=artifacts/chip_logs_r5
mkdir -p "$LOGS"

step() {
  local name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%SZ)) ==="
  if timeout "${STEP_TIMEOUT:-21600}" "$@" > "$LOGS/$name.log" 2>&1; then
    echo "=== $name OK ($(date -u +%H:%M:%SZ)) ==="
  else
    echo "=== $name FAILED rc=$? ($(date -u +%H:%M:%SZ)) — see $LOGS/$name.log ==="
  fi
}

# Seed with the round-4 flagship MEL checkpoint — same topology, same
# recipe (384 imgs x 1000 epochs), so the family stays homogeneous.
mkdir -p artifacts/family_full/checkpoints
if [ ! -f artifacts/family_full/checkpoints/unet_MEL_best.pth ] \
   && [ -f artifacts/e2e_loop_full/checkpoints/unet_MEL_best.pth ]; then
  cp artifacts/e2e_loop_full/checkpoints/unet_MEL_best.pth \
     artifacts/family_full/checkpoints/
fi
# (if the round-4 MEL checkpoint did not survive the session boundary,
# train_family simply trains MEL with the rest of the family)

step family_train python scripts/train_family.py \
    --out artifacts/family_full --width full \
    --train-images 384 --epochs 1000 --batch 32 --seed 0 --resume

echo "=== QUEUE R5A DONE ($(date -u +%H:%M:%SZ)) ==="
