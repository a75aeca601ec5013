#!/bin/bash
# Round-5 chip queue part B — runs after part A (family training) frees
# the chip. Evidence order follows VERDICT r4 priorities:
#   1. score_family   — per-class Frechet/consistency table over the 7
#                       full-size checkpoints with the round-5 probe
#                       (256 img/class x 24 epochs, target MEL >= 0.70)
#   2. gauntlet_full  — release gate across the 7-class family
#   3. model_churn    — ModelManager load/unload/cache at 7 x ~101 MB
#   4. e2e_cond_v3    — conditional retrain with the competent probe +
#                       finer guidance grid (MEL absolute-bar verdict)
#   5. gauntlet_cond_v3
#   6. fairness_split — the full stats battery on a REAL group split of
#                       8000 generated images (median-luminance halves)
#   7. train_mfu      — measured train-step FLOPs -> train MFU artifact
#   8. bench_suite    — refresh BENCHMARKS.md incl. the XAI pipeline row
#
# Each step is independent: a failure logs and the queue continues.
cd "$(dirname "$0")/.."
LOGS=artifacts/chip_logs_r5
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

# wait for part A (family training) to release the chip
if [ -f /tmp/chipqueue_r5.pid ]; then
  while kill -0 "$(cat /tmp/chipqueue_r5.pid)" 2>/dev/null; do sleep 60; done
fi

step score_family python scripts/score_family.py \
    --checkpoints artifacts/family_full/checkpoints \
    --out artifacts/family_score.json \
    --clf-per-class 256 --clf-epochs 24 --clf-hard 0.6

step gauntlet_full python scripts/parity_gauntlet.py \
    --checkpoints artifacts/family_full/checkpoints \
    --out artifacts/parity_gauntlet_full.json --samples-per-class 4

step model_churn python scripts/bench_model_churn.py \
    --checkpoints artifacts/family_full/checkpoints \
    --out artifacts/model_churn.json

step fairness_split python scripts/fairness_audit.py \
    --generate MEL:8000 --checkpoints artifacts/family_full/checkpoints \
    --classifier artifacts/family_full/checkpoints/classifier.pth \
    --target-class MEL --split median-luminance --seed 0 \
    --out artifacts/fairness_audit_split8000.json

step train_mfu python - <<'PY'
import json
from synt_isic_tpu.train.benchmark import measure_train_step
from synt_isic_tpu.utils.compute import TPU_PEAKS
import jax
r = measure_train_step(False, 32, 30)
entry = TPU_PEAKS.get(jax.devices()[0].device_kind)
if entry and r.get("flops_per_step"):
    r["train_mfu_pct"] = round(
        r["flops_per_step"] / r["sec_per_step"] / entry[0] * 100, 1)
    r["chip_peak_flops"] = entry[0]
open("artifacts/train_mfu.json", "w").write(json.dumps(r, indent=2))
print(json.dumps(r, indent=2))
PY

step bench_suite python scripts/bench_suite.py

# The conditional-v3 retrain is the longest single job and is resumable
# (--resume continues from the optimizer snapshot after a timeout kill),
# so it runs LAST: the cheap evidence steps above must not be starved by
# it if the round ends mid-train.
step e2e_cond_v3 python scripts/e2e_conditional.py --width full \
    --classes MEL,NV,BCC,AKIEC,BKL,DF,VASC \
    --out artifacts/e2e_conditional_full_v3 \
    --train-images 384 --epochs 450 --batch 32 --clf-hard 0.6 \
    --clf-per-class 256 --clf-epochs 24 \
    --guidance 1,1.5,2,2.5,3 --seed 0 --resume

step gauntlet_cond_v3 python scripts/parity_gauntlet.py \
    --checkpoints artifacts/e2e_conditional_full_v3/checkpoints \
    --out artifacts/parity_gauntlet_conditional_v3.json \
    --samples-per-class 2

echo "=== QUEUE R5B DONE ($(date -u +%H:%M:%SZ)) ==="
