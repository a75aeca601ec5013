#!/bin/bash
# Round-4 chip queue, part B: resume after the VM restart that killed the
# original queue at step 2 (e2e_full had completed; its checkpoints are on
# disk at artifacts/e2e_loop_full/checkpoints). Runs the remaining steps.
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

# 2. sampler ladder + UniPC rungs + trailing comparison at full width
step ladder_full python scripts/sampler_ladder.py --width full \
    --checkpoints artifacts/e2e_loop_full/checkpoints \
    --out artifacts/sampler_ladder_full.json
step ladder_full_unipc python scripts/sampler_ladder.py --width full \
    --checkpoints artifacts/e2e_loop_full/checkpoints \
    --out artifacts/sampler_ladder_full_unipc.json \
    --configs "unipc:20:trailing,unipc:8:trailing,ddim:8:trailing,dpm_solver:20:trailing"

# 3. flagship 7-class conditional family + CFG sweep
step e2e_cond_full python scripts/e2e_conditional.py --width full \
    --classes MEL,NV,BCC,AKIEC,BKL,DF,VASC \
    --out artifacts/e2e_conditional_full --train-images 256 --epochs 230 \
    --batch 32 --clf-hard 0.6 --guidance 1,2,3 --seed 0

# 4. parity gauntlet as the standing release gate on the full-size family
step gauntlet_full python scripts/parity_gauntlet.py \
    --checkpoints artifacts/e2e_loop_full/checkpoints \
    --out artifacts/parity_gauntlet_full.json --samples-per-class 4

# 5. augmentation quality evidence (strength sweep, diversity, inpaint)
step augment_eval python scripts/augment_eval.py --width full \
    --checkpoints artifacts/e2e_loop_full/checkpoints \
    --out artifacts/augment_eval_full.json

# 6. fairness audit at the BASELINE 8000-sample scale (heuristic grouping)
#    + a curated-labels run (synthetic phototype rendering) that also
#    validates the luminance heuristic against ground truth
step fairness_8000 python scripts/fairness_audit.py \
    --generate MEL:8000 --checkpoints artifacts/e2e_loop_full/checkpoints \
    --target-class MEL --batch 64 \
    --out artifacts/fairness_audit_8000.json
step fairness_curated python scripts/fairness_audit.py \
    --generate MEL:2000 --checkpoints artifacts/e2e_loop_full/checkpoints \
    --target-class MEL --batch 64 --phototype-sim 0.35 \
    --out artifacts/fairness_audit_curated.json

# 7. one more distillation attack at full width: longer phases on the
#    flagship teacher (the r3 quarter-width students lost to the teacher)
STEP_TIMEOUT=10800 step distill_full python scripts/distill_ladder.py --width full \
    --checkpoints artifacts/e2e_loop_full/checkpoints \
    --out artifacts/distill_ladder_full --start 32 --end 8 \
    --steps-per-phase 3000 --train-images 384

# 8. refresh the headline bench (now with per-rung mfu_pct)
step bench python bench.py

echo "=== QUEUE DONE ($(date -u +%H:%M:%SZ)) ==="
