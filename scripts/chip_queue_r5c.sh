#!/bin/bash
# Round-5 queue part C — the manual wedge-hardened replacement for the
# tail of part B: every chip step runs under scripts/retry_step.sh (fast
# idle-wedge detection + retry), ordered by evidence value so a round-end
# cut loses the least. Waits for family_score.json (the rescore) first.
cd "$(dirname "$0")/.."
LOGS=artifacts/chip_logs_r5
mkdir -p "$LOGS"

while [ ! -f artifacts/family_score.json ]; do sleep 20; done

# 1. release gate across the 7-checkpoint family (fresh 7/7 run; the
#    round-4 artifact this overwrites covered MEL only)
rm -f artifacts/parity_gauntlet_full.json
bash scripts/retry_step.sh 4 1500 artifacts/parity_gauntlet_full.json -- \
  bash -c "python -u scripts/parity_gauntlet.py \
     --checkpoints artifacts/family_full/checkpoints \
     --out artifacts/parity_gauntlet_full.json --samples-per-class 4 \
     >> $LOGS/gauntlet.log 2>&1" 2>> "$LOGS/retry.log"

# 2. measured train MFU (VERDICT r4 #3)
bash scripts/retry_step.sh 4 900 artifacts/train_mfu.json -- \
  bash -c "python -u scripts/train_mfu_probe.py >> $LOGS/train_mfu.log 2>&1" \
  2>> "$LOGS/retry.log"

# 3. ModelManager churn at the production shape (7 x ~101 MB)
bash scripts/retry_step.sh 4 900 artifacts/model_churn.json -- \
  bash -c "python -u scripts/bench_model_churn.py \
     --checkpoints artifacts/family_full/checkpoints \
     --out artifacts/model_churn.json >> $LOGS/churn.log 2>&1" \
  2>> "$LOGS/retry.log"

# 4. fairness battery on a REAL group split of generated images
#    (4000: half the round-4 corpus, > n>=8 per group by construction;
#    sized to fit the round tail at ~4 img/s generation)
bash scripts/retry_step.sh 3 2400 artifacts/fairness_audit_split4000.json -- \
  bash -c "python -u scripts/fairness_audit.py \
     --generate MEL:4000 --checkpoints artifacts/family_full/checkpoints \
     --classifier artifacts/family_full/checkpoints/classifier.pth \
     --target-class MEL --split median-luminance --seed 0 \
     --out artifacts/fairness_audit_split4000.json \
     >> $LOGS/fairness.log 2>&1" 2>> "$LOGS/retry.log"

echo "=== QUEUE R5C DONE ($(date -u +%H:%M:%SZ)) ===" >> "$LOGS/queueC.log"
