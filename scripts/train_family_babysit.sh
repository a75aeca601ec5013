#!/bin/bash
# Watchdog driver for scripts/train_family.py on a wedge-prone tunnel.
#
# Observed twice during the round-5 family run (and once in round 4, see
# NOTES_ROUND5.md "Tunnel-wedge hardening"): the axon TPU tunnel wedges a
# LONG-LIVED client stream mid-class — the trainer blocks forever in a
# futex wait while the chip answers a fresh client in milliseconds. The
# fix is kill + `--resume` (optimizer-state snapshot) and, with the
# persistent compile cache train_family.py now enables, a restart costs
# about a minute of recompile instead of eight.
#
# This script loops the trainer and restarts it whenever no checkpoint
# file has been written for WEDGE_S seconds (default 600; normal steady
# state writes a ~101 MB snapshot every ~6 min). A fresh process gets a
# STARTUP_S grace period for dataset build + (cached) compile. Exits when
# family_train.json reports family_complete.
#
# Usage: train_family_babysit.sh [out_dir]   (default artifacts/family_full)
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/family_full}
LOG=${BABYSIT_LOG:-artifacts/chip_logs_r5/family_babysit.log}
WEDGE_S=${WEDGE_S:-600}
STARTUP_S=${STARTUP_S:-1500}
mkdir -p "$(dirname "$LOG")" "$OUT/checkpoints"

family_complete() {
  python - "$OUT" <<'PY'
import json, sys
from pathlib import Path
r = Path(sys.argv[1]) / "family_train.json"
ok = r.exists() and json.loads(r.read_text()).get("family_complete")
sys.exit(0 if ok else 1)
PY
}

while ! family_complete; do
  setsid python scripts/train_family.py --out "$OUT" --width full \
      --train-images 384 --epochs 1000 --batch 32 --seed 0 --resume \
      >> "$LOG" 2>&1 &
  PID=$!
  echo "[babysit] trainer started pid $PID $(date -u +%H:%M:%SZ)" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    newest=$(find "$OUT/checkpoints" -name '*.pth' \
                  -newermt "-${WEDGE_S} seconds" 2>/dev/null | head -1)
    age=$(ps -o etimes= -p "$PID" 2>/dev/null | tr -d ' ')
    [ -z "$age" ] && break
    if [ -z "$newest" ] && [ "$age" -gt "$STARTUP_S" ]; then
      echo "[babysit] no checkpoint writes in ${WEDGE_S}s (age ${age}s)" \
           "— restarting $(date -u +%H:%M:%SZ)" >> "$LOG"
      # kill ONLY this trainer: its own process group (setsid) + any
      # direct children, never by name/pattern
      for k in $(ps -o pid= --ppid "$PID" 2>/dev/null); do
        kill -TERM "$k" 2>/dev/null
      done
      kill -TERM -- -"$PID" 2>/dev/null; kill -TERM "$PID" 2>/dev/null
      sleep 10
      kill -KILL -- -"$PID" 2>/dev/null; kill -KILL "$PID" 2>/dev/null
      break
    fi
  done
  sleep 5
done
echo "[babysit] family complete $(date -u +%H:%M:%SZ)" >> "$LOG"
