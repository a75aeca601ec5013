#!/bin/bash
# Yield-to-bench guard: while a chip queue (given by a pidfile holding
# its setsid process-group id) runs, watch for the round driver's
# `python bench.py` and, if it appears, terminate the queue's process
# group so the driver measures an uncontended chip. Kills ONLY the
# recorded pgid — never by name/pattern.
#
# Usage: guard_bench.sh /tmp/queue.pid [logfile]
PIDFILE=$1
LOG=${2:-/dev/stderr}
[ -f "$PIDFILE" ] || exit 0
PGID=$(cat "$PIDFILE")

# collect PGIDs of a pid and all its descendants (timeout(1) gives each
# step its own process group, so the queue pgid alone is not enough)
descendant_pgids() {
  local pid=$1 out="$2"
  ps -o pgid= -p "$pid" 2>/dev/null >> "$out"
  local kid
  for kid in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    descendant_pgids "$kid" "$out"
  done
}

while kill -0 "$PGID" 2>/dev/null; do
  # detection only (no pattern kill): driver bench is `python bench.py`
  # run from the repo root
  if ps -eo args | grep -F "bench.py" | grep -vq grep; then
    echo "[guard] bench.py detected $(date -u +%H:%M:%SZ) — stopping queue pgid $PGID + descendants" >> "$LOG"
    T=$(mktemp)
    descendant_pgids "$PGID" "$T"
    for g in $(sort -un "$T"); do kill -TERM -- -"$g" 2>/dev/null; done
    sleep 10
    for g in $(sort -un "$T"); do kill -KILL -- -"$g" 2>/dev/null; done
    rm -f "$T"
    exit 0
  fi
  sleep 15
done
