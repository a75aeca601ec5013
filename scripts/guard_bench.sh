#!/bin/bash
# Yield-to-bench guard: while a chip queue (given by a pidfile holding
# its setsid process-group id) runs, watch for the round driver's
# `python bench.py` and, if it appears, terminate the queue's process
# group so the driver measures an uncontended chip. Kills ONLY the
# recorded pgid — never by name/pattern.
#
# A bench.py run that is ITSELF a descendant of the watched queue (some
# queues end with their own `step bench python bench.py`) must NOT
# trigger the guard — only an OUTSIDE bench (the round driver) does.
#
# Usage: guard_bench.sh /tmp/queue.pid [logfile]
PIDFILE=$1
LOG=${2:-/dev/stderr}
[ -f "$PIDFILE" ] || exit 0
PGID=$(cat "$PIDFILE")

# collect PIDs and PGIDs of a pid and all its descendants (timeout(1)
# gives each step its own process group, so the queue pgid alone is not
# enough)
descendants() {
  local pid=$1 pids_out="$2" pgids_out="$3"
  echo "$pid" >> "$pids_out"
  ps -o pgid= -p "$pid" 2>/dev/null >> "$pgids_out"
  local kid
  for kid in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    descendants "$kid" "$pids_out" "$pgids_out"
  done
}

while kill -0 "$PGID" 2>/dev/null; do
  # detection only (no pattern kill): driver bench is `python bench.py`
  # run from the repo root. Match ONLY argv that STARTS with a python
  # invocation of the file — a substring match once fired on a `bash -c`
  # heredoc that merely mentioned the filename and killed the queue.
  BENCH_PIDS=$(ps -eo pid=,args= | awk '
    function is_py(a) { return a ~ /(^|\/)python[0-9.]*$/ }
    function is_bench(a) { return a ~ /(^|\/)bench\.py$/ }
    (is_py($2) && is_bench($3)) \
    || ($2 == "timeout" && is_py($4) && is_bench($5)) {print $1}')
  if [ -n "$BENCH_PIDS" ]; then
    TP=$(mktemp); TG=$(mktemp)
    descendants "$PGID" "$TP" "$TG"
    OUTSIDE=""
    for b in $BENCH_PIDS; do
      grep -qx "$b" "$TP" || OUTSIDE="$OUTSIDE $b"
    done
    if [ -n "$OUTSIDE" ]; then
      echo "[guard] outside bench.py (pid$OUTSIDE) detected $(date -u +%H:%M:%SZ) — stopping queue pgid $PGID + descendants" >> "$LOG"
      for g in $(sort -un "$TG"); do kill -TERM -- -"$g" 2>/dev/null; done
      sleep 10
      for g in $(sort -un "$TG"); do kill -KILL -- -"$g" 2>/dev/null; done
      rm -f "$TP" "$TG"
      exit 0
    fi
    rm -f "$TP" "$TG"
  fi
  sleep 15
done
