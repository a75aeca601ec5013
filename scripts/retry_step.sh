#!/bin/bash
# retry_step.sh <attempts> <limit_s> <done_file> -- cmd args...
#
# Runs cmd (in its own session) until done_file exists. Two kill triggers,
# both pid-exact (never by pattern):
#   * hard limit: limit_s without the done file;
#   * idle wedge: the process TREE shows <3 CPU ticks per 30s window for
#     4 consecutive windows (~2 min). The axon tunnel randomly wedges a
#     client stream — most often at backend init — leaving the process
#     futex-blocked at ~0% CPU while the chip answers fresh clients in
#     milliseconds. Healthy phases never look like that: XLA compiles burn
#     the CPU, and device-wait phases wake every dispatch (a handful of
#     ticks per window); the longest single dispatch here is ~35 s, well
#     under the 2-minute idle window.
# Exit 0 iff the done file exists at the end.
ATTEMPTS=$1; LIMIT=$2; DONE=$3; shift 3
[ "$1" = "--" ] && shift

tree_ticks() {  # sum utime+stime over pid + children + grandchildren
  local pids p q
  pids=$1
  for p in $(ps -o pid= --ppid "$1" 2>/dev/null); do
    pids="$pids $p"
    for q in $(ps -o pid= --ppid "$p" 2>/dev/null); do pids="$pids $q"; done
  done
  local total=0 t
  for p in $(echo "$pids" | tr ' ' '\n' | sort -un); do
    t=$(awk '{print $14+$15}' "/proc/$p/stat" 2>/dev/null) || continue
    total=$((total + t))
  done
  echo "$total"
}

for i in $(seq 1 "$ATTEMPTS"); do
  setsid "$@" &
  PID=$!
  SECS=0; IDLE=0; LAST=$(tree_ticks "$PID")
  while kill -0 "$PID" 2>/dev/null && [ "$SECS" -lt "$LIMIT" ]; do
    sleep 30; SECS=$((SECS + 30))
    [ -f "$DONE" ] && break
    NOW=$(tree_ticks "$PID")
    if [ $((NOW - LAST)) -lt 3 ]; then IDLE=$((IDLE + 1)); else IDLE=0; fi
    LAST=$NOW
    if [ "$IDLE" -ge 4 ]; then
      echo "[retry_step] attempt $i: idle wedge (~0% CPU for 2 min)" >&2
      break
    fi
  done
  if [ -f "$DONE" ]; then
    wait "$PID" 2>/dev/null
    exit 0
  fi
  echo "[retry_step] attempt $i/$ATTEMPTS failed (${SECS}s, idle=$IDLE) — killing pid $PID" >&2
  kill -TERM -- -"$PID" 2>/dev/null; kill -TERM "$PID" 2>/dev/null
  sleep 5
  kill -KILL -- -"$PID" 2>/dev/null; kill -KILL "$PID" 2>/dev/null
done
[ -f "$DONE" ]
