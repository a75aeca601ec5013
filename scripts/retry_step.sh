#!/bin/bash
# retry_step.sh <attempts> <limit_s> <done_file> -- cmd args...
#
# Runs cmd (in its own session) until done_file exists. If the process is
# still running without the done file after limit_s, it is killed
# (pid-exact, never by pattern) and retried — the recovery loop for the
# axon tunnel's random client-stream wedges (a wedged client blocks
# forever in a futex while the chip answers fresh clients in
# milliseconds; see NOTES_ROUND5.md "Tunnel-wedge hardening").
# Exit 0 iff the done file exists at the end.
ATTEMPTS=$1; LIMIT=$2; DONE=$3; shift 3
[ "$1" = "--" ] && shift
for i in $(seq 1 "$ATTEMPTS"); do
  setsid "$@" &
  PID=$!
  SECS=0
  while kill -0 "$PID" 2>/dev/null && [ "$SECS" -lt "$LIMIT" ]; do
    sleep 15; SECS=$((SECS + 15))
    [ -f "$DONE" ] && break
  done
  if [ -f "$DONE" ]; then
    wait "$PID" 2>/dev/null
    exit 0
  fi
  echo "[retry_step] attempt $i/$ATTEMPTS hit ${LIMIT}s without $DONE — killing pid $PID" >&2
  kill -TERM -- -"$PID" 2>/dev/null; kill -TERM "$PID" 2>/dev/null
  sleep 5
  kill -KILL -- -"$PID" 2>/dev/null; kill -KILL "$PID" 2>/dev/null
done
[ -f "$DONE" ]
