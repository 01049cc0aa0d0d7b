#!/bin/bash
# Stall-aware TPU job runner: runs a command, watches its log for progress
# markers, and kills + retries if nothing appears within the grace period
# (the axon tunnel occasionally wedges a fresh client that starts right
# after another client exits — the wedged process sits at ~0 CPU forever).
#   scripts/tpu_run.sh <logfile> <grace_s> <total_timeout_s> <cmd...>
LOG=$1; GRACE=$2; TOTAL=$3; shift 3
for attempt in 1 2 3; do
  : > "$LOG"
  setsid timeout "$TOTAL" "$@" >> "$LOG" 2>&1 &
  PID=$!
  SECONDS=0
  stalled=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 15
    if [ "$SECONDS" -gt "$GRACE" ] && \
       ! grep -qE "INFO epoch|regen epoch|hybrid inference|seqs_per_sec" "$LOG"; then
      echo "[tpu_run] stalled after ${SECONDS}s (attempt $attempt), retrying" >> "$LOG"
      kill -- -"$PID" 2>/dev/null
      sleep 25
      stalled=1
      break
    fi
  done
  if [ "$stalled" -eq 1 ]; then continue; fi
  wait "$PID"; RC=$?
  exit $RC
done
exit 1
