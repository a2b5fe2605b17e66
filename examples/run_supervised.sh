#!/bin/bash
# Crash-proof runner for long TPU jobs in this container (round-5 hardening
# of the round-4 ad-hoc wrapper, which was lost to a container reset):
#
#   examples/run_supervised.sh LOGFILE STALL_SECS -- cmd args...
#
# - restarts the command on nonzero exit (the tunneled TPU worker crashes
#   transiently: "UNAVAILABLE: TPU worker process crashed");
# - kills + restarts it if LOGFILE stops growing for STALL_SECS (tunnel
#   fetches can hang forever without erroring);
# - the command must be RESUMABLE (orbax --ckpt-dir resume, shard-skipping
#   datagen) so a restart loses at most one checkpoint interval.
#
# Exits 0 when the command exits 0. Never uses pkill-by-pattern (CLAUDE.md).
set -u
LOG="$1"; STALL="$2"; shift 3   # third arg is the "--" separator

attempt=0
while :; do
  attempt=$((attempt + 1))
  echo "[supervise] attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  # watchdog: poll the log mtime while the job runs
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL" ]; then
      echo "[supervise] stalled ${STALL}s, killing $pid" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[supervise] done after $attempt attempt(s)" >> "$LOG"
    exit 0
  fi
  echo "[supervise] rc=$rc; restarting in 20 s" >> "$LOG"
  sleep 20
done
