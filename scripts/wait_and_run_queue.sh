#!/bin/bash
# Wait-for-tunnel wrapper around the round-4 chip measurement queue
# (CLAUDE.md platform fact 9: probe with a bounded timeout before every
# TPU run; queue chip work behind a wait-for-tunnel loop).
#
# Loops a 200 s-bounded probe every PROBE_GAP seconds; on the first live
# probe it waits out the teardown window and runs scripts/round4_queue.sh
# once, then exits.  Bounded by DEADLINE_S total wall time so it can never
# outlive the round.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round4_queue.jsonl}
LOG=${2:-/tmp/wait_queue.log}
QUEUE=${3:-scripts/round4_queue.sh}
PROBE_GAP=${PROBE_GAP:-540}
DEADLINE_S=${DEADLINE_S:-39600}   # 11 h
START=$(date +%s)

echo "WAIT_START $(date -u +%FT%TZ)" >> "$LOG"
while :; do
  now=$(date +%s)
  if (( now - START > DEADLINE_S )); then
    echo "WAIT_DEADLINE $(date -u +%FT%TZ)" >> "$LOG"
    exit 1
  fi
  if timeout 200 python scripts/profile_ops.py --probe-only 2>>"$LOG" \
      | grep -q 'tunnel probe: OK'; then
    echo "PROBE_OK $(date -u +%FT%TZ)" >> "$LOG"
    sleep 30   # let the probe process's chip teardown finish
    bash "$QUEUE" "$OUT" >> "$LOG" 2>&1
    echo "WAIT_DONE $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "PROBE_HUNG $(date -u +%FT%TZ)" >> "$LOG"
  sleep "$PROBE_GAP"
done
