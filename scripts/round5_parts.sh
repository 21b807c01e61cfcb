#!/bin/bash
# Round-5 chained queue: the 15-op forward decomposition by program
# ablation (scripts/profile15_parts.py).  Waits for the resume queue's
# RESUME_DONE marker so two programs never share the chip (CLAUDE.md
# platform fact 9/12), then runs the 8-variant ablation sweep at the
# 15-op headline geometry (32^3 b4 K14 w2, core (8,8,8)).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5resume_queue.log}
OUT=${2:-artifacts/r5parts_queue.log}

for i in $(seq 1 420); do
  grep -q RESUME_DONE "$GATE" 2>/dev/null && break
  sleep 60
done
if ! grep -q RESUME_DONE "$GATE" 2>/dev/null; then
  echo "### PARTS_ABORT no RESUME_DONE after 7 h $(date -u +%FT%TZ)" >> "$OUT"
  exit 1
fi
sleep 30

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -14 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

run parts15_888 2400 python scripts/profile15_parts.py --platform default \
    --cells 32 -b 4 -k 14 --window 2 --scan 5 --reps 3 --core 8 8 8

echo "PARTS_DONE $(date -u +%FT%TZ)" >> "$OUT"
