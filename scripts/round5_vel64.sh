#!/bin/bash
# Round-5 chained queue #7: BASELINE.json config-4 at its stated scale —
# 64^3 joint position+velocity training step (shiftinv_vel, 9-ch edges)
# with per-step on-device kNN rebuild.  Two legs: the measured 64^3
# winner storage (index, NO remat) and the 32^3 default (auto masks +
# remat) for the same family, closing the family x scale matrix.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5quality64_queue.log}
OUT=${2:-artifacts/r5vel64_queue.log}

for i in $(seq 1 720); do
  grep -q QUALITY64_DONE "$GATE" 2>/dev/null && break
  sleep 60
done
if ! grep -q QUALITY64_DONE "$GATE" 2>/dev/null; then
  echo "### VEL64_ABORT no QUALITY64_DONE after 12 h $(date -u +%FT%TZ)" >> "$OUT"
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

run vel64_idx888 1800 python scripts/bench_step.py --platform default \
    --family shiftinv_vel --cells 64 -b 1 --impl masked \
    --mask_dtype index --core 8 8 8 --scan 3
run vel64_auto_remat 1800 python scripts/bench_step.py --platform default \
    --family shiftinv_vel --cells 64 -b 1 --impl masked --remat --scan 3

echo "VEL64_DONE $(date -u +%FT%TZ)" >> "$OUT"
