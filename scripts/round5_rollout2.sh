#!/bin/bash
# Round-5 chained queue #4: rollout retake with properly-trained pair
# models.  The first r5chain run trained each redshift pair only 400 iters
# at the DEFAULT lr 0.01 — the LR probe's worst setting (flat at the
# identity floor) — so the compounding chain lost to even the truth-reset
# linear baseline.  Retake: lr 1e-3 (probe winner), 4000 iters/pair,
# device-resident feed; the report now also carries the like-for-like
# AUTOREGRESSIVE linear-chain column.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5continue_queue.log}
OUT=${2:-artifacts/r5rollout2_queue.log}

for i in $(seq 1 600); do
  grep -q CONTINUE_DONE "$GATE" 2>/dev/null && break
  sleep 60
done
if ! grep -q CONTINUE_DONE "$GATE" 2>/dev/null; then
  echo "### ROLLOUT2_ABORT no CONTINUE_DONE after 10 h $(date -u +%FT%TZ)" >> "$OUT"
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

run rollout2 6600 python -m nbody_tpu.cli.rollout --steps 4 -i 4000 --scan 100 \
    -l 0.001 -b 4 --cells 32 --synthetic -k 14 -t 4 --dtype bfloat16 \
    --device_data auto -n r5chain2

echo "ROLLOUT2_DONE $(date -u +%FT%TZ)" >> "$OUT"
