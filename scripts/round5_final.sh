#!/bin/bash
# Round-5 final queue (post machine-swap rerun): the two legs the dead
# round5_vel64.sh chain never got to run — BASELINE.json config-4
# ("64^3 cube batched training, joint position+velocity loss with
# periodic kNN rebuild per step") measured under both the 64^3 winner
# storage (index, NO remat) and the 32^3 default (auto masks + remat).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/r5final_queue.log}

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -14 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 25
}

run vel64_idx888 1500 python scripts/bench_step.py --platform default \
    --family shiftinv_vel --cells 64 -b 1 --impl masked \
    --mask_dtype index --core 8 8 8 --scan 3
run vel64_auto_remat 1500 python scripts/bench_step.py --platform default \
    --family shiftinv_vel --cells 64 -b 1 --impl masked --remat --scan 3

echo "VEL64_DONE $(date -u +%FT%TZ)" >> "$OUT"
