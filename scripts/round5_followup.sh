#!/bin/bash
# Round-5 chip queue, phase 2 (VERDICT r4 next #3, #8, #2-rollout): waits
# for QUEUE_DONE from scripts/round5_queue.sh, then:
#   1. The 64^3 perf pass (VERDICT #3): index mode at the large cores the
#      mask HBM cap forbids for one-hot storage, the big-core auto/int4
#      points, and the kNN k-selection variants at the scale where the
#      (B, N, 125) distance stream is 8x the 32^3 one.
#   2. The 15-op headline sweep (VERDICT #8): transpose impl x core.
#   3. The rollout chain re-run with per-hop baseline-vs-model medians
#      (VERDICT #2), at 400 iters/pair on the scan path.
#   4. pick_winner + the official bench.py on the final code.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round5_queue.jsonl}

for i in $(seq 1 240); do
  grep -q QUEUE_DONE "$OUT" && break
  sleep 60
done
if ! grep -q QUEUE_DONE "$OUT"; then
  echo "### FOLLOWUP_ABORT no QUEUE_DONE after 4 h $(date -u +%FT%TZ)" >> "$OUT"
  exit 1
fi
sleep 30

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -8 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

B="python scripts/bench_step.py --platform default"

# 1. 64^3 sweep (b1 K14 +remat, scan-3; round-4 anchors: auto 608.7 ms
#    stepped-down core, index 637.4 ms default core)
run s64_idx_888 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --mask_dtype index --core 8 8 8 --scan 3
run s64_idx_8816 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --mask_dtype index --core 8 8 16 --scan 3
run s64_auto_488 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --core 4 8 8 --scan 3
run s64_int4_488 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --mask_dtype int4 --core 4 8 8 --scan 3
run s64_auto_iter 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --knn_select iter --scan 3
run s64_auto_pallas 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --knn_select pallas --scan 3

# 2. 15-op headline sweep (32^3 b4, scan-5; phase 1 measured both impls
#    at the default (4,8,8) core)
run s15_scatter_888 1200 env NBODY15_TRANSPOSE=scatter $B --family shiftinv15 --cells 32 -b 4 --impl masked --core 8 8 8 --scan 5
run s15_gather_888 1200 $B --family shiftinv15 --cells 32 -b 4 --impl masked --core 8 8 8 --scan 5
run s15_scatter_448 1200 env NBODY15_TRANSPOSE=scatter $B --family shiftinv15 --cells 32 -b 4 --impl masked --core 4 4 8 --scan 5

# 3. rollout chain with per-hop baseline medians (400 iters/pair, scan-50)
run rollout_r5 2400 python -m nbody_tpu.cli.rollout --steps 4 -i 400 --scan 50 -b 4 \
    --cells 32 --synthetic -k 14 -t 4 --dtype bfloat16 -n r5chain

# 4. winner + the official number on the final code
run pick_winner 120 python scripts/pick_winner.py "$OUT"
run bench_py 1500 python bench.py

echo "FOLLOWUP_DONE $(date -u +%FT%TZ)" >> "$OUT"
