#!/bin/bash
# Resume of scripts/round4_queue.sh after the 13:52 session restart killed
# the runner mid headline_i8_g4.  Everything up to profile_decomp ran and
# is recorded in /tmp/round4_queue.jsonl; this file holds the remainder,
# reordered:
#   1. bench.py FIRST — the in-queue bench_py_early ran at 12:24 while the
#      tunnel was still settling and fell back to CPU (3,108 pps); secure
#      the real TPU official number before any further Pallas compiles
#      (the relay-wedge risk, CLAUDE.md platform fact 9).
#   2. A small idx-mode smoke before the full idx sweep: the first on-chip
#      attempt died in Mosaic lowering (sublane block dim g<8); the
#      (B,NB//g,g,ET) staging fix needs one cheap compile proof before
#      committing 900 s entries to it.
#   3. idx sweep (the expected headline), kNN selection, then the int4 and
#      leftover int8 entries (int8 measured SLOWER than the XLA bf16
#      einsum — 268 vs 171 ms — so these are for-the-record).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round4_queue.jsonl}

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

B="python scripts/bench_step.py --platform default"

run bench_py_live 1500 python bench.py
# idx-mode smoke: tiny shape, proves the Mosaic lowering fix compiles.
# The full idx sweep is GATED on it — a lowering failure would make every
# 900 s idx entry fail identically.
run idx_smoke 400 $B --family shiftinv --cells 16 -b 2 --impl masked --mask_dtype index --scan 2
if tail -3 "$OUT" | grep -q '"step_ms"'; then
  # 5d. mask-FREE idx-dot path — the expected round-4 headline configuration
  run headline_idx 900 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --scan 10
  run headline_idx_g1 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --group 1 --scan 10
  run headline_idx_g4 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --group 4 --scan 10
  run headline_idx_888 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --core 8 8 8 --group 1 --scan 10
  run shiftinv15_idx 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype index --scan 5
  run shiftinv_64_idx 900 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --remat --scan 3
  run headline_idx_iter 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --knn_select iter --scan 10
  run headline_idx_ktop 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --knn_select pallas --scan 10
  # step decomposition on the idx path (first attempt died in Mosaic lowering)
  run profile_decomp_idx 1500 python scripts/profile_step4.py --platform default --mask_dtype index
else
  echo "### idx_smoke FAILED - skipping idx sweep" >> "$OUT"
fi
# 5e. kNN k-selection variants on the auto mask mode (idx-independent)
run headline_iter 700 $B --family shiftinv --cells 32 -b 4 --impl masked --knn_select iter --scan 10
run knn_micro 900 python scripts/bench_knn.py --platform default --cells 32 -b 4
# 5b/5c leftovers: int8 g4 (interrupted), 15-op int8, and the int4 family
run headline_i8_g4 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype int8 --group 4 --scan 10
run shiftinv15_i8 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype int8 --scan 5
run headline_i4 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype int4 --scan 10
run shiftinv15_i4 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype int4 --scan 5
run shiftinv_64_i4 900 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype int4 --remat --scan 3
# 7. record the fastest measured headline config for bench.py to adopt
python scripts/pick_winner.py "$OUT" >> "$OUT" 2>>"$OUT.err"
# 8. official headline on the winner config
run bench_py 1500 python bench.py

echo "QUEUE_DONE $(date -u +%FT%TZ)" >> "$OUT"
