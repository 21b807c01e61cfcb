#!/bin/bash
# Follow-up chip runs after scripts/round4_resume.sh completes: waits for
# QUEUE_DONE in the queue output, then measures what the first pass could
# not:
#   1. The auto-mode step decomposition (profile_step4) — first attempt
#      died on HTTP 413 (the one-hot was a jit closure constant; fixed).
#   2. shiftinv15 idx-mode retry with a compile-sized timeout (the 900 s
#      entry spent its whole budget in compile).
#   3. The 'nt' idx gather synthesis variant (standard-orientation dot;
#      tests whether Mosaic's lhs-dim-0 contraction transposes the
#      one-hot tile per block, explaining the flat ~232 ms idx floor).
#   4. pick_winner + bench.py refresh if anything won.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round4_queue.jsonl}

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
  timeout "$t" "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

B="python scripts/bench_step.py --platform default"

run profile_decomp_auto 1500 python scripts/profile_step4.py --platform default
run headline_idx_nt 900 env NBODY_IDX_SYNTH=nt $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --scan 10
run shiftinv15_idx_retry 1800 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype index --scan 5
python scripts/pick_winner.py "$OUT" >> "$OUT" 2>>"$OUT.err"
run bench_py_final 1500 python bench.py

echo "FOLLOWUP_DONE $(date -u +%FT%TZ)" >> "$OUT"
