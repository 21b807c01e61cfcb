#!/bin/bash
# Round-5 chip queue, phase 3 (VERDICT r4 next #2, retake): the quality
# leg re-run on the REWORKED synthetic generator.  Phase 1's quality run
# trained on the earlier generator whose FastPM truth was nearly affine in
# the input velocity, so the linear-velocity baseline was unbeatable by
# construction (measured: model 0.1216 vs baseline 0.0560).  The 2LPT
# generator makes >=80% of the target rms orthogonal to the baseline while
# keeping >=85% of it inside a 3-cell receptive field
# (tests/test_quality_premise.py) — the comparison is now honest in both
# directions.  Waits for FOLLOWUP_DONE from scripts/round5_followup.sh.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round5_queue.jsonl}

for i in $(seq 1 300); do
  grep -q FOLLOWUP_DONE "$OUT" && break
  sleep 60
done
if ! grep -q FOLLOWUP_DONE "$OUT"; then
  echo "### QUALITY2_ABORT no FOLLOWUP_DONE after 5 h $(date -u +%FT%TZ)" >> "$OUT"
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

# headline bench config (32^3 b4 K14 bf16 masked window-2), 16 test cubes
Q="--model shiftinv --synthetic --cells 32 -b 4 -k 14 --dtype bfloat16 --knn_window 2 -t 16 -n r5quality2"

run quality2_train 3300 python -m nbody_tpu.cli.train $Q -i 4000 --scan 100
run quality2_eval 900 python -m nbody_tpu.cli.eval $Q --plot artifacts/r5quality2_vs_linear.png

# 64^3 without remat (VERDICT r4 #3 follow-through): remat re-runs the
# forward in the backward (~1.3x passes); it exists to fit the 8 GiB
# one-hot masks, which index mode never materializes.  If index+noremat
# fits, the recompute tax vanishes and per-particle throughput at 64^3
# should approach the 32^3 rate.
B="python scripts/bench_step.py --platform default"
run s64_idx888_noremat 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --core 8 8 8 --scan 3
run s64_idx8816_noremat 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --core 8 8 16 --scan 3

echo "QUALITY2_DONE $(date -u +%FT%TZ)" >> "$OUT"
