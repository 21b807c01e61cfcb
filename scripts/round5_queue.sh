#!/bin/bash
# Round-5 chip queue, phase 1 (VERDICT r4 next #1, #2, #8 groundwork):
#   1. QUALITY leg (VERDICT #2): train shiftinv at full 32^3 scale to 3000
#      scan-steps (~10-20 min incl. host batching over the tunnel), then
#      the eval sweep producing the reference's own headline comparison —
#      model vs linear-velocity baseline medians + figure artifact.
#   2. shiftinv15 transpose-impl A/B (VERDICT #1): the round-4 gather
#      baseline re-measured next to the round-5 scatter rework.
#   3. The 15-op step decomposition (profile_step15) that localizes the
#      3.7x roofline gap.
# Discipline (CLAUDE.md facts 6/9): timeout-bounded entries, 30 s teardown
# gaps, a failed entry does not stop the queue.  Run behind a tunnel probe
# (scripts/wait_and_run_queue.sh).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round5_queue.jsonl}
: > "$OUT"

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -8 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

B="python scripts/bench_step.py --platform default"
# quality-leg common flags: the headline bench config (32^3 b4 K14 bf16
# masked window-2), 16 held-out test cubes
Q="--model shiftinv --synthetic --cells 32 -b 4 -k 14 --dtype bfloat16 --knn_window 2 -t 16 -n r5quality"

# 1. quality leg: converged training run + baseline-compared eval
run quality_train 2400 python -m nbody_tpu.cli.train $Q -i 3000 --scan 100
run quality_eval 900 python -m nbody_tpu.cli.eval $Q --plot artifacts/r5quality_vs_linear.png

# 2. the 15-op transpose A/B (round-4 baseline: gather = 1119.4 ms)
run bench15_gather 1200 $B --family shiftinv15 --cells 32 -b 4 --impl masked --scan 5
run bench15_scatter 1200 env NBODY15_TRANSPOSE=scatter $B --family shiftinv15 --cells 32 -b 4 --impl masked --scan 5

# 3. decomposition: full/fwd per impl + mask-pass chains at 15-op widths
run profile15 3000 python scripts/profile_step15.py --platform default

echo "QUEUE_DONE $(date -u +%FT%TZ)" >> "$OUT"
