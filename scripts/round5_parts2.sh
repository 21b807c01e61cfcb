#!/bin/bash
# Round-5 chained queue #5: act on the ablation decomposition.
# The parts sweep localized the 15-op forward (525.7 ms at (8,8,8)) to the
# transpose op (318.6 ms: ~269 wide-ride + ~50 slot contraction), with the
# ride costing ~5x its isolated-chain rate — a pressure/materialization
# effect, not bytes.  Three follow-ups:
#   1. transpose_impl=scan (K narrow passes, no K*C-wide intermediate)
#      head-to-head vs gather, full step + fwd-only.
#   2. The ride's core scaling: ablation trio at (4,8,8)/(2,4,8) — if the
#      transpose delta tracks P, the one-hot dot FLOPs bound it; if flat,
#      granularity/pressure does.
#   3. 64^3 index no-remat at (4,8,8): completes the 64^3 core picture
#      around the new 510.9 ms winner.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5rollout2_queue.log}
OUT=${2:-artifacts/r5parts2_queue.log}

for i in $(seq 1 720); do
  grep -q ROLLOUT2_DONE "$GATE" 2>/dev/null && break
  sleep 60
done
if ! grep -q ROLLOUT2_DONE "$GATE" 2>/dev/null; then
  echo "### PARTS2_ABORT no ROLLOUT2_DONE after 12 h $(date -u +%FT%TZ)" >> "$OUT"
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

run scan_vs_gather 3000 python scripts/profile_step15.py --platform default \
    --cells 32 -b 4 -k 14 --window 2 --scan 5 --reps 3 --core 8 8 8 \
    --impls gather scan --skip_chains
run parts_488 2400 python scripts/profile15_parts.py --platform default \
    --cells 32 -b 4 -k 14 --window 2 --scan 5 --reps 3 --core 4 8 8 \
    --only full no_transpose no_slotsum
run parts_248 2400 python scripts/profile15_parts.py --platform default \
    --cells 32 -b 4 -k 14 --window 2 --scan 5 --reps 3 --core 2 4 8 \
    --only full no_transpose no_slotsum
run s64_idx488_noremat 1500 python scripts/bench_step.py --platform default \
    --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index \
    --core 4 8 8 --scan 3

echo "PARTS2_DONE $(date -u +%FT%TZ)" >> "$OUT"
