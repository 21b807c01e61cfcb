#!/bin/bash
# Round-5 chip queue, phase 3 RETAKE (VERDICT r4 next #2): the quality leg
# on the honest generator (2LPT + psi1*delta mode coupling + local growth
# modulation), with a measured LR probe before the long train.
#
# Why the probe: the premise5 CPU run showed lr=0.01 (the reference
# default) FLAT at the identity floor (~0.174 = predict zero residual)
# through 200 iters at 16^3 on the new truth, while the residual's
# decomposition (PERF.md round-5 quality section) says coupling+tanh alone
# (0.105 of 0.174) already beat the linear baseline (0.159).  The chip is
# ~50x faster per step than the contended CPU, so the probe costs ~10 min
# and de-risks the 6000-iter train.  Replaces round5_quality2.sh (killed
# before its chip phase started).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round5_queue.jsonl}

for i in $(seq 1 300); do
  grep -q FOLLOWUP_DONE "$OUT" && break
  sleep 60
done
if ! grep -q FOLLOWUP_DONE "$OUT"; then
  echo "### QUALITY3_ABORT no FOLLOWUP_DONE after 5 h $(date -u +%FT%TZ)" >> "$OUT"
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

# headline bench config (32^3 b4 K14 bf16 masked window-2), 16 test cubes
Q="--model shiftinv --synthetic --cells 32 -b 4 -k 14 --dtype bfloat16 --knn_window 2 -t 16"

# LR probe: 800 iters each, scan-100 -> 8 checkpoint lines per probe
run probe_lr01  900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.01  -n r5lr01
run probe_lr003 900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.003 -n r5lr003
run probe_lr001 900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.001 -n r5lr001

# static default (also what the dry-parse test substitutes); the probe
# result overrides it unless pick_lr itself failed
BEST="0.003"
PICKED=$(python scripts/pick_lr.py "$OUT" probe_lr01=0.01 probe_lr003=0.003 \
         probe_lr001=0.001 2>>"$OUT") && BEST=$PICKED
echo "### BEST_LR=$BEST $(date -u +%FT%TZ)" >> "$OUT"

# The long train (~17 min at 171 ms/step) + the eval artifact (VERDICT r4
# missing #1: model vs linear-velocity baseline medians + figure)
run quality3_train 3300 python -m nbody_tpu.cli.train $Q -i 6000 --scan 100 -l "$BEST" -n r5quality3
run quality3_eval 900 python -m nbody_tpu.cli.eval $Q -l "$BEST" -n r5quality3 \
    --plot artifacts/r5quality3_vs_linear.png

# 64^3 no-remat leg (carried from the retired round5_quality2.sh): remat
# re-runs the forward in the backward (~1.3x passes); it exists to fit the
# 8 GiB one-hot masks, which index mode never materializes.  If
# index+noremat fits, the recompute tax vanishes.
B="python scripts/bench_step.py --platform default"
run s64_idx888_noremat 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --core 8 8 8 --scan 3
run s64_idx8816_noremat 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --core 8 8 16 --scan 3

echo "QUALITY3_DONE $(date -u +%FT%TZ)" >> "$OUT"
