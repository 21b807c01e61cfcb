#!/bin/bash
# Round-5 chained queue #6: two quality-leg extensions.
#
# 1. Continue the r5quality training a third leg (21.1k -> 33.1k iters,
#    device-resident feed, 174 ms/step): the 21.1k eval was still
#    improving at cutoff (0.1931 vs baseline 0.3159), so more budget
#    directly deepens the headline quality win.
# 2. The 64^3 quality leg: train at the scale the reference never reached
#    (reference utils.py:148 caps at 32^3), using the measured 64^3
#    winner config (mask_dtype=index, NO remat, 510.9 ms/step) and a
#    200-cube synthetic set (--samples; generation is ~8 min single-core,
#    disk-cached).  Short LR probe first (the 32^3 probe picked 1e-3 but
#    the 64^3 loss surface is 8x more particles per cube at b1).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5parts2_queue.log}
OUT=${2:-artifacts/r5quality64_queue.log}

for i in $(seq 1 720); do
  grep -q PARTS2_DONE "$GATE" 2>/dev/null && break
  sleep 60
done
if ! grep -q PARTS2_DONE "$GATE" 2>/dev/null; then
  echo "### QUALITY64_ABORT no PARTS2_DONE after 12 h $(date -u +%FT%TZ)" >> "$OUT"
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

Q="--model shiftinv --synthetic --cells 32 -b 4 -k 14 --dtype bfloat16 --knn_window 2 -t 16"

# Leg 1: third continuation of the 32^3 headline quality run.
run quality_continue2 3600 python -m nbody_tpu.cli.train $Q -i 12000 --scan 100 \
    -l 0.001 --device_data auto -r -n r5quality
run quality_eval3 1200 python -m nbody_tpu.cli.eval $Q -l 0.001 -n r5quality \
    --plot artifacts/r5quality_cont2_vs_linear.png

# Leg 2: 64^3.  Winner config from the round-5 sweep: index masks, no
# remat, core (8,8,8) auto-picked by the registry at this scale.
Q64="--model shiftinv --synthetic --cells 64 -b 1 -k 14 --dtype bfloat16 --knn_window 2 --mask_dtype index -t 8 --samples 200 --device_data auto"

# probe includes first-time dataset generation (~8 min) + compile
run probe64_lr001 2700 python -m nbody_tpu.cli.train $Q64 -i 600 --scan 100 \
    -l 0.001 -n r5q64lr001
run probe64_lr003 1500 python -m nbody_tpu.cli.train $Q64 -i 600 --scan 100 \
    -l 0.003 -n r5q64lr003

BEST64="0.001"
PICKED=$(python scripts/pick_lr.py "$OUT" probe64_lr001=0.001 \
         probe64_lr003=0.003 2>>"$OUT.err") && BEST64=$PICKED
echo "### BEST64_LR=$BEST64 $(date -u +%FT%TZ)" >> "$OUT"

# The long train: 8000 iters at ~511 ms/step = ~68 min.
run quality64_train 5700 python -m nbody_tpu.cli.train $Q64 -i 8000 --scan 100 \
    -l "$BEST64" -n r5quality64
run quality64_eval 1800 python -m nbody_tpu.cli.eval $Q64 -l "$BEST64" -n r5quality64 \
    --plot artifacts/r5quality64_vs_linear.png

echo "QUALITY64_DONE $(date -u +%FT%TZ)" >> "$OUT"
