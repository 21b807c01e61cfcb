#!/bin/bash
# Round-5 final queue #2 (post machine-swap): the 64^3 quality leg the
# dead round5_quality64.sh chain never reached.  Time-boxed for the end
# of the round: no LR probe (the 32^3 probe picked 1e-3 and the per-iter
# particle count at 64^3 b1 is 2x the 32^3 b4 batch, so 2200 iters here
# ~ 4400 32^3-iters — past the point the 32^3 run was clearly below the
# identity floor), winner storage (index masks, NO remat, 510.9 ms/step),
# device-resident feed.  Eval scores the trained model against the
# linear-velocity baseline on the held-out cubes and saves the figure +
# metrics into artifacts/ (the ~/.Data tree does not survive machine
# swaps).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5final_queue.log}
OUT=${2:-artifacts/r5final_q64.log}

# Wait for the chip (vel64 legs) and for the 64^3 dataset cache (generated
# concurrently on CPU; the CLI would silently regenerate it in-process,
# burning ~10 min of the train budget).
for i in $(seq 1 240); do
  grep -q VEL64_DONE "$GATE" 2>/dev/null && break
  sleep 15
done
CACHE=/tmp/nbody_synth/synth_200x64_s12345_r1.npy
for i in $(seq 1 80); do
  [ -f "$CACHE" ] && break
  sleep 15
done
sleep 25

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -14 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 25
}

Q64="--model shiftinv --synthetic --cells 64 -b 1 -k 14 --dtype bfloat16 --knn_window 2 --mask_dtype index -t 8 --samples 200 --device_data auto"

run quality64_train 2100 python -m nbody_tpu.cli.train $Q64 -i 2200 --scan 100 \
    -l 0.001 -n r5quality64
run quality64_eval 1500 python -m nbody_tpu.cli.eval $Q64 -l 0.001 -n r5quality64 \
    --plot artifacts/r5quality64_vs_linear.png

# Preserve the machine-readable quality record inside the repo.
cp "$HOME"/.Data/Experiments/Nbody/*r5quality64*/metrics.jsonl \
   artifacts/r5quality64_metrics.jsonl 2>>"$OUT.err" || true

echo "QUALITY64_DONE $(date -u +%FT%TZ)" >> "$OUT"
