#!/bin/bash
# Round-5 chained queue #3: continue the r5quality training from its
# latest checkpoint with the device-resident training set (--device_data),
# which removes the ~300 ms/step tunnel batch stream the first leg paid
# (metrics.jsonl: 467 ms/step host-fed vs the 171 ms device step), then
# re-run the model-vs-linear-baseline eval on the further-trained model.
# Also doubles as the real-chip drive of the device_data feature.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
GATE=${1:-artifacts/r5parts_queue.log}
OUT=${2:-artifacts/r5continue_queue.log}

for i in $(seq 1 480); do
  grep -q PARTS_DONE "$GATE" 2>/dev/null && break
  sleep 60
done
if ! grep -q PARTS_DONE "$GATE" 2>/dev/null; then
  echo "### CONTINUE_ABORT no PARTS_DONE after 8 h $(date -u +%FT%TZ)" >> "$OUT"
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

run quality_continue 3600 python -m nbody_tpu.cli.train $Q -i 12000 --scan 100 \
    -l 0.001 --device_data auto -r -n r5quality
run quality_eval2 1200 python -m nbody_tpu.cli.eval $Q -l 0.001 -n r5quality \
    --plot artifacts/r5quality_cont_vs_linear.png

echo "CONTINUE_DONE $(date -u +%FT%TZ)" >> "$OUT"
