#!/bin/bash
# Round-5 RESUME queue: the container restarted mid-round (API outage),
# wiping /tmp and ~/.Data — the phase-3 quality retake (round5_quality3.sh)
# and the phase-2 rollout/bench legs never ran or lost their artifacts.
# This queue re-runs exactly the lost work, tunnel pre-probed by the
# launcher so there is no wait loop:
#   1. LR probe x3 at the headline shape (VERDICT r4 #2 de-risk).
#   2. The 6000-iter quality train + eval vs the linear-velocity baseline
#      (VERDICT r4 missing #1 / next #2) on the honest 2LPT generator.
#   3. Rollout chain with per-hop baseline medians (VERDICT r4 #2 tail).
#   4. 64^3 index-mode no-remat probes (PERF.md 64^3 section's open lever).
#   5. pick_winner + official bench.py on the final code.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/r5resume_queue.log}

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -14 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

# headline bench config (32^3 b4 K14 bf16 masked window-2), 16 test cubes
Q="--model shiftinv --synthetic --cells 32 -b 4 -k 14 --dtype bfloat16 --knn_window 2 -t 16"

run probe_lr01  900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.01  -n r5lr01
run probe_lr003 900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.003 -n r5lr003
run probe_lr001 900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.001 -n r5lr001
run probe_lr0003 900 python -m nbody_tpu.cli.train $Q -i 800 --scan 100 -l 0.0003 -n r5lr0003

BEST="0.003"
PICKED=$(python scripts/pick_lr.py "$OUT" probe_lr01=0.01 probe_lr003=0.003 \
         probe_lr001=0.001 probe_lr0003=0.0003 2>>"$OUT") && BEST=$PICKED
echo "### BEST_LR=$BEST $(date -u +%FT%TZ)" >> "$OUT"

# 12000 iters ~ 34 min at 171 ms/step: the psi2 component is a truncated
# Poisson solve — slower to learn than the one-hop coupling/tanh terms the
# baseline comparison needs, and chip time here is the round's best spend
run quality_train 4600 python -m nbody_tpu.cli.train $Q -i 12000 --scan 100 -l "$BEST" -n r5quality
run quality_eval 900 python -m nbody_tpu.cli.eval $Q -l "$BEST" -n r5quality \
    --plot artifacts/r5quality_retake_vs_linear.png

# rollout chain with per-hop baseline medians (400 iters/pair, scan-50)
run rollout_r5 2400 python -m nbody_tpu.cli.rollout --steps 4 -i 400 --scan 50 -b 4 \
    --cells 32 --synthetic -k 14 -t 4 --dtype bfloat16 -n r5chain

# 64^3 no-remat index probes: remat re-runs the forward (~1.3x passes); it
# exists to fit the 8 GiB one-hot masks, which index mode never materializes.
B="python scripts/bench_step.py --platform default"
run s64_idx888_noremat 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --core 8 8 8 --scan 3
run s64_idx8816_noremat 1200 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --core 8 8 16 --scan 3

run pick_winner 120 python scripts/pick_winner.py "$OUT"
run bench_py 1500 python bench.py

echo "RESUME_DONE $(date -u +%FT%TZ)" >> "$OUT"
