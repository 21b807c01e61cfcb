#!/bin/bash
# Round-4 chip measurement queue (VERDICT r3 items 2, 3, 5, 6): the
# family matrix + headline measurements that round 3 could not take
# (tunnel relay outage).  Run ONLY after a successful tunnel probe
# (scripts/profile_ops.probe_tunnel or a 90 s tiny-jit probe).
#
# Discipline (CLAUDE.md platform facts 6/9): every run is timeout-bounded,
# runs are separated by 30 s teardown gaps (two processes cannot share the
# chip; a probe during teardown reads as a false hang), and a failed run
# does not stop the queue.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/round4_queue.jsonl}
: > "$OUT"

run() {
  local tag=$1 t=$2; shift 2
  echo "### $tag $(date -u +%FT%TZ)" >> "$OUT"
  timeout "$t" "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "### rc=$? $tag" >> "$OUT"
  sleep 30
}

B="python scripts/bench_step.py --platform default"

# 0. SECURE THE OFFICIAL NUMBER FIRST: bench.py on the known-good XLA-only
#    config, before any Pallas remote compile gets a chance to wedge the
#    relay (the round-3 failure mode).  Re-run at the end on the winner.
run bench_py_early 1500 python bench.py
# 1. headline re-measure: post-self-slot-drop masked step (predicted
#    ~172 ms / >=760k pps at 32^3 b4 K14; PERF.md round-3 traffic model)
run headline_shiftinv 700 $B --family shiftinv --cells 32 -b 4 --impl masked --scan 10
# 2. the rebuilt 2-mask-pass shiftinv15 (VERDICT #2: predicted a few
#    hundred ms vs the old 2.30 s; denominator graph15=517.9 pps)
run shiftinv15 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --scan 5
# 3. family matrix (VERDICT #3): set, attn, shiftinv_vel, 64^3
run shiftinv_vel 700 $B --family shiftinv_vel --cells 32 -b 4 --impl masked --scan 10
run set 600 $B --family set --cells 32 -b 4 --scan 10
run attn 600 $B --family attn --cells 32 -b 4 --scan 10
run shiftinv_64 900 $B --family shiftinv --cells 64 -b 1 --impl masked --remat --scan 3
# 4. isolate the network from the kNN rebuild for the efficiency ledger
run headline_noknn 700 $B --family shiftinv --cells 32 -b 4 --impl masked --scan 10 --no-knn
# 5. step decomposition for the efficiency plan (VERDICT #5): mask-pass
#    chain vs matmul twin vs full step
run profile_decomp 1500 python scripts/profile_step4.py --platform default
# 6. rollout at scale (VERDICT #6 / BASELINE.json config 3): 32^3 chain of
#    4 redshift pairs through cli/rollout.py — trains 4 per-pair models,
#    then ONE jitted lax.scan rollout; reports per-step MSE + in-chain
#    coverage counts and saves the trajectory cube.  XLA-only, so it runs
#    BEFORE the Pallas section (whose remote compiles can wedge the relay)
run rollout_32 2400 python -m nbody_tpu.cli.rollout --steps 4 -i 150 -b 4 \
    --cells 32 --synthetic -k 14 -t 4 -n r4chain
# ---- Pallas section below: kernel compiles are the relay-wedge risk ----
run profile_decomp_idx 1500 python scripts/profile_step4.py --platform default --mask_dtype index
# 5b. the targeted fix: int8 masks via the Pallas mask-dot kernels (half
#     the mask HBM bytes, the step's dominant traffic).  Sweep the
#     blocks-per-grid-step grouping — per-step fixed cost vs VMEM.
run headline_i8_g2 900 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype int8 --scan 10
run headline_i8_g1 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype int8 --group 1 --scan 10
run headline_i8_g4 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype int8 --group 4 --scan 10
run shiftinv15_i8 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype int8 --scan 5
# 5c. int4 masks (4x less mask HBM than bf16; Mosaic packs int4 natively)
run headline_i4 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype int4 --scan 10
run shiftinv15_i4 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype int4 --scan 5
run shiftinv_64_i4 900 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype int4 --remat --scan 3
# 5d. mask-FREE idx-dot path (ops/pallas/idx_kernels.py): no mask array in
#     HBM at all — the expected round-4 headline configuration.  Sweep the
#     grouping; larger cores have no mask HBM cap in this mode.
run headline_idx 900 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --scan 10
run headline_idx_g1 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --group 1 --scan 10
run headline_idx_g4 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --group 4 --scan 10
run headline_idx_888 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --core 8 8 8 --group 1 --scan 10
run shiftinv15_idx 900 $B --family shiftinv15 --cells 32 -b 4 --impl masked --mask_dtype index --scan 5
run shiftinv_64_idx 900 $B --family shiftinv --cells 64 -b 1 --impl masked --mask_dtype index --remat --scan 3
# 5e. kNN k-selection: the full 125-lane top_k sort vs k argmin passes
#     (ops/knn.topk_min_iter) on the best mask mode
run headline_idx_iter 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --knn_select iter --scan 10
run headline_iter 700 $B --family shiftinv --cells 32 -b 4 --impl masked --knn_select iter --scan 10
run headline_idx_ktop 700 $B --family shiftinv --cells 32 -b 4 --impl masked --mask_dtype index --knn_select pallas --scan 10
run knn_micro 900 python scripts/bench_knn.py --platform default --cells 32 -b 4
# 7. record the fastest measured headline config for bench.py to adopt
#    (BENCH_WINNER.json — the driver's end-of-round bench then runs it)
python scripts/pick_winner.py "$OUT" >> "$OUT" 2>>"$OUT.err"
# 8. official headline (now on the winner config)
run bench_py 1500 python bench.py

echo "QUEUE_DONE $(date -u +%FT%TZ)" >> "$OUT"
