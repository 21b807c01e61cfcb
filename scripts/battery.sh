#!/bin/bash
# Serialized TPU measurement battery.  Each run is a fresh process with a
# hard timeout; between runs we probe the tunnel and wait for it to recover
# (heavy compiles can wedge it for ~10 min).  Results append to $OUT.
OUT=${OUT:-/tmp/battery_results.jsonl}
cd /root/repo

probe() {
  timeout 150 python -c "
import sys; sys.path.insert(0,'.')
from scripts.profile_ops import probe_tunnel
raise SystemExit(0 if probe_tunnel() else 1)" 2>/dev/null
}

wait_tunnel() {
  for i in $(seq 1 12); do
    if probe; then return 0; fi
    echo "$(date +%H:%M:%S) tunnel down, waiting (attempt $i)" >&2
    sleep 60
  done
  return 1
}

run_one() {
  echo "=== $* $(date +%H:%M:%S)" >> "$OUT"
  if ! wait_tunnel; then echo '{"error": "tunnel never recovered"}' >> "$OUT"; return 1; fi
  timeout "${STEP_TIMEOUT:-900}" python scripts/bench_step.py --platform default "$@" >> "$OUT" 2>>"$OUT.err" \
    || echo "{\"error\": \"run failed or timed out: $*\"}" >> "$OUT"
}

for spec in "$@"; do
  # shellcheck disable=SC2086
  run_one $spec
done
echo "BATTERY DONE $(date +%H:%M:%S)" >> "$OUT"
