#!/usr/bin/env python
"""Headline benchmark: particle-steps/sec of the flagship training step.

Workload (BASELINE.json config 2): shift-invariant kNN graph network,
32^3-particle cube, batch 4, K=14, periodic boundaries — the FULL train
step including the on-device periodic kNN graph rebuild, network fwd/bwd,
and Adam update, as one jitted donated XLA program on the TPU.

Baseline denominator: the measured CPU reference pipeline
(BASELINE_MEASURED.json; see nbody_tpu/baseline_cpu.py) — host sklearn
PBC-kNN per step + jitted CPU network step, 22.75 s/step on this machine.

Schedule (probe-first, VERDICT r3 #1 — a number must land inside the
driver budget even when the axon tunnel relay is dead, the round-3
failure mode):
  1. 150 s tiny-jit PROBE in a subprocess (one-element fetch barrier);
     a DEAD reading is re-probed once after a 45 s settle (a previous
     process's chip teardown overlapping the probe reads as a false
     hang — CLAUDE.md fact 9).
  2. live  -> full TPU measurement (540 s cap); on a timeout, re-probe
     before the single retry — a dead re-probe goes straight to 3.
  3. dead  -> CPU fallback at 16^3 (measured ~2.5 min wall on this
     machine), honestly labeled, scored against the 16^3 CPU reference
     denominator.
Worst-case wall: dead tunnel ~14 min; live-but-hanging ~28 min; the
common paths are ~6 min (live) and ~8 min (dead).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "particle-steps/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import List, Tuple

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(REPO, "BASELINE_MEASURED.json")

CELLS = int(os.environ.get("NBODY_BENCH_CELLS", "32"))
BATCH = 4
K = 14
# scan length / warmup per dispatch; the CPU-fallback subprocess shrinks
# them via env so a dead-tunnel round still records a number in minutes
WARMUP = int(os.environ.get("NBODY_BENCH_WARMUP", "3"))
ITERS = int(os.environ.get("NBODY_BENCH_ITERS", "10"))
PROBE_TIMEOUT = int(os.environ.get("NBODY_BENCH_PROBE_TIMEOUT", "150"))
TPU_TIMEOUT = int(os.environ.get("NBODY_BENCH_TPU_TIMEOUT", "540"))
FALLBACK_TIMEOUT = int(os.environ.get("NBODY_BENCH_FALLBACK_TIMEOUT", "480"))
FALLBACK_CELLS = int(os.environ.get("NBODY_BENCH_FALLBACK_CELLS", "16"))
# the chip sweep (scripts/round4_queue.sh, run by the tunnel-wait loop)
# records its fastest headline configuration here; bench adopts it so the
# official number always reflects the measured winner.  Env vars win.
WINNER_PATH = os.path.join(REPO, "BENCH_WINNER.json")


def _winner(key, default):
    try:
        with open(WINNER_PATH) as f:
            val = json.load(f).get(key)
        return default if val is None else val
    except (OSError, ValueError):
        return default


# mask storage for the masked neighbor path (config.ModelConfig.mask_dtype):
# swept on-chip via scripts/round4_queue.sh; winner adopted automatically
MASK_DTYPE = os.environ.get("NBODY_BENCH_MASK_DTYPE",
                            _winner("mask_dtype", "auto"))
# lattice kNN k-selection (sort/iter/pallas), same sweep
KNN_SELECT = os.environ.get("NBODY_BENCH_KNN_SELECT",
                            _winner("knn_select", "sort"))
# masked-path core block shape override (list of 3 ints or None) and the
# mask/idx-dot kernels' blocks-per-grid-step grouping, same sweep
MASKED_CORE = _winner("core", None)
KERNEL_GROUP = _winner("group", None)
# neighbor impl: "masked" is the TPU-swept optimum; the CPU fallback forces
# "banded" (masks are a TPU trade — on CPU the one-hot einsums measured 16x
# slower than XLA's native gather, which ops/banded routes to off-TPU)
NEIGHBOR_IMPL = os.environ.get("NBODY_BENCH_NEIGHBOR_IMPL", "masked")
# compute dtype: bf16 is an MXU trade; the CPU fallback forces f32 (native
# there — measured 8.5x faster than XLA CPU's emulated bf16 at 16^3)
DTYPE = os.environ.get("NBODY_BENCH_DTYPE", "bfloat16")

# a minimal end-to-end device program: jit one matmul, fetch ONE element
# (jax.block_until_ready does not reliably block on this platform)
_PROBE_CODE = """\
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a @ a)(jnp.ones((8, 8), jnp.float32))
assert float(y.ravel()[0]) == 8.0
# a CPU default platform means no TPU is reachable at all: the 32^3
# "TPU" measurement would silently run on CPU and blow both timeouts
assert jax.devices()[0].platform != "cpu", "default platform is cpu"
print("PROBE_OK", jax.devices()[0].platform)
"""


def tunnel_alive() -> bool:
    """Tiny-jit probe with a hard timeout, in a subprocess (the tunnel
    hangs whole processes when the relay is down — CLAUDE.md fact 9).
    NBODY_BENCH_SIMULATE_DEAD_TUNNEL=1 forces the dead path for testing."""
    if os.environ.get("NBODY_BENCH_SIMULATE_DEAD_TUNNEL"):
        print("# probe: simulated dead tunnel", file=sys.stderr)
        return False
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                             capture_output=True, text=True, cwd=REPO,
                             timeout=PROBE_TIMEOUT)
        ok = "PROBE_OK" in out.stdout
    except subprocess.TimeoutExpired:
        ok = False
    print(f"# probe: {'live' if ok else 'DEAD'} "
          f"({time.time() - t0:.0f} s)", file=sys.stderr)
    return ok


def load_or_measure_baseline() -> dict:
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return json.load(f)
    return {}


def baseline_pps(baseline: dict, cells: int) -> float:
    """CPU-reference denominator for a cube size, measured on demand and
    cached in BASELINE_MEASURED.json (key 'graph' at 32^3, 'graph{c}'
    otherwise)."""
    key = "graph" if cells == 32 else f"graph{cells}"
    if key not in baseline:
        out = subprocess.run(
            [sys.executable, "-m", "nbody_tpu.baseline_cpu",
             "--cells", str(cells), "-b", str(BATCH), "-k", str(K),
             "--family", "graph"],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu"}, check=True,
            timeout=1800)
        data = json.loads(out.stdout.strip().splitlines()[-1])
        baseline[key] = data["graph"]
        with open(BASELINE_PATH, "w") as f:
            json.dump(baseline, f, indent=2)
    return baseline[key]["particle_steps_per_sec"]


class CoverageError(RuntimeError):
    """The configured kNN/band setup drops edges on the bench data —
    refusing to report a throughput number for a corrupted graph."""


def measure_tpu_graph_step() -> Tuple[float, List[float]]:
    """Measure the full train step; returns (pps, sorted per-dispatch
    step seconds).  Runs on whatever platform the process initialized —
    the caller subprocess forces CPU for the fallback path."""
    import jax
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as _np
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.models.registry import build_model, coverage_violations
    from nbody_tpu.train.trainer import init_train_state, make_train_scan

    n = CELLS ** 3
    raw = synthetic_raw_cubes(num_samples=2 * BATCH, cells=CELLS, seed=0)
    x = features_from_raw(raw)
    # bf16 compute, f32 params/optimizer — the standard TPU training setup
    # (mixed precision via models.registry._mixed_precision).
    # knn_window=2 is exact for this data class: verified against the
    # exact O(N^2) search by the coverage guard below on every run (f64
    # distance-sum comparison; zero tolerance for missed edges).
    cfg = C.ModelConfig(family="shiftinv", channels=tuple(C.GRAPH_CHANNELS),
                        k_neighbors=K, dtype=DTYPE, knn_window=2,
                        neighbor_impl=NEIGHBOR_IMPL, mask_dtype=MASK_DTYPE,
                        knn_select=KNN_SELECT,
                        masked_core=(tuple(MASKED_CORE) if MASKED_CORE
                                     else None))
    print(f"# config: impl={NEIGHBOR_IMPL} mask_dtype={MASK_DTYPE} "
          f"knn_select={KNN_SELECT} core={MASKED_CORE} "
          f"group={KERNEL_GROUP} dtype={DTYPE}", file=sys.stderr)
    if KERNEL_GROUP and MASK_DTYPE in ("int8", "int4", "index"):
        from nbody_tpu.ops.pallas import mask_kernels
        mask_kernels.set_group(int(KERNEL_GROUP))
    # refuse to report a number when the graph is not provably covered —
    # the guard against the silent edge-dropping class that forced the
    # round-1 46.6x retraction (PERF.md)
    v = coverage_violations(cfg, 4.0 * CELLS, x)
    if v:
        raise CoverageError(
            f"COVERAGE_VIOLATIONS={v}: the lattice search window cannot "
            "represent this data's displacements; no number reported.")
    model = build_model(cfg, box=4.0 * CELLS)
    opt = optax.adam(1e-3)
    state = init_train_state(model, opt)
    scan_fn = make_train_scan(model, opt)

    # the production training path: ITERS optimizer steps per device
    # dispatch (lax.scan) — amortizes the tunnel's per-call latency.
    # NB: jax.block_until_ready does not reliably block on this platform
    # (measured) — only a device->host fetch is a true barrier.
    chunk = jnp.asarray(_np.stack(
        [x[(i % 2) * BATCH:(i % 2 + 1) * BATCH] for i in range(ITERS)]))
    state, losses = scan_fn(state, chunk, 6)
    for _ in range(max(0, WARMUP // ITERS)):
        state, losses = scan_fn(state, chunk, 6)
    float(losses[-1])
    # min over several dispatches: the tunnel's per-dispatch latency is
    # noisy (measured swings of 2-3x between healthy and degraded windows,
    # while per-shape device times are deterministic — PERF.md).  All
    # per-dispatch times are reported alongside the min so the spread is
    # visible in the output (ADVICE r2).
    secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = scan_fn(state, chunk, 6)
        final = float(losses[-1])  # host fetch = true barrier
        secs.append((time.perf_counter() - t0) / ITERS)
    assert _np.isfinite(final)
    return BATCH * n / min(secs), sorted(secs)


def step_mfu(step_seconds: float, cells: int) -> float:
    """Useful-FLOP MFU of the measured step (VERDICT r4 weak #6): the
    model's weight-matmul FLOPs (neighbor selection counted as free data
    movement — utils/flops.py) per second over the chip's peak."""
    from nbody_tpu import config as C
    from nbody_tpu.utils.flops import mfu
    return mfu("shiftinv", cells ** 3, BATCH, K, list(C.GRAPH_CHANNELS),
               step_seconds, DTYPE)


def _measure_in_subprocess(timeout_s: int, force_cpu: bool,
                           cells: int = CELLS) -> Tuple[float, List[float]]:
    """Run the measurement isolated in a subprocess (the TPU tunnel on this
    machine occasionally hangs whole processes; a timeout + retry in the
    parent keeps the bench alive)."""
    code = ("import bench, json\n"
            + ("import jax; jax.config.update('jax_platforms','cpu')\n"
               if force_cpu else "")
            + "pps, secs = bench.measure_tpu_graph_step()\n"
            + "print('PPS', pps, json.dumps(secs))\n")
    env = dict(os.environ)
    env["NBODY_BENCH_CELLS"] = str(cells)
    if force_cpu:
        # 2 steps per dispatch, no extra warmup: the fallback must land a
        # number in minutes (measured ~2.5 min wall at 16^3 end to end).
        # Pin auto masks: the Pallas mask/idx-dot kernels run interpret-mode
        # on CPU — orders of magnitude slower than the einsum path.
        env["NBODY_BENCH_ITERS"] = "2"
        env["NBODY_BENCH_WARMUP"] = "0"
        env["NBODY_BENCH_MASK_DTYPE"] = "auto"
        env["NBODY_BENCH_KNN_SELECT"] = "sort"
        env["NBODY_BENCH_NEIGHBOR_IMPL"] = "banded"
        env["NBODY_BENCH_DTYPE"] = "float32"
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=timeout_s, env=env)
    for line in out.stdout.strip().splitlines():
        if line.startswith("PPS "):
            parts = line.split(None, 2)
            return float(parts[1]), json.loads(parts[2])
    if "COVERAGE_VIOLATIONS" in out.stderr:
        # not retryable and not CPU-fallbackable: the graph itself is wrong
        raise CoverageError(out.stderr[-400:])
    raise RuntimeError(f"bench subprocess failed: {out.stderr[-400:]}")


def main():
    baseline = load_or_measure_baseline()

    metric = f"train_step_throughput_shiftinv_{CELLS}c_k14_b4"
    pps = secs = None
    cells = CELLS
    # a single DEAD reading can be a false negative: a previous process's
    # chip teardown overlapping the probe reads as a hang (CLAUDE.md fact
    # 9, observed in the round-4 queue's first bench run).  Settle 45 s
    # and probe once more before accepting "dead".
    alive = tunnel_alive()
    if not alive and not os.environ.get("NBODY_BENCH_SIMULATE_DEAD_TUNNEL"):
        print("# probe DEAD; settling 45 s and re-probing once "
              "(teardown-contention false negatives)", file=sys.stderr)
        time.sleep(45)
        alive = tunnel_alive()
    if alive:
        # the probe subprocess's device teardown must finish before the
        # measurement attaches, or the run reads as falsely hung (fact 9)
        time.sleep(20)
        for attempt in range(2):
            try:
                pps, secs = _measure_in_subprocess(
                    timeout_s=TPU_TIMEOUT, force_cpu=False)
                break
            except CoverageError as e:
                print(f"# REFUSING to report: {e}", file=sys.stderr)
                raise SystemExit(1)
            except (subprocess.TimeoutExpired, RuntimeError) as e:
                print(f"# TPU measurement attempt {attempt + 1} failed: "
                      f"{type(e).__name__}", file=sys.stderr)
                if attempt == 0:
                    time.sleep(25)
                    if not tunnel_alive():
                        print("# tunnel died mid-bench; skipping the retry",
                              file=sys.stderr)
                        break
                    time.sleep(20)
    if pps is None:
        # tunnel down: report the same program on the CPU backend at a
        # size that finishes in minutes, honestly labeled, scored against
        # the SAME-size CPU reference denominator
        cells = FALLBACK_CELLS
        metric = (f"train_step_throughput_shiftinv_{cells}c_k14_b4"
                  f"_CPU_FALLBACK_tpu_tunnel_down")
        pps, secs = _measure_in_subprocess(
            timeout_s=FALLBACK_TIMEOUT, force_cpu=True, cells=cells)
    base_pps = baseline_pps(baseline, cells)

    print(json.dumps({
        "metric": metric,
        "value": round(pps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(pps / base_pps, 2),
        # methodology: value = BATCH*N / min(step_secs); all three
        # per-dispatch step times (sorted) expose the tunnel-noise spread
        "step_secs_sorted": [round(s, 5) for s in secs],
        # useful-FLOP MFU: model math per second over chip peak, neighbor
        # selection counted as free data movement (utils/flops.py)
        "mfu": round(step_mfu(min(secs), cells), 5),
    }))


if __name__ == "__main__":
    main()
