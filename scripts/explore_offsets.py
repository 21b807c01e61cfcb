#!/usr/bin/env python
"""On-chip shoot-out of neighbor-op formulations (round-3, VERDICT #1).

Measures per-op dispatch time of candidate gather/scatter implementations
at the bench shape (32^3, B=4, K=14, window=2) so the step's dominant cost
— shared-mask HBM traffic, 4.2 GB/op at the (4,8,8) core — can be compared
against the offset-space formulations (ops/offsets.py) and cheaper mask
dtypes.  Writes one JSON line per measurement; PERF.md gets the table.

Methodology notes:
  * every large operand (masks, values) is passed as a jit ARGUMENT — a
    closed-over device array would be embedded as an HLO literal and
    explode compile time;
  * masks are built INSIDE the jitted program from idx (as the real train
    step does) but under stop_gradient+no-dep so XLA hoists them out of
    the scan loop — the scan body then reads the same buffer per
    iteration, matching production;
  * timing = min over 3 dispatches of a scan-ITERS program, one-element
    fetch barrier (jax.block_until_ready does not block on this platform).

Run on the real TPU:  python scripts/explore_offsets.py [--cells 32]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--channels", type=int, nargs="*", default=[16, 64])
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant substrings to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.ops import blocked
    from nbody_tpu.ops.offsets import (edge_offset_sel, offset_bin,
                                       offset_fold, offset_gather,
                                       offset_scatter_add, window_stack)
    from nbody_tpu.utils.profiling import fetch

    cells, b, k, w = args.cells, args.batch, args.k, args.window
    n = cells ** 3
    box = 4.0 * cells
    core = (4, 8, 8)
    ext = blocked.block_geometry(cells, w, core)[1]
    r = core[0] * core[1] * core[2]

    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    x = features_from_raw(raw)
    pos = jnp.asarray(x[..., :3] + box / 2.0 + x[..., 3:6])
    pos_norm = jnp.mod(pos / box, 1.0)
    idx = jnp.asarray(jax.device_get(
        knn_periodic_lattice_batch(pos_norm, k, cells=cells, window=w)))
    sel = jnp.asarray(jax.device_get(edge_offset_sel(idx, cells, w)))
    print(f"# shape: cells={cells} b={b} k={k} w={w} core={core}", flush=True)

    results = []

    def timeit(name, fn, init, *extra, prep=None, iters=args.iters):
        """fn(carry, *prepped) -> carry; extras are jit args (NOT closures).
        prep(*extra) runs once per dispatch OUTSIDE the scan (e.g. the
        once-per-step mask build), so the loop body reads a fixed buffer
        like the production train step does."""
        if args.only and not any(s in name for s in args.only.split(",")):
            return
        try:
            def dispatch(c, *e):
                pe = prep(*e) if prep is not None else e
                return jax.lax.scan(
                    lambda v, _: (fn(v, *pe), None), c, None,
                    length=iters)[0]
            f = jax.jit(dispatch)
            t0 = time.perf_counter()
            out = f(init, *extra)
            fetch(out)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(init, *extra)
                fetch(out)
                ts.append((time.perf_counter() - t0) / iters)
            rec = {"op": name, "ms": round(min(ts) * 1e3, 2),
                   "all_ms": [round(t * 1e3, 2) for t in sorted(ts)],
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"op": name, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    key = jax.random.PRNGKey(0)

    def make_masks(idx_arg, mask_dtype):
        """Built from the idx ARGUMENT inside jit (stop_gradient,
        loop-invariant) — per the script's own pass-every-large-operand-
        as-a-jit-argument methodology (ADVICE r3)."""
        p = blocked.edge_block_positions(idx_arg, cells, w, core)
        lane = jnp.arange(ext[0] * ext[1] * ext[2], dtype=jnp.int32)
        eq = p[..., None] == lane
        dt = {"bf16": jnp.bfloat16, "int8": jnp.int8,
              "fp8": jnp.float8_e4m3fn}[mask_dtype]
        return jax.lax.stop_gradient(eq.astype(dt))

    for c in args.channels:
        v0 = jax.random.normal(key, (b, n, c), jnp.bfloat16)
        e0 = jax.random.normal(key, (b, n, k, c), jnp.bfloat16)

        # ------- shared-mask einsum baselines (current default) -------
        for tag in ("bf16", "int8", "fp8"):
            def mk(_idx, _tag=tag):
                return (make_masks(_idx, _tag),)

            def g(vv, masks, _tag=tag):
                patches = blocked.block_patches(vv, cells, w, core)
                out = jax.lax.dot_general(
                    masks, patches, (((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                out = out.reshape(b, -1, r, k * c)
                cube = blocked.blocks_to_cube(out, cells, core)
                return (vv + 1e-6 * cube.reshape(b, n, k, c)[:, :, 0, :]
                        .astype(vv.dtype))
            timeit(f"gather_masked_{tag}_C{c}", g, v0, idx, prep=mk)

            def s(ee, masks, _tag=tag):
                vb = blocked.cube_to_blocks(ee.reshape(b, n, k * c),
                                            cells, core)
                vb = vb.reshape(b, -1, r * k, c)
                acc = jax.lax.dot_general(
                    masks, vb, (((2,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32)
                out = blocked.patches_fold(acc.astype(ee.dtype), cells, w,
                                           core)
                return ee + 1e-6 * out[:, :, None, :]
            timeit(f"scatter_masked_{tag}_C{c}", s, e0, idx, prep=mk)

        # ------------------- offset-space variants -------------------
        for impl in ("take", "onehot"):
            def og(vv, ss, _impl=impl):
                out = offset_gather(vv, ss, cells, w, impl=_impl)
                return vv + 1e-6 * out[:, :, 0, :]
            timeit(f"gather_offset_{impl}_C{c}", og, v0, sel)

        def os_(ee, ss):
            out = offset_scatter_add(ee, ss, cells, w)
            return ee + 1e-6 * out[:, :, None, :]
        timeit(f"scatter_offset_C{c}", os_, e0, sel)

        # ----------------- component micro-measures ------------------
        def ws(vv):
            ww = window_stack(vv, cells, w)
            return vv + 1e-6 * ww[:, :, 0, :]
        timeit(f"component_window_stack_C{c}", ws, v0)

        def bn(ee, ss):
            bins = offset_bin(ee, ss, w)
            return ee + 1e-6 * bins[:, :, :k, :]
        timeit(f"component_bin_C{c}", bn, e0, sel)

        bins0 = jax.random.normal(key, (b, n, (2 * w + 1) ** 3, c),
                                  jnp.bfloat16)

        def fl(vv, bb):
            out = offset_fold(bb + 1e-9 * vv[:, :, None, :], cells, w)
            return vv + 1e-6 * out
        timeit(f"component_fold_C{c}", fl, v0, bins0)

    with open("/tmp/explore_offsets.json", "w") as f:
        json.dump(results, f, indent=1)
    print("# wrote /tmp/explore_offsets.json", flush=True)


if __name__ == "__main__":
    main()
