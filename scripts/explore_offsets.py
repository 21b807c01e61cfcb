#!/usr/bin/env python
"""On-chip shoot-out of neighbor-op formulations (round-3, VERDICT #1).

Measures per-op dispatch time of candidate gather/scatter implementations
at the bench shape (32^3, B=4, K=14, window=2) so the step's dominant cost
— shared-mask HBM traffic, 4.2 GB/op at the (4,8,8) core — can be compared
against the offset-space formulations (ops/offsets.py) and cheaper mask
dtypes.  Writes one JSON line per measurement; PERF.md gets the table.

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

    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    x = features_from_raw(raw)
    pos = jnp.asarray(x[..., :3] + box / 2.0 + x[..., 3:6])
    pos_norm = jnp.mod(pos / box, 1.0)
    idx = knn_periodic_lattice_batch(pos_norm, k, cells=cells, window=w)
    idx = jax.device_get(idx)
    idx = jnp.asarray(idx)
    sel = edge_offset_sel(idx, cells, w)
    print(f"# shape: cells={cells} b={b} k={k} w={w} core={core}", flush=True)

    results = []

    def timeit(name, make_fn, init, iters=args.iters):
        if args.only and not any(s in name for s in args.only.split(",")):
            return
        try:
            fn = make_fn()
            f = jax.jit(lambda c: jax.lax.scan(
                lambda v, _: (fn(v), None), c, None, length=iters)[0])
            t0 = time.perf_counter()
            r = f(init)
            fetch(r)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = f(init)
                fetch(r)
                ts.append((time.perf_counter() - t0) / iters)
            rec = {"op": name, "ms": round(min(ts) * 1e3, 2),
                   "all_ms": [round(t * 1e3, 2) for t in sorted(ts)],
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"op": name, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    key = jax.random.PRNGKey(0)

    for c in args.channels:
        v0 = jax.random.normal(key, (b, n, c), jnp.bfloat16)
        e0 = jax.random.normal(key, (b, n, k, c), jnp.bfloat16)

        # ------- shared-mask einsum baselines (current default) -------
        def masked_variant(mask_dtype, tag):
            def make():
                if mask_dtype == "bf16":
                    masks = blocked.block_masks(idx, cells, w,
                                                dtype=jnp.bfloat16, core=core)
                else:
                    p = blocked.edge_block_positions(idx, cells, w, core)
                    lane = jnp.arange(
                        blocked.block_geometry(cells, w, core)[1][0]
                        * blocked.block_geometry(cells, w, core)[1][1]
                        * blocked.block_geometry(cells, w, core)[1][2],
                        dtype=jnp.int32)
                    eq = p[..., None] == lane
                    if mask_dtype == "int8":
                        masks = eq.astype(jnp.int8)
                    else:
                        masks = eq.astype(jnp.float8_e4m3fn)

                def g(vv):
                    patches = blocked.block_patches(vv, cells, w, core)
                    out = jax.lax.dot_general(
                        masks, patches,
                        (((3,), (2,)), ((0, 1), (0, 1))),
                        preferred_element_type=jnp.float32)
                    r = core[0] * core[1] * core[2]
                    out = out.reshape(b, -1, r, k * c)
                    cube = blocked.blocks_to_cube(out, cells, core)
                    return (vv + 1e-6 * cube.reshape(b, n, k, c)[:, :, 0, :]
                            .astype(vv.dtype))
                return g
            timeit(f"gather_masked_{tag}_C{c}", make, v0)

            def make_s():
                if mask_dtype == "bf16":
                    masks = blocked.block_masks(idx, cells, w,
                                                dtype=jnp.bfloat16, core=core)
                else:
                    p = blocked.edge_block_positions(idx, cells, w, core)
                    ext = blocked.block_geometry(cells, w, core)[1]
                    lane = jnp.arange(ext[0] * ext[1] * ext[2],
                                      dtype=jnp.int32)
                    eq = p[..., None] == lane
                    masks = eq.astype(jnp.int8 if mask_dtype == "int8"
                                      else jnp.float8_e4m3fn)

                def s(ee):
                    r = core[0] * core[1] * core[2]
                    vb = blocked.cube_to_blocks(ee.reshape(b, n, k * c),
                                                cells, core)
                    vb = vb.reshape(b, -1, r * k, c)
                    acc = jax.lax.dot_general(
                        masks, vb, (((2,), (2,)), ((0, 1), (0, 1))),
                        preferred_element_type=jnp.float32)
                    out = blocked.patches_fold(acc.astype(ee.dtype), cells,
                                               w, core)
                    return ee + 1e-6 * out[:, :, None, :]
                return s
            timeit(f"scatter_masked_{tag}_C{c}", make_s, e0)

        masked_variant("bf16", "bf16")
        masked_variant("int8", "int8")
        masked_variant("fp8", "fp8")

        # ------------------- offset-space variants -------------------
        def make_og(impl):
            def g(vv):
                out = offset_gather(vv, sel, cells, w, impl=impl)
                return vv + 1e-6 * out[:, :, 0, :]
            return lambda: g
        timeit(f"gather_offset_take_C{c}", make_og("take"), v0)
        timeit(f"gather_offset_onehot_C{c}", make_og("onehot"), v0)

        def make_os():
            def s(ee):
                out = offset_scatter_add(ee, sel, cells, w)
                return ee + 1e-6 * out[:, :, None, :]
            return s
        timeit(f"scatter_offset_C{c}", make_os, e0)

        # ----------------- component micro-measures ------------------
        def make_ws():
            def f(vv):
                ww = window_stack(vv, cells, w)
                return vv + 1e-6 * ww[:, :, 0, :]
            return f
        timeit(f"component_window_stack_C{c}", make_ws, v0)

        def make_bin():
            def f(ee):
                bins = offset_bin(ee, sel, w)
                return ee + 1e-6 * bins[:, :, :k, :]
            return f
        timeit(f"component_bin_C{c}", make_bin, e0)

        def make_fold():
            bins0 = jax.random.normal(key, (b, n, (2 * w + 1) ** 3, c),
                                      jnp.bfloat16)

            def f(vv):
                out = offset_fold(bins0 + 1e-9 * vv[:, :, None, :], cells, w)
                return vv + 1e-6 * out
            return f
        timeit(f"component_fold_C{c}", make_fold, v0)

    with open("/tmp/explore_offsets.json", "w") as f:
        json.dump(results, f, indent=1)
    print("# wrote /tmp/explore_offsets.json", flush=True)


if __name__ == "__main__":
    main()
