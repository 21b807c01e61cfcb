#!/usr/bin/env python
"""Micro-benchmark: the in-step lattice kNN search alone, per k-selection
variant (sort = lax.top_k, iter = ops/knn.topk_min_iter, pallas =
ops/pallas/topk_kernels.topk_min_pallas).

One jitted program per variant: a scan of SCAN chained searches (each
iteration perturbs positions by a tiny function of the previous idx so XLA
cannot CSE the searches), timed as min of reps with a one-element fetch
barrier.  Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("-b", "--batch", type=int, default=4)
    ap.add_argument("-k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default="default")
    ap.add_argument("--variants", nargs="+",
                    default=["sort", "iter", "pallas"])
    return ap


def main():
    args = build_parser().parse_args()
    if args.platform not in ("auto", "default"):
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, positions_from_inputs
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch

    cells, b, k, w = args.cells, args.batch, args.k, args.window
    box = 4.0 * cells
    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    x = jnp.asarray(features_from_raw(raw)[..., :6])
    pos = jnp.asarray(positions_from_inputs(x, box=box))
    pn = jnp.mod(pos / box, 1.0)

    for variant in args.variants:
        @jax.jit
        def chained(p0, _variant=variant):
            def body(p, _):
                idx = knn_periodic_lattice_batch(p, k, cells=cells, window=w,
                                                 select=_variant)
                # idx-dependent nudge (~1e-7 of a spacing): chains the scan
                # so XLA cannot elide the searches; does not move particles
                # between cells
                nudge = (idx[..., :1] % 7).astype(p.dtype) * 1e-9
                return jnp.mod(p + nudge, 1.0), idx[0, 0, 0]
            _, probes = jax.lax.scan(body, p0, None, length=args.scan)
            return probes

        out = chained(pn)
        int(np.asarray(jax.device_get(out[-1:]))[0])   # compile+barrier
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = chained(pn)
            int(np.asarray(jax.device_get(out[-1:]))[0])
            ts.append((time.perf_counter() - t0) / args.scan)
        print(json.dumps({
            "component": f"knn_{variant}", "cells": cells, "batch": b,
            "k": k, "window": w,
            "ms_per_search": round(min(ts) * 1e3, 2),
            "all_ms": [round(t * 1e3, 2) for t in sorted(ts)],
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
