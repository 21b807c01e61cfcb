#!/usr/bin/env python
"""Time one full training step of any model family at any cube size.

Used for the PERF.md ledger: the shiftinv15 32^3 datapoint and the 64^3
block-vs-banded scaling proof.  Verifies graph coverage (zero lattice
violations) before reporting — a number for a corrupted graph is refused,
same policy as bench.py.

Examples:
  python scripts/bench_step.py --family shiftinv15 --cells 32 -b 4
  python scripts/bench_step.py --family shiftinv --cells 64 -b 1 --remat
  python scripts/bench_step.py --family shiftinv --cells 64 -b 1 --remat \
      --impl banded
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="shiftinv")
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("-b", "--batch", type=int, default=4)
    ap.add_argument("-k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--impl", default="block",
                    choices=["block", "banded", "masked"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--core", type=int, nargs=3, default=None)
    ap.add_argument("--mask_dtype", default="auto",
                    choices=["auto", "int8", "int4", "index"],
                    help="int8/int4 = Pallas mask-dot path (2x/4x less mask "
                         "HBM bytes); index = mask-free idx-dot path")
    ap.add_argument("--group", type=int, default=None,
                    help="mask-dot kernel: blocks per grid step")
    ap.add_argument("--knn_select", default="sort",
                    choices=["sort", "iter", "pallas"],
                    help="lattice kNN k-selection: top_k sort, argmin "
                         "passes, or the VMEM-resident Pallas kernel")
    ap.add_argument("--no-knn", action="store_true",
                    help="bake a precomputed idx into the step (isolates "
                         "the network cost from the kNN rebuild)")
    ap.add_argument("--scan", type=int, default=0,
                    help="time a scan of T fused steps instead of one step "
                         "(amortizes dispatch latency; bench.py uses 10)")
    ap.add_argument("--platform", default="auto",
                    help="force a JAX platform (cpu for sanity checks)")
    return ap


def main():
    args = build_parser().parse_args()

    if args.platform == "default":
        pass                       # caller already probed; keep site platform
    elif args.platform != "auto":
        import jax
        jax.config.update("jax_platforms", args.platform)
    else:
        from scripts.profile_ops import probe_tunnel
        if not probe_tunnel():
            print(json.dumps({"error": "tunnel hung"}))
            return 1

    import jax
    import jax.numpy as jnp
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.models.registry import build_model, coverage_violations
    from nbody_tpu.train.trainer import init_train_state, make_train_step
    if args.core:
        import nbody_tpu.ops.blocked as blocked
        if args.impl == "masked":
            blocked.set_masked_core(tuple(args.core))
        else:
            blocked.set_core(tuple(args.core))

    cells, b = args.cells, args.batch
    n = cells ** 3
    box = 4.0 * cells
    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    vel = args.family == "shiftinv_vel"
    x = features_from_raw(raw, include_velocity=vel)
    n_in = 9 if vel else 6
    channels = tuple(C.GRAPH_VEL_CHANNELS if vel else C.GRAPH_CHANNELS)
    cfg = C.ModelConfig(family=args.family, channels=channels,
                        k_neighbors=args.k, dtype=args.dtype,
                        knn_window=args.window, neighbor_impl=args.impl,
                        remat=args.remat, mask_dtype=args.mask_dtype,
                        knn_select=args.knn_select)
    if args.group:
        from nbody_tpu.ops.pallas import mask_kernels
        mask_kernels.set_group(args.group)

    v = coverage_violations(cfg, box, x[..., :6])
    if v:
        print(json.dumps({"error": f"coverage violations: {v}"}))
        return 1

    model = build_model(cfg, box=box)
    if args.no_knn:
        # swap the model's apply for one with a baked-in neighbor graph:
        # same network, no per-step kNN rebuild — the difference vs the
        # full step is the kNN cost inside the fused program
        from nbody_tpu.models import shiftinv
        from nbody_tpu.models.registry import (Model, _graph_geometry,
                                               _make_knn, _make_masks,
                                               _resolve_band,
                                               _mixed_precision)
        band = _resolve_band(cfg, box)
        knn = _make_knn(cfg, box, band)
        pos0, _ = _graph_geometry(jnp.asarray(x[..., :6]), box)
        idx_const = jax.device_get(jax.jit(knn)(pos0))
        lattice = ((cells, args.window)
                   if args.impl in ("block", "masked") else None)
        dt = jnp.dtype(args.dtype)

        def apply_fixed(params, x_in):
            pos, za = _graph_geometry(x_in, box)
            idx = jnp.asarray(idx_const)
            masks, lat = _make_masks(cfg, lattice, idx, dt, {})
            return shiftinv.shiftinv_model(
                params, pos.astype(dt), za.astype(dt),
                idx, box, band=band,
                remat=args.remat, lattice=lat, masks=masks)

        model = _mixed_precision(
            Model(model.init, apply_fixed, model.family), dt)

    opt = optax.adam(1e-3)
    state = init_train_state(model, opt)
    x_in = jnp.asarray(x[..., :n_in])
    y = jnp.asarray(x[..., n_in:])

    if args.scan:
        from nbody_tpu.train.trainer import make_train_scan
        scan_fn = make_train_scan(model, opt)
        batch = jnp.concatenate([x_in, y], axis=-1)
        chunk = jnp.broadcast_to(batch[None],
                                 (args.scan,) + batch.shape)

        def step_all():
            nonlocal state
            state, losses = scan_fn(state, chunk, n_in)
            return float(losses[-1])

        t0 = time.perf_counter()
        l0 = step_all()
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            lf = step_all()
            ts.append((time.perf_counter() - t0) / args.scan)
        sec = min(ts)
    else:
        step = make_train_step(model, opt)
        t0 = time.perf_counter()
        state, loss = step(state, x_in, y)
        l0 = float(loss)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, loss = step(state, x_in, y)
            lf = float(loss)  # host fetch = true barrier on this platform
            ts.append(time.perf_counter() - t0)
        sec = min(ts)
    assert np.isfinite(lf)
    # efficiency as a first-class number (VERDICT r4 weak #6): useful-FLOP
    # MFU — model math per second over peak, neighbor ops counted as free
    # data movement (utils/flops.py)
    from nbody_tpu.utils.flops import mfu, useful_flops_train_step
    eff_channels = list(channels)
    if args.family == "set":
        eff_channels = list(C.CHANNELS)
    elif args.family == "attn":
        eff_channels = list(C.ATTN_CHANNELS)
    step_mfu = mfu(args.family, n, b, args.k, eff_channels, sec, args.dtype)
    print(json.dumps({
        "family": args.family, "cells": cells, "batch": b, "k": args.k,
        "window": args.window, "impl": args.impl, "remat": args.remat,
        "dtype": args.dtype, "core": args.core, "no_knn": args.no_knn,
        "mask_dtype": args.mask_dtype, "group": args.group,
        "knn_select": args.knn_select, "scan": args.scan,
        "step_ms": round(sec * 1e3, 1),
        "pps": round(b * n / sec, 1),
        "mfu": round(step_mfu, 5),
        "useful_gflop_per_step": round(useful_flops_train_step(
            args.family, n, b, args.k, eff_channels) / 1e9, 2),
        "compile_s": round(compile_s, 1),
        "loss_first": round(l0, 4), "loss_last": round(lf, 4),
        "coverage_violations": int(v),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
