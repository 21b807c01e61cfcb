#!/usr/bin/env python
"""Round-5 15-op family decomposition (VERDICT r4 next #1/#8).

The round-4 measurement: shiftinv15 at 32^3 b4 K14 runs 1,119.4 ms/step —
6.5x the 4-op family at the SAME mask-pass count (2/layer fwd).  The
traffic model says its per-layer roofline is ~17 ms fwd (mask 2x4.23 GB +
the K*C-wide payload ~5 GB), i.e. ~100 ms fwd / ~300 ms step — a 3.7x gap
this script localizes by program deltas:

  A. full train step, transpose_impl="gather"   (the round-4 baseline)
  B. full train step, transpose_impl="scatter"  (round-5 rework: the
     transpose rides the scatter pass source-side — no K*C-wide gather
     output, no 14-slice destination contraction, no wide-cotangent VJP)
  C. forward-only twins of A and B               (A-C = backward)
  D. mask-pass chains at the 15-op widths: gather at W=512 (the old wide
     payload), scatter at W=512 (the new fused payload), gather at W=64
     (pools / slim broadcast passes) — per-pass costs in context

Each timed as min of N scan dispatches ending in a one-element fetch
(CLAUDE.md: block_until_ready does not block on this platform).

Run only after a successful tunnel probe:
  python scripts/profile_step15.py --platform default
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
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("-b", "--batch", type=int, default=4)
    ap.add_argument("-k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--scan", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--core", type=int, nargs=3, default=None)
    ap.add_argument("--impls", nargs="+", default=["gather", "scatter"],
                    choices=["gather", "scatter", "scan"])
    ap.add_argument("--skip_chains", action="store_true",
                    help="only the full/forward steps (saves compile time)")
    ap.add_argument("--platform", default="default")
    return ap


def main():
    args = build_parser().parse_args()

    if args.platform not in ("auto", "default"):
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.models import shiftinv15 as S15
    from nbody_tpu.train.trainer import init_train_state, make_train_scan
    from nbody_tpu.ops import blocked

    cells, b, k, w = args.cells, args.batch, args.k, args.window
    n = cells ** 3
    box = 4.0 * cells
    if args.core:
        blocked.set_masked_core(tuple(args.core))
    core = blocked.MASKED_CORE

    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    x = features_from_raw(raw)
    x_in = jnp.asarray(x[..., :6])
    y = jnp.asarray(x[..., 6:])
    results = []

    def timed(name, fn, *fargs):
        t0 = time.perf_counter()
        out = fn(*fargs)
        out0 = float(np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0])).ravel()[0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*fargs)
            _ = float(np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0])).ravel()[0])
            ts.append((time.perf_counter() - t0) / args.scan)
        rec = {"component": name, "ms_per_step": round(min(ts) * 1e3, 2),
               "all_ms": [round(t * 1e3, 2) for t in sorted(ts)],
               "compile_s": round(compile_s, 1), "probe_out": round(out0, 4)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        return out

    cfg = C.ModelConfig(family="shiftinv15", channels=tuple(C.GRAPH_CHANNELS),
                        k_neighbors=k, dtype="bfloat16", knn_window=w,
                        neighbor_impl="masked")
    opt = optax.adam(1e-3)
    batch = jnp.concatenate([x_in, y], axis=-1)
    chunk = jnp.broadcast_to(batch[None], (args.scan,) + batch.shape)
    summary = {"core": list(core)}

    for impl in args.impls:
        S15.set_transpose_impl(impl)
        model = build_model(cfg, box=box)
        state = init_train_state(model, opt)
        scan_fn = make_train_scan(model, opt)

        def full_step():
            nonlocal state
            state, losses = scan_fn(state, chunk, 6)
            return losses[-1]
        timed(f"full_step_{impl}", full_step)
        summary[f"full_{impl}_ms"] = results[-1]["ms_per_step"]

        # forward-only: scan the loss so XLA cannot elide the chain
        params0 = model.init(jax.random.PRNGKey(0))

        @jax.jit
        def fwd_scanned(p, ch):
            def body(carry, bt):
                xi, yt = bt[..., :6], bt[..., 6:]
                l = jnp.mean(jnp.square(model.apply(p, xi + carry * 0) - yt))
                return l.astype(xi.dtype) * 1e-9, l
            _, ls = jax.lax.scan(body, jnp.zeros((), chunk.dtype), ch)
            return ls

        def fwd_step():
            return fwd_scanned(params0, chunk)
        timed(f"fwd_only_{impl}", fwd_step)
        summary[f"fwd_{impl}_ms"] = results[-1]["ms_per_step"]

    if not args.skip_chains:
        # mask-pass chains at the 15-op widths (per-pass in-context costs)
        from nbody_tpu.ops.knn import knn_periodic_lattice_batch
        pos = x_in[..., :3] + box / 2.0 + x_in[..., 3:6]
        pos_norm = jnp.mod(pos / box, 1.0)
        idx = jax.jit(lambda p: knn_periodic_lattice_batch(
            p, k, cells=cells, window=w))(pos_norm)
        masks = jax.jit(lambda i: blocked.block_masks(
            i, cells, w, dtype=jnp.bfloat16, core=core,
            drop_self_slot0=True))(idx)
        float(np.asarray(jax.device_get(masks.ravel()[:1]))[0])
        PASSES = 12

        def chain(width, kind):
            v0 = jax.random.normal(jax.random.PRNGKey(0), (b, n, width),
                                   jnp.bfloat16)

            @jax.jit
            def run(v, m):
                # v and m are jit ARGUMENTS, not closures — a closed-over
                # device array is serialized into the program and can blow
                # the remote compiler's request cap (CLAUDE.md fact 10)
                def body(vv, _):
                    if kind == "gather":
                        h = blocked.masked_gather_blocks(
                            vv, m, cells, w, core=core, self_slot0=True)
                        out = jnp.mean(h, axis=3) * (1.0 / k)
                        out = blocked.nodes_blocks_to_cube(out, cells, core)
                    else:
                        h = blocked.edges_cube_to_blocks(
                            jnp.broadcast_to(vv[:, :, None, :],
                                             (b, n, k, width)), cells, core)
                        out = blocked.masked_scatter_add_blocks(
                            h, m, cells, w, core=core,
                            self_slot0=True) * (1.0 / k)
                    return out.astype(vv.dtype), jnp.sum(
                        out, dtype=jnp.float32) * 1e-9
                _, sums = jax.lax.scan(body, v, None, length=PASSES)
                return sums

            def step():
                return run(v0, masks)
            return step

        for width, kind in ((512, "gather"), (512, "scatter"),
                            (64, "gather")):
            timed(f"chain_{kind}_w{width}_x{PASSES}", chain(width, kind))
            summary[f"per_pass_{kind}_w{width}_ms"] = round(
                results[-1]["ms_per_step"] / PASSES, 2)

    print(json.dumps({"summary": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
