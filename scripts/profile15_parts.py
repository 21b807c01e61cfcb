#!/usr/bin/env python
"""15-op forward-pass component decomposition by program ablation.

profile_step15 localized the 15-op family's cost to the FORWARD pass
(556 ms of the 1117 ms step at 32^3 b4 K14 core (4,8,8)) — yet its mask
passes cost only ~12 ms each (the w512 chain), so the ~12 passes of a
6-layer forward account for well under 150 ms.  Something OTHER than the
mask traffic dominates, and the candidates are all trace-visible layer
components: the (K,K) slot contraction, the K*C-wide gather ride, the
x_col/x_row broadcast rides, the fused diagonal write (an .at[].add into
slot 0 of the full edge tensor), the pool scatter, or the block-B
liveness multiply.

This script times fwd-only programs with one component ablated at a time
(models/shiftinv15.set_ablate — the layer skips the component at trace
time) plus a minimal everything-off variant; deltas vs the full forward
localize the cost.  Ablated programs compute a DIFFERENT function — they
exist only for this measurement.

Run only after a successful tunnel probe:
  python scripts/profile15_parts.py --platform default
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


ABLATIONS = [
    ("full", ()),
    ("no_slotsum", ("slotsum",)),          # keep the wide ride, drop (K,K)
    ("no_transpose", ("transpose",)),      # drop ride + contraction
    ("no_bcast", ("bcast",)),
    ("no_diag", ("diag",)),
    ("no_pools", ("pools",)),
    ("no_maskmul", ("maskmul",)),
    ("minimal", ("transpose", "bcast", "diag", "pools", "maskmul")),
]


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("-b", "--batch", type=int, default=4)
    ap.add_argument("-k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--scan", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--core", type=int, nargs=3, default=[8, 8, 8])
    ap.add_argument("--only", nargs="+", default=None,
                    help="subset of ablation names to run")
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
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.models import shiftinv15 as S15
    from nbody_tpu.ops import blocked

    cells, b, k, w = args.cells, args.batch, args.k, args.window
    box = 4.0 * cells
    blocked.set_masked_core(tuple(args.core))

    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    x = features_from_raw(raw)
    x_in = jnp.asarray(x[..., :6])
    y = jnp.asarray(x[..., 6:])
    chunkx = jnp.broadcast_to(x_in[None], (args.scan,) + x_in.shape)

    cfg = C.ModelConfig(family="shiftinv15", channels=tuple(C.GRAPH_CHANNELS),
                        k_neighbors=k, dtype="bfloat16", knn_window=w,
                        neighbor_impl="masked")
    S15.set_transpose_impl("gather")
    results = {}
    for name, names in ABLATIONS:
        if args.only and name not in args.only:
            continue
        S15.set_ablate(names)
        model = build_model(cfg, box=box)
        params = model.init(jax.random.PRNGKey(0))

        @jax.jit
        def fwd_scanned(p, ch, yt):
            def body(carry, xi):
                l = jnp.mean(jnp.square(
                    model.apply(p, xi + carry * 0) - yt))
                return l.astype(xi.dtype) * 1e-9, l
            _, ls = jax.lax.scan(body, jnp.zeros((), ch.dtype), ch)
            return ls

        t0 = time.perf_counter()
        out = fwd_scanned(params, chunkx, y)
        probe = float(np.asarray(jax.device_get(out.ravel()[:1]))[0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fwd_scanned(params, chunkx, y)
            _ = float(np.asarray(jax.device_get(out.ravel()[:1]))[0])
            ts.append((time.perf_counter() - t0) / args.scan)
        rec = {"ablate": name, "fwd_ms": round(min(ts) * 1e3, 2),
               "all_ms": [round(t * 1e3, 2) for t in sorted(ts)],
               "compile_s": round(compile_s, 1), "probe_loss": round(probe, 4)}
        results[name] = rec["fwd_ms"]
        print(json.dumps(rec), flush=True)
    S15.set_ablate(())

    if "full" in results:
        deltas = {n: round(results["full"] - v, 2) for n, v in results.items()
                  if n != "full"}
        print(json.dumps({"summary": {"core": args.core,
                                      "full_fwd_ms": results["full"],
                                      "delta_ms": deltas}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
