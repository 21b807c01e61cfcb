#!/usr/bin/env python
"""Per-op TPU timing harness for the neighbor kernels (perf work, PERF.md).

Times, on the real TPU:
  * the full shiftinv train step at the bench config (32^3, b4, K14);
  * the lattice kNN alone;
  * one block gather / scatter at several channel widths;
  * one banded gather / scatter for comparison.

Usage: python scripts/profile_ops.py [--cells 32] [--probe-only]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def probe_tunnel(timeout_s: float = 150.0) -> bool:
    """Tiny matmul with a hard timeout: the tunnel sometimes hangs."""
    import subprocess
    code = ("import jax, jax.numpy as jnp; "
            "print('PROBE', float(jnp.dot(jnp.ones((8,8)), jnp.ones((8,8)))[0,0]))")
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                             capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    return "PROBE 8.0" in out.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--probe-only", action="store_true")
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--skip-banded", action="store_true")
    ap.add_argument("--skip-block", action="store_true")
    ap.add_argument("--core", type=int, nargs=3, default=None,
                    help="block core shape to test, e.g. --core 4 8 8")
    ap.add_argument("--channels", type=int, nargs="+", default=[64, 32, 16])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--masked", action="store_true",
                    help="profile the shared-mask einsum ops")
    ap.add_argument("--masked-core", type=int, nargs=3, default=None)
    args = ap.parse_args()

    ok = probe_tunnel()
    print(f"tunnel probe: {'OK' if ok else 'HUNG'}")
    if not ok or args.probe_only:
        return 0 if ok else 1

    import jax
    import jax.numpy as jnp
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.ops.banded import default_band
    import nbody_tpu.ops.blocked as blocked
    from nbody_tpu.ops.blocked import block_gather, block_scatter_add
    if args.core:
        blocked.set_core(tuple(args.core))
    CORE = blocked.CORE
    from nbody_tpu.ops.pallas.banded_kernels import (
        banded_gather_pallas, banded_scatter_add_pallas)
    from nbody_tpu.utils.profiling import timed

    cells, b, k, w = args.cells, args.batch, args.k, args.window
    n = cells ** 3
    box = 4.0 * cells
    print(f"config: {cells}^3 b{b} K{k} w{w}, CORE={CORE}", flush=True)

    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=0)
    x = features_from_raw(raw)
    pos = jnp.asarray(np.mod((x[..., :3] + box / 2 + x[..., 3:6]) / box, 1.0))

    def bench(tag, fn, *a, **kw):
        f = jax.jit(fn, **kw)
        _, t_compile = timed(f, *a)
        ts = []
        for _ in range(args.reps):
            _, t = timed(f, *a)
            ts.append(t)
        print(f"{tag:44s} {min(ts)*1e3:9.2f} ms  (compile {t_compile:.1f}s)",
              flush=True)
        return min(ts)

    # kNN
    knn = lambda p: knn_periodic_lattice_batch(p, k, cells=cells, window=w)
    idx = jax.jit(knn)(pos)
    bench("lattice kNN", knn, pos)
    idx = jnp.asarray(np.asarray(idx))

    band = default_band(cells, window=w)
    rng = np.random.default_rng(0)
    for c in ([] if args.skip_block else args.channels):
        v = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        ev = jnp.asarray(rng.normal(size=(b, n, k, c)).astype(np.float32))
        bench(f"block_gather   C={c} core={CORE}",
              lambda vv, ii: block_gather(vv, ii, cells, w), v, idx)
        bench(f"block_scatter  C={c} core={CORE}",
              lambda vv, ii: block_scatter_add(vv, ii, cells, w), ev, idx)
        if c == 64 and not args.skip_banded:
            bench(f"banded_gather  C={c} band={band}",
                  lambda vv, ii: banded_gather_pallas(vv, ii, band), v, idx)
            bench(f"banded_scatter C={c} band={band}",
                  lambda vv, ii: banded_scatter_add_pallas(vv, ii, band),
                  ev, idx)

    if args.masked:
        from nbody_tpu.ops.blocked import (
            MASKED_CORE, block_masks, masked_gather_blocks,
            masked_scatter_add_blocks)
        mcore = tuple(args.masked_core) if args.masked_core else MASKED_CORE
        r = mcore[0] * mcore[1] * mcore[2]
        nb = n // r
        bench(f"block_masks core={mcore}",
              lambda ii: block_masks(ii, cells, w, core=mcore), idx)
        masks = jax.jit(
            lambda ii: block_masks(ii, cells, w, core=mcore))(idx)
        masks = jax.block_until_ready(masks)
        for c in args.channels:
            v = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)
                            ).astype(jnp.bfloat16)
            eb = jnp.asarray(rng.normal(size=(b, nb, r, k, c)
                                        ).astype(np.float32)
                             ).astype(jnp.bfloat16)
            bench(f"masked_gather_blocks  C={c} core={mcore}",
                  lambda vv, mm: masked_gather_blocks(vv, mm, cells, w,
                                                      core=mcore), v, masks)
            bench(f"masked_scatter_blocks C={c} core={mcore}",
                  lambda ee, mm: masked_scatter_add_blocks(ee, mm, cells, w,
                                                           core=mcore),
                  eb, masks)
            bench(f"masked gather VJP     C={c} core={mcore}",
                  lambda ee, mm, vv: jax.vjp(
                      lambda u: masked_gather_blocks(u, mm, cells, w,
                                                     core=mcore), vv
                  )[1](ee)[0], eb, masks, v)

    if not args.skip_step:
        import optax
        from nbody_tpu.train.trainer import init_train_state, make_train_step
        model = build_model(
            C.ModelConfig(family="shiftinv", channels=tuple(C.GRAPH_CHANNELS),
                          k_neighbors=k, dtype="bfloat16", knn_window=w,
                          neighbor_impl="block"), box=box)
        opt = optax.adam(1e-3)
        state = init_train_state(model, opt)
        step = make_train_step(model, opt)
        x_in = jnp.asarray(x[..., :6])
        y = jnp.asarray(x[..., 6:])
        t0 = time.perf_counter()
        state, loss = step(state, x_in, y)
        float(loss)
        print(f"train step compile+1st: {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, loss = step(state, x_in, y)
            float(loss)
            ts.append(time.perf_counter() - t0)
        sec = min(ts)
        print(f"train step: {sec*1e3:.1f} ms  ({b*n/sec:,.0f} pps)")

        # forward only
        fwd = jax.jit(lambda p, xx: model.apply(p, xx))
        _, tc = timed(fwd, state.params, x_in)
        ts = [timed(fwd, state.params, x_in)[1] for _ in range(args.reps)]
        print(f"forward only: {min(ts)*1e3:.1f} ms (compile {tc:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
