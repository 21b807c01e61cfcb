#!/usr/bin/env python
"""Real-hardware numerics smoke: the Mosaic kernels vs the numpy oracle.

The test suite runs on a forced-CPU platform (interpret-mode Pallas), which
cannot catch Mosaic-lowering or real-bf16 divergences (the round-1 advisor
caught one exactly there).  This script runs the actual TPU kernels on a
small case and checks them against direct indexing:

  * block/banded gather + scatter, fast (bf16) and exact (f32) modes;
  * the integer-id gather exactness guarantee (exact mode);
  * a shiftinv forward pass TPU-vs-CPU within mixed-precision tolerance.

Prints one JSON line; nonzero exit on any check failure.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from scripts.profile_ops import probe_tunnel
    if not probe_tunnel():
        print(json.dumps({"error": "tunnel hung"}))
        return 1

    import jax
    import jax.numpy as jnp
    from nbody_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from nbody_tpu.ops.banded import neighbor_gather, neighbor_scatter_add
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.data.grid import grid_positions_np

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()

    cells, k, w, c, b = 16, 6, 2, 8, 2
    n = cells ** 3
    box = 4.0 * cells
    rng = np.random.default_rng(0)
    disp = rng.normal(0, 1.0, (b, n, 3)).astype(np.float32)
    pos = np.mod((grid_positions_np(cells, box)[None] + disp) / box,
                 1.0).astype(np.float32)
    idx = np.asarray(jax.device_get(
        knn_periodic_lattice_batch(jnp.asarray(pos), k, cells=cells,
                                   window=w)))
    vals = rng.normal(size=(b, n, c)).astype(np.float32)
    evals = rng.normal(size=(b, n, k, c)).astype(np.float32)

    results = {}

    def check(tag, got, want, tol):
        err = float(np.max(np.abs(np.asarray(got) - want)))
        results[tag] = round(err, 6)
        ok = err <= tol
        if not ok:
            results[tag + "_FAIL"] = True
        return ok

    ok = True
    want_g = np.stack([vals[i][idx[i]] for i in range(b)])
    want_s = np.zeros((b, n, c), np.float32)
    for i in range(b):
        np.add.at(want_s[i], idx[i].reshape(-1), evals[i].reshape(-1, c))

    for lattice, name in (((cells, w), "block"), (None, "banded")):
        band = None if lattice else 2 * (w + 1) * cells * cells
        g_fast = jax.jit(lambda v, i: neighbor_gather(v, i, band, lattice))(
            jnp.asarray(vals), jnp.asarray(idx))
        ok &= check(f"{name}_gather_fast", jax.device_get(g_fast), want_g,
                    2e-2)
        g_ex = jax.jit(lambda v, i: neighbor_gather(v, i, band, lattice,
                                                    True))(
            jnp.asarray(vals), jnp.asarray(idx))
        ok &= check(f"{name}_gather_exact", jax.device_get(g_ex), want_g,
                    1e-6)
        s_fast = jax.jit(lambda v, i: neighbor_scatter_add(v, i, band,
                                                           lattice))(
            jnp.asarray(evals), jnp.asarray(idx))
        ok &= check(f"{name}_scatter_fast", jax.device_get(s_fast), want_s,
                    0.15)
        # integer ids through the exact path (the ADVICE.md high finding)
        ids = jax.jit(lambda v, i: neighbor_gather(v, i, band, lattice,
                                                   True))(
            jnp.asarray(idx, jnp.float32), jnp.asarray(idx))
        want_ids = np.stack([idx[i][idx[i]] for i in range(b)]).astype(
            np.float32)
        ok &= check(f"{name}_int_ids_exact", jax.device_get(ids), want_ids,
                    0.0)

    # shiftinv forward: TPU (bf16 fast kernels) vs CPU (f32 direct gathers)
    from nbody_tpu import config as C
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    x = features_from_raw(synthetic_raw_cubes(num_samples=2, cells=cells,
                                              seed=1))[..., :6]
    cfg = C.ModelConfig(family="shiftinv", channels=(3, 16, 16, 3),
                        k_neighbors=k, dtype="bfloat16", knn_window=w,
                        neighbor_impl="block")
    model = build_model(cfg, box=box)
    params = model.init(jax.random.PRNGKey(3))
    out_tpu = np.asarray(jax.device_get(
        jax.jit(model.apply)(params, jnp.asarray(x))))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out_cpu = np.asarray(jax.device_get(
            jax.jit(model.apply)(jax.device_put(params, cpu),
                                 jax.device_put(jnp.asarray(x), cpu))))
    scale = float(np.max(np.abs(out_cpu)) + 1e-6)
    rel = float(np.max(np.abs(out_tpu - out_cpu)) / scale)
    results["shiftinv_fwd_rel_err"] = round(rel, 5)
    ok &= rel < 0.05  # bf16 compute vs f32: ~1e-2 relative expected

    results["ok"] = bool(ok)
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
