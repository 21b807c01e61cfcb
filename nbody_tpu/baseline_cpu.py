"""CPU reference-pipeline emulation for baseline measurement.

The reference publishes no benchmark numbers (BASELINE.md), so the
denominator must be measured: this module reproduces the reference's
per-step structure — host-side ghost-particle padding + sklearn exact kNN
per minibatch (reference graph.py:798-917, 704-713), feeding a
single-device network train step on CPU — and times it.

Two generosities (both make the measured baseline FASTER than the real
reference, i.e. our reported speedup is conservative):
  * the ghost padding is vectorized numpy instead of the reference's
    per-particle Python loop (graph.py:827-855, which is O(N) appends);
  * the network step is jit-compiled JAX on CPU rather than TF1 feed_dict.

Run as a script (prints one JSON line):
    JAX_PLATFORMS=cpu python -m nbody_tpu.baseline_cpu --cells 32 -b 4 -k 14
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


# all 26 nonzero image shifts, grouped like the reference's
# face/edge/corner clones (graph.py:801-825)
_SHIFTS = np.array([[i, j, l] for i in (-1, 0, 1) for j in (-1, 0, 1)
                    for l in (-1, 0, 1) if (i, j, l) != (0, 0, 0)],
                   dtype=np.float64)


def pad_cube_vectorized(x: np.ndarray, boundary_threshold: float = 0.1):
    """Vectorized twin of the reference's pad_cube_boundaries
    (graph.py:827-855): particles near a face/edge/corner get shifted
    clones; returns (padded (M,3), idx_map (M-N,)) mapping clones->originals.
    """
    n = x.shape[0]
    lower, upper = boundary_threshold, 1.0 - boundary_threshold
    # bound = +1 where the particle hugs the low face (clone shifts +1), etc.
    bound = np.where(x >= upper, -1, np.where(x <= lower, 1, 0))
    clones, idx_map = [x], []
    for s in _SHIFTS:
        active = s != 0
        mask = np.all(bound[:, active] == s[active], axis=1)
        if mask.any():
            clones.append(x[mask] + s)
            idx_map.append(np.nonzero(mask)[0])
    idx_map = np.concatenate(idx_map) if idx_map else np.zeros(0, np.int64)
    return np.concatenate(clones, axis=0), idx_map


def pbc_knn_host(pos: np.ndarray, k: int,
                 boundary_threshold: float = 0.1) -> np.ndarray:
    """Reference-style host kNN on one [0,1) cube -> (N, K) with self at 0."""
    from sklearn.neighbors import kneighbors_graph
    n = pos.shape[0]
    padded, idx_map = pad_cube_vectorized(pos, boundary_threshold)
    graph = kneighbors_graph(padded, k, include_self=True)
    raw = graph[:n].indices.reshape(n, k)
    remap = np.concatenate([np.arange(n, dtype=np.int64), idx_map])
    idx = remap[raw]
    # move the self edge to slot 0 (ops.knn guarantees this on device)
    rows = np.arange(n)
    self_pos = np.argmax(idx == rows[:, None], axis=1)
    first = idx[rows, 0].copy()
    idx[rows, 0] = idx[rows, self_pos]
    idx[rows, self_pos] = first
    return idx.astype(np.int32)


def measure_reference_graph_step(cells: int = 32, batch: int = 4, k: int = 14,
                                 iters: int = 3, warmup: int = 1,
                                 seed: int = 0) -> dict:
    """Time the reference pipeline: per-step host kNN + CPU network step."""
    import jax
    import jax.numpy as jnp
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch
    from nbody_tpu.models.shiftinv import init_shiftinv_params, shiftinv_model
    from nbody_tpu.physics.losses import loss_za

    box = 4.0 * cells
    n = cells ** 3
    raw = synthetic_raw_cubes(num_samples=batch * (iters + warmup), cells=cells,
                              seed=seed)
    x = features_from_raw(raw)

    channels = list(C.GRAPH_CHANNELS)
    params = init_shiftinv_params(jax.random.PRNGKey(1), channels)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def net_step(params, opt_state, pos, za, idx, y):
        def loss(p):
            return loss_za(shiftinv_model(p, pos, za, idx, box), y)

        lv, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lv

    def full_step(params, opt_state, batch_x):
        x_in, y = split_batch(batch_x)
        q = x_in[..., :3] + box / 2.0
        za = x_in[..., 3:6]
        pos = q + za
        pos_norm = np.mod(pos / box, 1.0)
        idx = np.stack([pbc_knn_host(pos_norm[i], k) for i in range(batch)])
        return net_step(params, opt_state, jnp.asarray(pos), jnp.asarray(za),
                        jnp.asarray(idx), jnp.asarray(y))

    times = []
    for i in range(warmup + iters):
        bx = x[i * batch:(i + 1) * batch]
        t0 = time.perf_counter()
        params, opt_state, lv = full_step(params, opt_state, bx)
        jax.block_until_ready(lv)
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
    sec = float(np.median(times))
    return {
        "config": f"shiftinv graph step, {cells}^3 cube, b={batch}, K={k}, "
                  "host sklearn PBC-kNN per step + CPU jit network",
        "sec_per_step": sec,
        "particle_steps_per_sec": batch * n / sec,
    }


def measure_reference_15op_step(cells: int = 32, batch: int = 4, k: int = 14,
                                iters: int = 2, warmup: int = 1,
                                seed: int = 0) -> dict:
    """Time the reference-pipeline equivalent of the 15-operator family:
    per-step host sklearn PBC-kNN + CPU jitted 15-op network step.

    The reference's own 15-op path was never runnable (its adj-dict builder
    does not exist anywhere in the repo — SURVEY.md C12), so this measured
    emulation IS the denominator for the family's speedup claims: the same
    symmetrized-graph math (oracle-tested against COO semantics), host
    graph build per step like the reference intended, CPU XLA network —
    strictly faster than the TF1 feed_dict original would have been.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch
    from nbody_tpu.models.shiftinv15 import (init_shiftinv15_params,
                                             shiftinv15_model)
    from nbody_tpu.physics.losses import loss_za

    box = 4.0 * cells
    n = cells ** 3
    raw = synthetic_raw_cubes(num_samples=batch * (iters + warmup),
                              cells=cells, seed=seed)
    x = features_from_raw(raw)

    params = init_shiftinv15_params(jax.random.PRNGKey(1),
                                    list(C.GRAPH_CHANNELS))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def net_step(params, opt_state, pos, za, idx, y):
        def loss(p):
            return loss_za(shiftinv15_model(p, pos, za, idx, box), y)

        lv, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lv

    def full_step(params, opt_state, batch_x):
        x_in, y = split_batch(batch_x)
        q = x_in[..., :3] + box / 2.0
        za = x_in[..., 3:6]
        pos = q + za
        pos_norm = np.mod(pos / box, 1.0)
        idx = np.stack([pbc_knn_host(pos_norm[i], k) for i in range(batch)])
        return net_step(params, opt_state, jnp.asarray(pos), jnp.asarray(za),
                        jnp.asarray(idx), jnp.asarray(y))

    times = []
    for i in range(warmup + iters):
        bx = x[i * batch:(i + 1) * batch]
        t0 = time.perf_counter()
        params, opt_state, lv = full_step(params, opt_state, bx)
        jax.block_until_ready(lv)
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
    sec = float(np.median(times))
    return {
        "config": f"shiftinv15 graph step, {cells}^3 cube, b={batch}, K={k}, "
                  "host sklearn PBC-kNN per step + CPU jit 15-op network",
        "sec_per_step": sec,
        "particle_steps_per_sec": batch * n / sec,
    }


def measure_reference_set_step(cells: int = 32, batch: int = 4,
                               iters: int = 5, warmup: int = 2,
                               seed: int = 0) -> dict:
    """Time the reference's wired path (train.py): set model step on CPU."""
    import jax
    import jax.numpy as jnp
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.train.trainer import init_train_state, make_train_step

    n = cells ** 3
    raw = synthetic_raw_cubes(num_samples=batch * 2, cells=cells, seed=seed)
    x = features_from_raw(raw)
    model = build_model(C.ModelConfig(family="set"), box=4.0 * cells)
    opt = optax.adam(1e-2)
    state = init_train_state(model, opt)
    step = make_train_step(model, opt)

    times = []
    for i in range(warmup + iters):
        bx = jnp.asarray(x[(i % 2) * batch:(i % 2 + 1) * batch])
        x_in, y = split_batch(bx)
        t0 = time.perf_counter()
        state, lv = step(state, x_in, y)
        jax.block_until_ready(lv)
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    return {
        "config": f"set-model step, {cells}^3 cube, b={batch}, CPU jit",
        "sec_per_step": sec,
        "particle_steps_per_sec": batch * n / sec,
    }


def measure_reference_family_step(family: str, cells: int = 32,
                                  batch: int = 4, iters: int = 5,
                                  warmup: int = 2, seed: int = 0) -> dict:
    """Time a non-graph reference family (set / attn) on CPU: the
    registry-built model's jitted train step, reference defaults."""
    import jax
    import jax.numpy as jnp
    import optax
    from nbody_tpu import config as C
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.train.trainer import init_train_state, make_train_step

    n = cells ** 3
    raw = synthetic_raw_cubes(num_samples=batch * 2, cells=cells, seed=seed)
    x = features_from_raw(raw)
    model = build_model(C.ModelConfig(family=family), box=4.0 * cells)
    opt = optax.adam(1e-2)
    state = init_train_state(model, opt)
    step = make_train_step(model, opt)

    times = []
    for i in range(warmup + iters):
        bx = jnp.asarray(x[(i % 2) * batch:(i % 2 + 1) * batch])
        x_in, y = split_batch(bx)
        t0 = time.perf_counter()
        state, lv = step(state, x_in, y)
        jax.block_until_ready(lv)
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    return {
        "config": f"{family}-model step, {cells}^3 cube, b={batch}, CPU jit",
        "sec_per_step": sec,
        "particle_steps_per_sec": batch * n / sec,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cells", type=int, default=32)
    p.add_argument("-b", "--batch", type=int, default=4)
    p.add_argument("-k", "--kneighbors", type=int, default=14)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--family", type=str, default="all",
                   choices=["all", "graph", "graph15", "set", "attn"])
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    out = {}
    if args.family in ("all", "graph"):
        out["graph"] = measure_reference_graph_step(
            args.cells, args.batch, args.kneighbors, args.iters)
    if args.family in ("all", "graph15"):
        out["graph15"] = measure_reference_15op_step(
            args.cells, args.batch, args.kneighbors)
    if args.family in ("all", "set"):
        out["set"] = measure_reference_set_step(args.cells, args.batch)
    if args.family in ("all", "attn"):
        out["attn"] = measure_reference_family_step("attn", args.cells,
                                                    args.batch)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
