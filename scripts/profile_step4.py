#!/usr/bin/env python
"""Round-4 step decomposition (VERDICT r3 #5: produce a MEASURED plan).

Where does the post-self-slot 32^3 b4 K14 masked step spend its time?
Components measured by program deltas (standalone per-op timing over the
tunnel is floor-limited at ~37-40 ms/dispatch — PERF.md):

  A. full train step (scan-10)                       — the headline
  B. step with a baked idx (--no-knn twin)            — A-B = kNN rebuild
  C. an M-pass mask-op chain, no network matmuls      — the mask-bound part
     (M matches the step's pass count: L*4 + featurizer + counts)
  D. the network's pure-matmul twin (all neighbor ops
     replaced by identity slot copies)                — matmul + activation
     traffic floor, zero mask passes

Each timed as min of 3 scan-10 dispatches ending in a one-element fetch.
Prints one JSON line per component.

Run only after a successful tunnel probe:
  python scripts/profile_step4.py --platform default
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
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--core", type=int, nargs=3, default=None)
    ap.add_argument("--mask_dtype", default="auto",
                    choices=["auto", "int8", "int4", "index"],
                    help="mask storage mode for A and B (config.ModelConfig)")
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
        out0 = float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
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

    # ---- A: full train step --------------------------------------------
    cfg = C.ModelConfig(family="shiftinv", channels=tuple(C.GRAPH_CHANNELS),
                        k_neighbors=k, dtype="bfloat16", knn_window=w,
                        neighbor_impl="masked", mask_dtype=args.mask_dtype)
    model = build_model(cfg, box=box)
    opt = optax.adam(1e-3)
    state = init_train_state(model, opt)
    scan_fn = make_train_scan(model, opt)
    batch = jnp.concatenate([x_in, y], axis=-1)
    chunk = jnp.broadcast_to(batch[None], (args.scan,) + batch.shape)

    def full_step():
        nonlocal state
        state, losses = scan_fn(state, chunk, 6)
        return losses[-1]
    timed("A_full_step", full_step)

    # ---- geometry shared by B/C/D --------------------------------------
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    pos = x_in[..., :3] + box / 2.0 + x_in[..., 3:6]
    pos_norm = jnp.mod(pos / box, 1.0)
    idx = jax.jit(lambda p: knn_periodic_lattice_batch(
        p, k, cells=cells, window=w))(pos_norm)
    if args.mask_dtype == "index":
        masks = jax.jit(lambda i: blocked.block_positions(
            i, cells, w, core=core, drop_self_slot0=True))(idx)
    else:
        mdt = {"auto": jnp.bfloat16, "int8": jnp.int8,
               "int4": jnp.int4}[args.mask_dtype]
        masks = jax.jit(lambda i: blocked.block_masks(
            i, cells, w, dtype=mdt, core=core,
            drop_self_slot0=True))(idx)
    # one-element fetch: a true barrier for the mask/position build
    # (jax.block_until_ready is unreliable on this platform, CLAUDE.md)
    float(np.asarray(jax.device_get(masks.ravel()[:1]))[0])

    # ---- B: mask-op chain, no network matmuls --------------------------
    # L*4 fwd-equivalent passes: alternate scatter/gather like the train
    # step's fwd+bwd sequence does (8 layers x (2 fwd + 2 bwd) + feat +
    # counts ~ 34; scan carries the chain so XLA cannot elide passes).
    L_PASSES = 34
    cvals = jax.random.normal(jax.random.PRNGKey(0),
                              (b, n, 64), jnp.bfloat16)

    def one_chain(v, m):
        h = blocked.masked_gather_blocks(v, m, cells, w, core=core,
                                         self_slot0=True)   # 1 pass
        for _ in range((L_PASSES - 2) // 2):
            s = blocked.masked_scatter_add_blocks(h, m, cells, w,
                                                  core=core, self_slot0=True)
            h = blocked.masked_gather_blocks(
                s * (1.0 / k), m, cells, w, core=core, self_slot0=True)
        return blocked.masked_scatter_add_blocks(h, m, cells, w,
                                                 core=core, self_slot0=True)

    @jax.jit
    def chain_scanned(v0, m):
        # a true sequential chain: each scan iteration consumes the
        # previous output, so XLA cannot CSE/hoist the mask passes —
        # one dispatch for scan x L_PASSES passes, like the train scan.
        # m MUST be an argument, not a closure: jit embeds closed-over
        # device arrays as program constants, and the GB-scale one-hot
        # blew the remote compiler's request-size cap (HTTP 413).
        def body(v, _):
            out = one_chain(v, m)
            return out * (1.0 / k), jnp.sum(out, dtype=jnp.float32) * 1e-9
        _, sums = jax.lax.scan(body, v0, None, length=args.scan)
        return sums

    def chain_step():
        return chain_scanned(cvals, masks)
    timed(f"B_mask_chain_{L_PASSES}_passes", chain_step)

    # ---- C: matmul/activation twin (zero mask passes) -------------------
    from nbody_tpu.models.base import init_network_params
    params_mm = init_network_params(jax.random.PRNGKey(1),
                                    list(C.GRAPH_CHANNELS), num_weights=4,
                                    num_biases=1, dtype=jnp.float32)

    def mm_layer(h, lp, is_last):
        wt = lp["W"]
        h1 = jnp.einsum("bnkc,cq->bnkq", h, wt[0],
                        preferred_element_type=h.dtype)
        h2 = jnp.einsum("bnkc,cq->bnkq", h, wt[1],
                        preferred_element_type=h.dtype)
        h3 = jnp.einsum("bnc,cq->bnq", jnp.mean(h, axis=2), wt[2],
                        preferred_element_type=h.dtype)[:, :, None, :]
        h4 = jnp.einsum("bc,cq->bq", jnp.mean(h, axis=(1, 2)), wt[3],
                        preferred_element_type=h.dtype)[:, None, None, :]
        out = h1 + h2 + h3 + h4 + lp["B"][0]
        return jnp.mean(out, axis=2) if is_last else jax.nn.relu(out)

    def mm_net(params, e):
        h = e
        for i, lp in enumerate(params):
            h = mm_layer(h, jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), lp),
                i == len(params) - 1)
        return h.astype(jnp.float32)

    edges0 = jax.random.normal(jax.random.PRNGKey(2), (b, n, k, 3),
                               jnp.bfloat16)

    def mm_loss(p):
        return jnp.mean(jnp.square(mm_net(p, edges0) - y))

    mm_opt_state = opt.init(params_mm)

    @jax.jit
    def mm_train(p, o):
        for _ in range(args.scan):
            l, g = jax.value_and_grad(mm_loss)(p)
            up, o = opt.update(g, o, p)
            p = optax.apply_updates(p, up)
        return p, o, l

    def mm_step():
        nonlocal params_mm, mm_opt_state
        params_mm, mm_opt_state, l = mm_train(params_mm, mm_opt_state)
        return l
    timed("C_matmul_twin", mm_step)

    print(json.dumps({"summary": {
        "core": list(core),
        "full_ms": results[0]["ms_per_step"],
        "mask_chain_ms": results[1]["ms_per_step"],
        "ms_per_mask_pass": round(results[1]["ms_per_step"] / L_PASSES, 2),
        "matmul_twin_ms": results[2]["ms_per_step"],
        "residual_ms": round(results[0]["ms_per_step"]
                             - results[1]["ms_per_step"]
                             - results[2]["ms_per_step"], 2),
    }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
