"""Chain-benchmark the fused layer-boundary kernel vs the unfused einsum
pair at real 32^3 b4 K14 core-(4,8,8) shapes (PERF.md round-5 ledger
item 1).  Prints one JSON line per variant.

Method matches scripts/profile_step4: a lax.scan of NPASS dependent
applications (the output feeds the next input so XLA cannot elide),
jitted once, timed over the median of 3 dispatches, barriered by a
one-element device->host fetch (platform fact 2)."""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--cells", type=int, default=32)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--k", type=int, default=14)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--passes", type=int, default=10)
    p.add_argument("--group", type=int, default=1)
    p.add_argument("--platform", type=str, default=None)
    return p


def main():
    args = build_parser().parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_compilation_cache", True)
    import jax.numpy as jnp
    from nbody_tpu.ops.pallas.fused_kernels import (boundary_reference,
                                                    fused_boundary_dot)

    core = (4, 8, 8)
    w = 2
    r = int(np.prod(core))
    n = args.cells ** 3
    nb = n // r
    et = r * (args.k - 1)                      # self slot dropped
    p_ = int(np.prod([c + 2 * w for c in core]))
    c, q = args.channels, args.channels
    b = args.batch
    rng = np.random.default_rng(0)
    masks = jnp.asarray((rng.integers(0, p_, (b, nb, et, 1)) ==
                         np.arange(p_)).astype(np.float32), jnp.bfloat16)
    patches = jnp.asarray(rng.normal(size=(b, nb, p_, c)), jnp.bfloat16)
    a = jnp.asarray(rng.normal(size=(b, nb, et, c)) * 0.01, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, q)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(c, q)) * 0.1, jnp.bfloat16)
    npass = args.passes

    def chain(fn):
        # every large operand is a jit ARGUMENT (platform fact 10: a
        # GB-scale closure constant blows the remote compiler's request
        # cap before anything runs)
        def run(p0, m_, a_, w1_, w2_):
            def step(carry, _):
                act, h1, s = fn(m_, carry, a_, w1_, w2_)
                # feed s (P, q) back as the next patches; normalize to
                # keep magnitudes finite across the chain
                nxt = (s / jnp.float32(et)).astype(patches.dtype)
                return nxt, h1[0, 0, 0, 0]
            out, ys = jax.lax.scan(step, p0, None, length=npass)
            return ys
        return jax.jit(run)

    def timed(label, fn):
        t0 = time.time()
        f = chain(fn)
        ys = f(patches, masks, a, w1, w2)
        float(ys[0])                     # fetch ONE element (fact 2)
        compile_s = time.time() - t0
        secs = []
        for _ in range(3):
            t0 = time.time()
            ys = f(patches, masks, a, w1, w2)
            float(ys[0])
            secs.append(time.time() - t0)
        secs.sort()
        ms_per_pass = secs[1] / npass * 1e3
        print(json.dumps({
            "variant": label, "cells": args.cells, "batch": b,
            "group": args.group, "et": et, "p": p_, "c": c,
            "passes": npass, "ms_per_pass": round(ms_per_pass, 3),
            "all_s": [round(s_, 4) for s_ in secs],
            "compile_s": round(compile_s, 1)}), flush=True)
        return ms_per_pass

    fused = lambda *a_: fused_boundary_dot(
        *a_, group=args.group,
        interpret=(jax.default_backend() == "cpu"))
    timed("fused_boundary", fused)
    timed("unfused_einsum_pair", boundary_reference)


if __name__ == "__main__":
    main()
