#!/usr/bin/env python
"""Stencil regularity go/no-go (VERDICT r4 next #7).

Hypothesis: at realistic ZA amplitudes many rows' lattice-kNN set equals
the MODAL 14-offset stencil (the same (dx,dy,dz) per slot for every row).
For those rows the gather/scatter would be FREE static rolls — zero mask
traffic — leaving masked work only for deviant rows.

This measures, on the bench data class (synthetic ZA at --cells), the
per-slot modal offsets and:
  * edge_modal_frac — edges whose offset equals their slot's mode;
  * row_modal_frac  — rows whose ENTIRE kNN set equals the modal stencil
    (the fraction that could take the all-static path).

Go/no-go per the verdict: >= ~0.7 row fraction -> prototype the split op;
below -> record the number and the structural no-go in PERF.md.

Runs fine on CPU (--platform cpu): the statistic is data, not perf.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=32)
    ap.add_argument("-b", "--batch", type=int, default=4)
    ap.add_argument("-k", type=int, default=14)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--za_rms", type=float, default=1.0,
                    help="synthetic ZA displacement rms in grid units")
    ap.add_argument("--platform", default="cpu")
    return ap


def main():
    args = build_parser().parse_args()
    if args.platform not in ("auto", "default"):
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw
    from nbody_tpu.models.shiftinv15 import _lattice_offsets
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch

    cells, b, k, w = args.cells, args.batch, args.k, args.window
    box = 4.0 * cells
    raw = synthetic_raw_cubes(num_samples=b, cells=cells, seed=args.seed,
                              za_rms=args.za_rms)
    x = features_from_raw(raw)
    pos = x[..., :3] + box / 2.0 + x[..., 3:6]
    pos_norm = jnp.mod(jnp.asarray(pos) / box, 1.0)
    idx = np.asarray(jax.device_get(knn_periodic_lattice_batch(
        pos_norm, k, cells=cells, window=w)))

    # per-edge lattice offsets (b, N, K, 3), each in [-w, w]
    offs = np.asarray(jax.device_get(
        _lattice_offsets(jnp.asarray(idx), cells)))
    mo = 2 * w + 1
    code = ((offs[..., 0] + w) * mo + (offs[..., 1] + w)) * mo \
        + (offs[..., 2] + w)                       # (b, N, K) in [0, mo^3)

    # modal offset per slot (over all rows and samples)
    nslots = code.shape[-1]
    flat = code.reshape(-1, nslots)
    modal = np.empty(nslots, np.int64)
    for s in range(nslots):
        modal[s] = np.bincount(flat[:, s], minlength=mo ** 3).argmax()
    edge_modal = flat == modal[None, :]
    edge_frac = float(edge_modal.mean())
    row_frac = float(edge_modal.all(axis=1).mean())
    # slot 0 is the self edge (always offset 0) — report without it too
    edge_frac_noself = float(edge_modal[:, 1:].mean())
    row_frac_noself = float(edge_modal[:, 1:].all(axis=1).mean())

    def decode(c):
        return [int(c) // (mo * mo) - w, (int(c) // mo) % mo - w,
                int(c) % mo - w]

    print(json.dumps({
        "cells": cells, "batch": b, "k": k, "window": w,
        "za_rms": args.za_rms,
        "edge_modal_frac": round(edge_frac, 4),
        "row_modal_frac": round(row_frac, 4),
        "edge_modal_frac_noself": round(edge_frac_noself, 4),
        "row_modal_frac_noself": round(row_frac_noself, 4),
        "modal_stencil": [decode(c) for c in modal],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
