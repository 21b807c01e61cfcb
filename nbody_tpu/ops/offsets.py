"""Offset-space neighbor gather/scatter for lattice kNN graphs.

The PERF.md optimization ledger's "offset-space formulation", built: for a
grid-ordered cube with lattice kNN (ops/knn.knn_periodic_lattice), every
edge's neighbor is one of O = (2w+1)^3 static lattice offsets (125 at
window 2).  The per-edge selection therefore needs a one-hot of width O —
9x narrower than the 3D-block patch masks of ops/blocked.py (P = 1152 at
the default (4,8,8) core), whose B*N*K*P bytes made the round-2 train step
mask-HBM-bound (VERDICT r2 weak #1).

The price of the narrow one-hot is that it is NOT shareable across
particles as a plain matmul (each particle's O offsets point at different
cube sites), so these ops avoid the MXU entirely and lean on XLA's
elementwise/reduce fusion plus static 3D rolls:

  window_stack(V):  W[n, o, :] = V[n (+) delta_o, :]
      built SEPARABLY (5 z-rolls, then 5 y-rolls, then 5 x-rolls) so the
      write traffic is ~(1 + 1/5 + 1/25) * |W| instead of 2 * |W|;
  offset_gather:    out[n, k] = W[n, sel[n, k]]
      a K-from-O selection per particle (take_along_axis or a one-hot
      reduce — measured per platform, see scripts/explore_offsets.py);
  offset_scatter_add: bin edge values by offset (one-hot reduce over K),
      then fold the (B, N, O, C) bins into node sums with the separable
      shift-add (5+5+5 static rolls on geometrically shrinking arrays).

All traffic scales with the channel width C, unlike the patch masks
(B*N*K*P regardless of C) — the win is largest exactly where the model
spends most of its ops (the [3, 32, 64, 64, 32, 16, 3] graph stack).

Replaces the same reference ops as ops/banded.py / ops/blocked.py:
tf.unsorted_segment_mean + gather re-broadcast (reference graph.py:367-391)
and the edge featurizer gathers (graph.py:326-343).

Layout discipline (CLAUDE.md platform fact 7): every roll/slice runs on a
rank-<=4 view (rows, rolled-dim, tail) — high-rank intermediates with tiny
minor dims draw pathological TPU tile layouts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def num_offsets(window: int) -> int:
    return (2 * window + 1) ** 3


def edge_offset_sel(idx: jnp.ndarray, cells: int, window: int) -> jnp.ndarray:
    """(B, N, K) lattice-kNN neighbor ids -> (B, N, K) int32 offset codes.

    sel = ((dx+w)*(2w+1) + (dy+w))*(2w+1) + (dz+w), matching the offset
    ordering of window_stack.  Requires |d| <= window per coordinate
    (guaranteed by knn_periodic_lattice; violations are caught by the
    registry coverage guard)."""
    n = idx.shape[1]
    w = window
    s = 2 * w + 1
    ii = jnp.arange(n, dtype=jnp.int32)
    x = ii // (cells * cells)
    y = (ii // cells) % cells
    z = ii % cells
    nx = idx // (cells * cells)
    ny = (idx // cells) % cells
    nz = idx % cells

    def wrapd(a, b_):
        return jnp.mod(a - b_ + cells // 2, cells) - cells // 2

    dx = wrapd(nx, x[None, :, None])
    dy = wrapd(ny, y[None, :, None])
    dz = wrapd(nz, z[None, :, None])
    sel = ((dx + w) * s + (dy + w)) * s + (dz + w)
    return jax.lax.stop_gradient(sel.astype(jnp.int32))


def _roll_stack(v: jnp.ndarray, cells: int, axis_len_before: int,
                window: int) -> jnp.ndarray:
    """(rows, cells, tail) -> (rows, cells, 2w+1, tail): slot j holds the
    array rolled so that position p sees p + (j - w) along the cells dim."""
    w = window
    # roll by -(j - w): out[:, p, j] = v[:, p + j - w]
    return jnp.stack([jnp.roll(v, w - j, axis=1)
                      for j in range(2 * w + 1)], axis=2)


def window_stack(values: jnp.ndarray, cells: int, window: int) -> jnp.ndarray:
    """(B, N, C) cube field -> (B, N, O, C): all (2w+1)^3 shifted copies.

    W[b, n, o, :] = values[b, wrap(n + delta_o), :].  Built separably: the
    z-stack costs |V|*(2w+1)/ (2w+1)^2 of the final array, etc., so total
    write traffic is ~1.25x the final (B, N, O, C) array at w=2."""
    b, n, c = values.shape
    s = 2 * window + 1
    # z axis: rows = (B, cx, cy) flattened, rolled dim = cz
    v = values.reshape(b * cells * cells, cells, c)
    v = _roll_stack(v, cells, 1, window)                 # (rows, cz, s, C)
    # y axis: rows = (B, cx), rolled dim = cy, tail = cz*s*C
    v = v.reshape(b * cells, cells, cells * s * c)
    v = _roll_stack(v, cells, 1, window)                 # (rows, cy, s, tail)
    # x axis: rows = B, rolled dim = cx, tail = cy*s*cz*s*C
    v = v.reshape(b, cells, cells * s * cells * s * c)
    v = _roll_stack(v, cells, 1, window)                 # (B, cx, s, tail)
    # order now: (B, cx, ox, cy, oy, cz, oz, C) -> (B, N, O, C)
    v = v.reshape(b, cells, s, cells, s, cells, s, c)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return v.reshape(b, n, s ** 3, c)


def offset_gather(values: jnp.ndarray, sel: jnp.ndarray, cells: int,
                  window: int, impl: str = "take") -> jnp.ndarray:
    """values (B, N, C), sel (B, N, K) offset codes -> (B, N, K, C).

    out[b, n, k] = values[b, neighbor(n, sel[n, k])].  impl:
      "take":   take_along_axis from the separably-built window stack;
      "onehot": one-hot reduce against the window stack (VPU fusion).
    """
    w = window_stack(values, cells, window)              # (B, N, O, C)
    if impl == "take":
        o = sel[..., None].astype(jnp.int32)             # (B, N, K, 1)
        return jnp.take_along_axis(w, o, axis=2)
    oh = jax.nn.one_hot(sel, num_offsets(window), dtype=values.dtype)
    return jnp.einsum("bnko,bnoc->bnkc", oh, w,
                      preferred_element_type=jnp.float32).astype(values.dtype)


def offset_bin(vals: jnp.ndarray, sel: jnp.ndarray, window: int) -> jnp.ndarray:
    """Edge values (B, N, K, C) -> offset bins (B, N, O, C):
    bins[b, n, o] = sum_k [sel[b,n,k] == o] * vals[b, n, k]."""
    oh = jax.nn.one_hot(sel, num_offsets(window), dtype=vals.dtype)
    return jnp.einsum("bnko,bnkc->bnoc", oh, vals,
                      preferred_element_type=jnp.float32).astype(vals.dtype)


def _roll_fold(v: jnp.ndarray, window: int) -> jnp.ndarray:
    """(rows, cells, 2w+1, tail) -> (rows, cells, tail): slot j's slice
    rolled back by (j - w) and summed — the transpose of _roll_stack."""
    w = window
    out = None
    for j in range(2 * w + 1):
        contrib = jnp.roll(v[:, :, j], j - w, axis=1)
        out = contrib if out is None else out + contrib
    return out


def offset_fold(bins: jnp.ndarray, cells: int, window: int) -> jnp.ndarray:
    """Offset bins (B, N, O, C) -> node sums (B, N, C):
    out[b, m] = sum_o bins[b, wrap(m - delta_o), o] — the exact transpose
    of window_stack, as 3 separable shift-add passes over shrinking arrays.
    """
    b, n, o, c = bins.shape
    s = 2 * window + 1
    # restore the (B, cx, ox, cy, oy, cz, oz, C) factorization
    v = bins.reshape(b, cells, cells, cells, s, s, s, c)
    v = v.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    # fold x: rows = B, rolled dim = cx, slots = ox, tail = rest
    v = v.reshape(b, cells, s, cells * s * cells * s * c)
    v = _roll_fold(v, window)                            # (B, cx, tail)
    # fold y
    v = v.reshape(b * cells, cells, s, cells * s * c)
    v = _roll_fold(v, window)
    # fold z
    v = v.reshape(b * cells * cells, cells, s, c)
    v = _roll_fold(v, window)
    return v.reshape(b, n, c)


def offset_scatter_add(vals: jnp.ndarray, sel: jnp.ndarray, cells: int,
                       window: int) -> jnp.ndarray:
    """vals (B, N, K, C), sel (B, N, K) -> (B, N, C) sums by neighbor id:
    out[b, m] = sum over edges (n, k) with neighbor(n, sel) == m."""
    return offset_fold(offset_bin(vals, sel, window), cells, window)
