"""Shift-invariant graph network, full 15-operator equivariant basis.

Reference twins: shift_inv_15op_layer (graph.py:20-200),
network_func_15op_shift_inv_za (graph.py:202-215),
model_func_15op_shift_inv_za (graph.py:218-229).
Basis: the 15 linear equivariant operators on edge-valued functions of a
graph (openreview Syx72jC9tm), cited at reference graph.py:24.

The reference operates on a *symmetrized* adjacency whose nonzero count S
varies per sample (graph.py:28-37) — dynamic shapes, anathema to XLA.  The
adj-dict builder (row/col/all/tra/dia/dal index vectors) moreover does not
exist anywhere in the reference repo; the 15-op path was never runnable.
TPU-native rework with fully static shapes:

  * Static edge capacity E = 2*N*K per sample:
      block A (slots 0..NK-1):   directed kNN edges (n -> idx[n,k]);
      block B (slots NK..2NK-1): reversed edges (idx[n,k] -> n), with a
      validity mask that disables slots whose reverse already exists in
      block A — the masked union IS the symmetrized adjacency.
  * The transpose operator becomes a precomputed gather permutation `tra`;
    the diagonal lives at slots n*K (self-neighbor guaranteed at slot 0 by
    ops.knn).  Pools are mask-weighted segment means; "pool all"/"pool
    diagonal" are masked global means.

Everything is (vmapped) dense gathers, scatters and MXU matmuls.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from nbody_tpu.models.base import init_network_params
from nbody_tpu.physics.pbc import min_image_diff


class SymGraph(NamedTuple):
    """Static-capacity symmetrized graph, per sample (leading batch dim ok)."""
    row: jnp.ndarray     # (E,) int32 row (particle) id of each edge slot
    col: jnp.ndarray     # (E,) int32 col (neighbor) id
    tra: jnp.ndarray     # (E,) int32 slot index of the transposed edge
    valid: jnp.ndarray   # (E,) float mask: 1 for live slots
    dia: jnp.ndarray     # (N,) int32 slot index of each particle's self-edge


def build_sym_graph(idx: jnp.ndarray) -> SymGraph:
    """idx (N, K) neighbor ids with idx[:, 0] == self -> SymGraph with E = 2NK."""
    n, k = idx.shape
    nk = n * k
    particles = jnp.arange(n, dtype=jnp.int32)
    row_a = jnp.repeat(particles, k)                      # (NK,)
    col_a = idx.reshape(-1).astype(jnp.int32)             # (NK,)

    # does the reverse edge (idx[n,k] -> n) already exist in block A?
    nbr_nbrs = idx[idx]                                   # (N, K, K)
    hit = nbr_nbrs == particles[:, None, None]            # (N, K, K)
    rev_exists = jnp.any(hit, axis=2).reshape(-1)         # (NK,)
    rev_pos = jnp.argmax(hit, axis=2).reshape(-1).astype(jnp.int32)

    slots_a = jnp.arange(nk, dtype=jnp.int32)
    tra_a = jnp.where(rev_exists, col_a * k + rev_pos, nk + slots_a)
    tra_b = slots_a
    valid = jnp.concatenate([jnp.ones(nk, jnp.float32),
                             (~rev_exists).astype(jnp.float32)])
    return SymGraph(
        row=jnp.concatenate([row_a, col_a]),
        col=jnp.concatenate([col_a, row_a]),
        tra=jnp.concatenate([tra_a, tra_b]),
        valid=valid,
        dia=particles * k)


def sym_edge_features_za(pos: jnp.ndarray, idx: jnp.ndarray, za_disp: jnp.ndarray,
                         box: float) -> jnp.ndarray:
    """(N, 3) pos -> (E, 3) edge features on the symmetrized graph.

    Block A: min-image relative positions, ZA displacement on the self-edge
    (reference graph.py:289-343 semantics); block B: the negated relative
    positions (feature of the reversed edge).
    """
    nbr = pos[idx]                                        # (N, K, 3)
    edges = min_image_diff(nbr, pos[:, None, :], box)     # (N, K, 3)
    edges_a = edges.at[:, 0, :].set(za_disp)
    edges_b = (-edges).at[:, 0, :].set(jnp.zeros_like(za_disp))
    return jnp.concatenate([edges_a.reshape(-1, 3), edges_b.reshape(-1, 3)])


def init_shiftinv15_params(key: jax.Array, channels: Sequence[int],
                           dtype=jnp.float32):
    """Per layer: W (15, k_in, k_out), B (2, k_out): [diag bias, global bias]
    (reference graph.py:125-128, utils.py:179-180)."""
    return init_network_params(key, channels, num_weights=15, num_biases=2,
                               dtype=dtype)


def _seg_mean(h: jnp.ndarray, ids: jnp.ndarray, w: jnp.ndarray,
              num: int) -> jnp.ndarray:
    """Mask-weighted segment mean: (E, C) grouped by ids (E,) -> (num, C)."""
    sums = jnp.zeros((num, h.shape[-1]), h.dtype).at[ids].add(h * w[:, None])
    cnt = jnp.zeros((num,), h.dtype).at[ids].add(w)
    return sums / jnp.maximum(cnt, 1.0)[:, None]


def _shift_inv_15op_single(h: jnp.ndarray, g: SymGraph, w: jnp.ndarray,
                           b: jnp.ndarray, n: int, is_last: bool) -> jnp.ndarray:
    """One sample. h (E, C) masked edge features -> (E, q) or (N, q)."""
    dt = h.dtype
    e = h.shape[0]
    q = w.shape[-1]

    def mm(x, wi):
        return jnp.dot(x, wi, preferred_element_type=dt)

    def at_dia(vals):   # (N, q) -> scattered (E, q) on the diagonal slots
        return jnp.zeros((e, q), dt).at[g.dia].set(vals)

    h_d = h[g.dia]                                   # (N, C) diagonal
    h_r = _seg_mean(h, g.col, g.valid, n)            # pool rows   (N, C)
    h_c = _seg_mean(h, g.row, g.valid, n)            # pool cols   (N, C)
    h_a = jnp.sum(h * g.valid[:, None], 0) / jnp.maximum(jnp.sum(g.valid), 1.0)
    h_p = jnp.mean(h_d, axis=0)                      # pool diagonal (C,)

    out = mm(h, w[0])                                # 1  identity
    out += mm(h[g.tra], w[1])                        # 2  transpose
    out += at_dia(mm(h_d, w[2]))                     # 3  diag -> diag
    out += mm(h_r, w[3])[g.col]                      # 4  pool rows -> rows
    out += mm(h_r, w[4])[g.row]                      # 5  pool rows -> cols
    out += at_dia(mm(h_r, w[5]))                     # 6  pool rows -> diag
    out += mm(h_c, w[6])[g.row]                      # 7  pool cols -> cols
    out += mm(h_c, w[7])[g.col]                      # 8  pool cols -> rows
    out += at_dia(mm(h_c, w[8]))                     # 9  pool cols -> diag
    out += mm(h_a[None], w[9])[0][None, :]           # 10 pool all -> all
    out += at_dia(jnp.broadcast_to(mm(h_a[None], w[10])[0], (n, q)))  # 11
    out += mm(h_p[None], w[11])[0][None, :]          # 12 pool diag -> all
    out += at_dia(jnp.broadcast_to(mm(h_p[None], w[12])[0], (n, q)))  # 13
    out += mm(h_d, w[13])[g.col]                     # 14 diag -> rows
    out += mm(h_d, w[14])[g.row]                     # 15 diag -> cols
    out += at_dia(jnp.broadcast_to(b[0], (n, q)))    # diagonal bias
    out += b[1]                                      # global bias
    out = out * g.valid[:, None]
    if is_last:
        return _seg_mean(out, g.row, g.valid, n)     # (N, q)
    return out


def shift_inv_15op_layer(h: jnp.ndarray, graph: SymGraph,
                         layer_params: Dict[str, jnp.ndarray],
                         is_last: bool = False) -> jnp.ndarray:
    """Batched layer: h (b, E, C), graph leaves (b, ...) -> (b, E, q)/(b, N, q)."""
    n = graph.dia.shape[-1]
    fn = lambda hh, gg: _shift_inv_15op_single(
        hh, gg, layer_params["W"], layer_params["B"], n, is_last)
    return jax.vmap(fn)(h, graph)


def shiftinv15_network(params: List[Dict[str, jnp.ndarray]], edges: jnp.ndarray,
                       graph: SymGraph, activation=jax.nn.relu) -> jnp.ndarray:
    """Layer stack (reference network_func_15op_shift_inv_za)."""
    h = edges
    num_layers = len(params)
    for i, layer_params in enumerate(params):
        is_last = i == num_layers - 1
        h = shift_inv_15op_layer(h, graph, layer_params, is_last=is_last)
        if not is_last:
            h = activation(h)
    return h


def shiftinv15_model(params, pos: jnp.ndarray, za_disp: jnp.ndarray,
                     idx: jnp.ndarray, box: float,
                     activation=jax.nn.relu) -> jnp.ndarray:
    """Full model: symmetrized graph + features + network.

    pos (b, N, 3), za_disp (b, N, 3), idx (b, N, K) with self at slot 0.
    """
    graph = jax.vmap(build_sym_graph)(idx)
    feats = jax.vmap(lambda p, i, z: sym_edge_features_za(p, i, z, box))(
        pos, idx, za_disp)
    feats = feats * graph.valid[..., None]
    return shiftinv15_network(params, feats.astype(pos.dtype), graph, activation)
