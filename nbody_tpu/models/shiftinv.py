"""Shift-invariant sparse graph network, 4-operator equivariant basis.

Reference twins: shift_inv_layer / shift_inv_conv (graph.py:367-456),
network_func_shift_inv_za (graph.py:463-476),
model_func_shift_inv_za (graph.py:479-515).

Dense-layout rework (SURVEY.md §7 step 5): edge features live in a regular
(b, N, K, C) array over the kNN graph, with COO row/col/cube segment ids
replaced by array structure:

  op 1  identity            H @ W1                       (MXU matmul)
  op 2  pool rows (by col)  scatter-mean by neighbor id, then @ W2, gather
  op 3  pool cols (by row)  mean over the K axis (free), then @ W3
  op 4  pool cube           mean over (N, K) (free), then @ W4

The reference matmuls *after* re-broadcasting pooled values over all
b*N*K edges; here pooled tensors are multiplied at their pooled size
(b*N or b rows) before broadcasting — mathematically identical (the pool
and the matmul are both linear), with K..N*K times fewer matmul FLOPs.

Last layer pools edges back to particles: mean over K -> (b, N, q)
(reference graph.py:454-455).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from nbody_tpu.models.base import init_network_params
from nbody_tpu.ops.banded import (neighbor_counts, neighbor_gather,
                                  neighbor_segment_mean)
from nbody_tpu.ops.graph_features import edge_features_za


def init_shiftinv_params(key: jax.Array, channels: Sequence[int], dtype=jnp.float32):
    """Per layer: W (4, k_in, k_out), B (1, k_out) (reference utils.py:179-180)."""
    return init_network_params(key, channels, num_weights=4, num_biases=1,
                               dtype=dtype)


def shift_inv_layer(h: jnp.ndarray, idx: jnp.ndarray,
                    layer_params: Dict[str, jnp.ndarray],
                    is_last: bool = False,
                    band: Optional[int] = None,
                    counts: Optional[jnp.ndarray] = None,
                    lattice=None, masks=None) -> jnp.ndarray:
    """One 4-op layer. h (b, N, K, C) edge features, idx (b, N, K) neighbor ids.

    counts: precomputed in-degrees (ops.banded.neighbor_counts) — shared by
    every layer since they depend only on idx.
    Returns (b, N, K, q), or (b, N, q) if is_last.
    """
    w = layer_params["W"]          # (4, C, q)
    bias = layer_params["B"][0]    # (q,)
    dt = h.dtype

    # op 2 setup: pool rows (segment = column/neighbor id), matmul,
    # re-broadcast.  Pool, matmul, and broadcast are all linear, so place
    # the matmul where the expensive banded scatter AND gather both run at
    # width min(C_in, q) — exact by linearity, ~30% fewer banded FLOPs
    # across the default channel stack:
    #   q <  C: matmul at edge level first -> scatter & gather at width q
    #   q >= C: scatter at C, gather at C, matmul per edge afterwards
    c_in, q = w.shape[1], w.shape[2]
    if q < c_in:
        # ops 1+2 share the edge-level matmul operand: one fused einsum
        # against [W1|W2] reads the big edge tensor ONCE (two separate
        # dots would stream it twice — per-column results are identical)
        h12 = jnp.einsum("bnkc,cq->bnkq", h,
                         jnp.concatenate([w[0], w[1]], axis=1),
                         preferred_element_type=dt)
        h1, hw = h12[..., :q], h12[..., q:]
        pooled_rows = neighbor_segment_mean(hw, idx, band, counts, lattice,
                                            masks)
        h2 = neighbor_gather(pooled_rows, idx, band, lattice,
                             masks=masks)                        # (b, N, K, q)
    else:
        h1 = jnp.einsum("bnkc,cq->bnkq", h, w[0], preferred_element_type=dt)
        pooled_rows = neighbor_segment_mean(h, idx, band, counts, lattice,
                                            masks)
        h2 = jnp.einsum("bnkc,cq->bnkq",
                        neighbor_gather(pooled_rows, idx, band, lattice,
                                        masks=masks), w[1],
                        preferred_element_type=dt)

    # op 3: pool cols (segment = row id) == mean over K, broadcast over K
    pooled_cols = jnp.mean(h, axis=2)                            # (b, N, C)
    h3 = jnp.einsum("bnc,cq->bnq", pooled_cols, w[2],
                    preferred_element_type=dt)[:, :, None, :]

    # op 4: pool cube == mean over (N, K), broadcast everywhere.  Every row
    # has exactly K slots, so the cube mean is the mean of the K-means —
    # reusing pooled_cols skips another full edge-tensor read
    pooled_all = jnp.mean(pooled_cols, axis=1)                   # (b, C)
    h4 = jnp.einsum("bc,cq->bq", pooled_all, w[3],
                    preferred_element_type=dt)[:, None, None, :]

    h_out = h1 + h2 + h3 + h4 + bias
    if is_last:
        return jnp.mean(h_out, axis=2)                           # pool rows -> (b, N, q)
    return h_out


def shiftinv_network(params: List[Dict[str, jnp.ndarray]], edges: jnp.ndarray,
                     idx: jnp.ndarray, activation=jax.nn.relu,
                     band: Optional[int] = None,
                     remat: bool = False,
                     lattice=None, masks=None) -> jnp.ndarray:
    """Layer stack (reference network_func_shift_inv_za, graph.py:463-476).

    remat=True rematerializes each layer in the backward pass
    (jax.checkpoint): edge activations are (b, N, K, C) — at 64^3 cubes the
    memory saving is what makes training fit (SURVEY.md §7 hard parts)."""
    h = edges
    counts = neighbor_counts(idx, band, edges.dtype, lattice, masks)  # shared
    num_layers = len(params)
    for i, layer_params in enumerate(params):
        is_last = i == num_layers - 1
        fn = functools.partial(shift_inv_layer, is_last=is_last, band=band,
                               lattice=lattice)
        if remat:
            fn = jax.checkpoint(fn)
        h = fn(h, idx, layer_params, counts=counts, masks=masks)
        if not is_last:
            h = activation(h)
    return h


def _shift_inv_layer_blocks(hB: jnp.ndarray, layer_params, masks, cells,
                            window, counts, is_last: bool, core=None,
                            self_free: bool = False):
    """4-op layer on BLOCK-MAJOR edges hB (b, NB, R, K, C) via the shared
    masks (ops/blocked).  Semantically identical to shift_inv_layer; keeping
    the big edge tensors block-major drops two full-tensor reorders per
    neighbor op (the node-field hops through cube layout are K times
    smaller)."""
    from nbody_tpu.ops.blocked import (masked_gather_blocks,
                                       masked_scatter_add_blocks)
    w = layer_params["W"]
    bias = layer_params["B"][0]
    dt = hB.dtype
    c_in, q = w.shape[1], w.shape[2]

    def seg_mean(e):
        s = masked_scatter_add_blocks(e, masks, cells, window, core=core,
                                      self_slot0=self_free)
        return s / jnp.maximum(counts, 1.0)[..., None]

    if q < c_in:
        # ops 1+2 fused against [W1|W2]: one read of the edge tensor
        h12 = jnp.einsum("bnrkc,cq->bnrkq", hB,
                         jnp.concatenate([w[0], w[1]], axis=1),
                         preferred_element_type=dt)
        h1, hw = h12[..., :q], h12[..., q:]
        h2 = masked_gather_blocks(seg_mean(hw), masks, cells, window,
                                  core=core, self_slot0=self_free)
    else:
        h1 = jnp.einsum("bnrkc,cq->bnrkq", hB, w[0],
                        preferred_element_type=dt)
        pooled = masked_gather_blocks(seg_mean(hB), masks, cells, window,
                                      core=core, self_slot0=self_free)
        h2 = jnp.einsum("bnrkc,cq->bnrkq", pooled, w[1],
                        preferred_element_type=dt)

    pooled_cols = jnp.mean(hB, axis=3)                           # (b, NB, R, C)
    h3 = jnp.einsum("bnrc,cq->bnrq", pooled_cols, w[2],
                    preferred_element_type=dt)[:, :, :, None, :]
    # cube mean == mean of the K-means (every row has K slots): reuse
    # pooled_cols instead of re-reading the edge tensor
    pooled_all = jnp.mean(pooled_cols, axis=(1, 2))              # (b, C)
    h4 = jnp.einsum("bc,cq->bq", pooled_all, w[3],
                    preferred_element_type=dt)[:, None, None, None, :]

    h_out = h1 + h2 + h3 + h4 + bias
    if is_last:
        return jnp.mean(h_out, axis=3)                           # (b, NB, R, q)
    return h_out


def _shiftinv_network_blocks(params, edges: jnp.ndarray, masks, lattice,
                             activation, remat: bool) -> jnp.ndarray:
    """Masked-path network: edges enter/leave in cube layout exactly once."""
    from nbody_tpu.ops.blocked import (edges_cube_to_blocks, lattice_core,
                                       lattice_self_free,
                                       nodes_blocks_to_cube,
                                       masked_scatter_add_blocks)
    cells, window = lattice[0], lattice[1]
    core = lattice_core(lattice)
    self_free = lattice_self_free(lattice)
    b, n, k, _ = edges.shape
    hB = edges_cube_to_blocks(edges, cells, core=core)
    ones = jnp.ones(hB.shape[:4] + (1,), edges.dtype)
    counts = jax.lax.stop_gradient(
        masked_scatter_add_blocks(ones, masks, cells, window,
                                  core=core, self_slot0=self_free))[..., 0]
    num_layers = len(params)
    for i, layer_params in enumerate(params):
        is_last = i == num_layers - 1
        fn = functools.partial(_shift_inv_layer_blocks, masks=masks,
                               cells=cells, window=window, counts=counts,
                               is_last=is_last, core=core,
                               self_free=self_free)
        if remat:
            fn = jax.checkpoint(fn)
        hB = fn(hB, layer_params)
        if not is_last:
            hB = activation(hB)
    return nodes_blocks_to_cube(hB, cells, core=core)            # (b, N, q)


def shiftinv_model(params, pos: jnp.ndarray, za_disp: jnp.ndarray,
                   idx: jnp.ndarray, box: float,
                   activation=jax.nn.relu,
                   band: Optional[int] = None,
                   remat: bool = False,
                   lattice=None, masks=None) -> jnp.ndarray:
    """Full model: featurize + network (reference model_func_shift_inv_za).

    pos (b, N, 3) raw positions (grid + ZA), idx (b, N, K) with self at
    slot 0, za_disp (b, N, 3).  lattice=(cells, window) routes neighbor
    access through the 3D-block kernels.  Returns (b, N, 3..q).
    """
    edges = edge_features_za(pos, idx, za_disp, box, band, lattice, masks)
    if masks is not None and lattice is not None:
        return _shiftinv_network_blocks(params, edges, masks, lattice,
                                        activation, remat)
    return shiftinv_network(params, edges, idx, activation, band, remat,
                            lattice, masks)


def init_shiftinv_vel_params(key: jax.Array, channels: Sequence[int],
                             dtype=jnp.float32):
    """Velocity variant: 4-op layers + two learnable output scalars
    (loc, vel), init 0.002 like the reference's unused scalar params
    (utils.py:182, 308-318; the commented velocity model graph.py:517-567
    consumed them as loc_scalar/vel_scalar)."""
    from nbody_tpu import config as C
    return {"layers": init_network_params(key, channels, num_weights=4,
                                          num_biases=1, dtype=dtype),
            "T": jnp.full((2,), C.SCALAR_INIT, dtype)}


def shiftinv_vel_model(params, pos: jnp.ndarray, za_disp: jnp.ndarray,
                       vel: jnp.ndarray, idx: jnp.ndarray, box: float,
                       activation=jax.nn.relu,
                       band: Optional[int] = None,
                       remat: bool = False,
                       lattice=None, masks=None) -> jnp.ndarray:
    """Velocity-aware graph model (the reference's commented
    _model_func_shift_inv, graph.py:517-567, made real).

    Edge features: [rel pos w/ ZA on the self-edge (3), vel at row (3),
    vel at col (3)] (reference include_node_features, graph.py:245-275).
    Output (b, N, 6): displacement and velocity residuals, each scaled by a
    learnable scalar (loc_scalar, vel_scalar).
    """
    from nbody_tpu.ops.graph_features import edge_features_with_nodes
    edges = edge_features_with_nodes(pos, idx, vel, box, band,
                                     za_disp=za_disp, lattice=lattice,
                                     masks=masks)  # (b,N,K,9)
    if masks is not None and lattice is not None:
        net = _shiftinv_network_blocks(params["layers"], edges, masks,
                                       lattice, activation, remat)
    else:
        net = shiftinv_network(params["layers"], edges, idx, activation, band,
                               remat, lattice, masks)
    t = params["T"]
    scale = jnp.concatenate([jnp.full((3,), 1.0, net.dtype) * t[0],
                             jnp.full((net.shape[-1] - 3,), 1.0, net.dtype) * t[1]])
    return net * scale
