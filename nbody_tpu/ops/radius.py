"""Radius-neighborhood graphs with static capacity.

Reference twin: the radius-graph ops (graph.py:716-794) — sklearn
radius_neighbors_graph wrapped into degree-normalized COO matrices.  Note
the reference path crashes if invoked: `get_radNeighbor_coo` is called at
graph.py:767,774 but defined nowhere (SURVEY.md C16).  This implementation
both fixes and TPU-fies it:

  * on-device min-image pairwise distances (no sklearn, no ghost padding);
  * static shapes: each particle gets `max_neighbors` slots filled with its
    nearest in-radius neighbors plus a validity mask (XLA needs static
    capacity; overflowing neighborhoods keep the nearest ones);
  * degree-normalized edge weights (1/num_neighbors per row), matching the
    reference's COO data normalization (graph.py:739-761).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from nbody_tpu.ops.knn import pairwise_min_image_sq_dist


@functools.partial(jax.jit, static_argnames=("max_neighbors", "include_self",
                                             "row_chunk"))
def radius_neighbors(pos: jnp.ndarray, radius: float, max_neighbors: int,
                     box: float = 1.0, include_self: bool = True,
                     row_chunk: int = 256):
    """pos (N, 3) -> (idx (N, M) int32, mask (N, M) float32, weights (N, M)).

    idx holds each particle's nearest in-radius neighbors (self first when
    include_self); mask marks live slots; weights are mask / degree — the
    degree-normalized data the reference fed its graph conv.
    """
    n = pos.shape[0]
    m = max_neighbors
    chunk = min(row_chunk, n)
    pad = (-n) % chunk
    pos_p = jnp.pad(pos, ((0, pad), (0, 0))) if pad else pos
    num_chunks = (n + pad) // chunk
    rows = pos_p.reshape(num_chunks, chunk, 3)
    row_ids = jnp.arange(num_chunks * chunk, dtype=jnp.int32).reshape(
        num_chunks, chunk)
    r2 = radius * radius

    def body(carry, xs):
        pos_chunk, ids = xs
        d2 = pairwise_min_image_sq_dist(pos_chunk, pos, box)
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        is_self = col == ids[:, None]
        d2 = jnp.where(is_self, -1.0 if include_self else jnp.inf, d2)
        neg, idx = jax.lax.top_k(-d2, m)
        mask = ((-neg) <= r2).astype(jnp.float32)
        return carry, (idx.astype(jnp.int32), mask)

    _, (idx, mask) = jax.lax.scan(body, None, (rows, row_ids))
    idx = idx.reshape(-1, m)[:n]
    mask = mask.reshape(-1, m)[:n]
    deg = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return idx, mask, mask / deg


def radius_neighbors_batch(pos: jnp.ndarray, radius: float, max_neighbors: int,
                           box: float = 1.0, include_self: bool = True):
    """Batched: pos (b, N, 3) -> (idx, mask, weights) each (b, N, M)."""
    fn = functools.partial(radius_neighbors, radius=radius,
                           max_neighbors=max_neighbors, box=box,
                           include_self=include_self)
    return jax.vmap(lambda p: fn(p))(pos)
