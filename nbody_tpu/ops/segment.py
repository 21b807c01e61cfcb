"""Segment pooling over dense neighbor graphs.

Replaces tf.unsorted_segment_mean + gather re-broadcast
(reference graph.py:64-106, 367-391) on the dense (N, K) representation:

  * pooling by ROW id groups the K edges of each particle — on the dense
    layout this is a free mean over the K axis (no scatter at all);
  * pooling by COLUMN id (each particle as a *neighbor*) is irregular and
    uses XLA scatter-add, matching TF's unsorted_segment_mean semantics
    (empty segments -> 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_mean(values: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Mean of `values` (E, C) grouped by `segment_ids` (E,) -> (num_segments, C).

    Matches tf.unsorted_segment_mean: empty segments yield 0.
    """
    sums = jnp.zeros((num_segments, values.shape[-1]), values.dtype
                     ).at[segment_ids].add(values)
    cnt = jnp.zeros((num_segments,), values.dtype).at[segment_ids].add(1.0)
    return sums / jnp.maximum(cnt, 1.0)[:, None]


def segment_mean_broadcast(values: jnp.ndarray, segment_ids: jnp.ndarray,
                           num_segments: int) -> jnp.ndarray:
    """segment_mean followed by gather back to edge slots (E, C) -> (E, C).

    Reference twin: shift_inv_conv with broadcast=True (graph.py:367-391).
    """
    return segment_mean(values, segment_ids, num_segments)[segment_ids]


def col_pool_mean(edge_feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Column pooling on a dense graph, batched.

    edge_feats (b, N, K, C), idx (b, N, K) neighbor ids ->
    per-particle means over the edges *pointing at* each particle (b, N, C).
    """
    b, n, k, c = edge_feats.shape

    def one(feats, ids):
        return segment_mean(feats.reshape(n * k, c), ids.reshape(n * k), n)

    return jax.vmap(one)(edge_feats, idx)
