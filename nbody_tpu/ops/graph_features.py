"""Graph-model input featurization (edges from relative positions).

Reference twins: get_input_features_shift_inv_ZA (graph.py:289-343),
get_input_features_shift_inv (graph.py:346-364),
include_node_features (graph.py:245-275).

Dense-layout rework: with neighbor indices (b, N, K) and self at slot 0,
"scatter ZA displacement onto the diagonal self-edges" (graph.py:338-342)
is a plain slice assignment of slot 0.

Deviation (a fix): relative positions use the min-image convention.  The
reference gathers *original* (unpadded) positions for ghost-remapped
neighbors (graph.py:333-336), so cross-boundary edges got ~box-size offsets
instead of the physical small separation; min-image gives the physically
meaningful shift-invariant feature everywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nbody_tpu.physics.pbc import min_image_diff


def edge_features_za(pos: jnp.ndarray, idx: jnp.ndarray,
                     za_disp: jnp.ndarray, box: float) -> jnp.ndarray:
    """Edges = neighbor relative positions, ZA displacement on the self-edge.

    pos (b, N, 3) raw positions; idx (b, N, K) with idx[..., 0] == self;
    za_disp (b, N, 3).  Returns (b, N, K, 3).
    """
    nbr = _gather_neighbors(pos, idx)
    edges = min_image_diff(nbr, pos[:, :, None, :], box)
    # self-edge (slot 0) carries the ZA displacement (graph.py:338-343)
    return edges.at[:, :, 0, :].set(za_disp)


def _gather_neighbors(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values (b, N, C), idx (b, N, K) -> (b, N, K, C)."""
    return jax.vmap(lambda v, i: v[i])(values, idx)


def gather_neighbors(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Public alias of the neighbor gather."""
    return _gather_neighbors(values, idx)


def edge_features_with_nodes(pos: jnp.ndarray, idx: jnp.ndarray,
                             node_feats: jnp.ndarray, box: float,
                             redshift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Edges + broadcast node features (reference include_node_features).

    Returns (b, N, K, 3 + 2*C_node [+1]): [rel_pos, node[row], node[col], z?].
    """
    edges = min_image_diff(_gather_neighbors(pos, idx), pos[:, :, None, :], box)
    k = idx.shape[-1]
    rows = jnp.broadcast_to(node_feats[:, :, None, :], edges.shape[:3] + (node_feats.shape[-1],))
    cols = _gather_neighbors(node_feats, idx)
    feats = [edges, rows, cols]
    if redshift is not None:
        z = jnp.broadcast_to(redshift.reshape(-1, 1, 1, 1),
                             edges.shape[:3] + (1,)).astype(edges.dtype)
        feats.append(z)
    return jnp.concatenate(feats, axis=-1)
