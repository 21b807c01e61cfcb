"""Graph-model input featurization (edges from relative positions).

Reference twins: get_input_features_shift_inv_ZA (graph.py:289-343),
get_input_features_shift_inv (graph.py:346-364),
include_node_features (graph.py:245-275).

Dense-layout rework: with neighbor indices (b, N, K) and self at slot 0,
"scatter ZA displacement onto the diagonal self-edges" (graph.py:338-342)
is a plain slice assignment of slot 0.  Neighbor access goes through
ops.banded.neighbor_gather (MXU one-hot matmuls / Pallas on TPU) because
XLA's dynamic gather is pathologically slow on this hardware.

Deviation (a fix): relative positions use the min-image convention.  The
reference gathers *original* (unpadded) positions for ghost-remapped
neighbors (graph.py:333-336), so cross-boundary edges got ~box-size offsets
instead of the physical small separation; min-image gives the physically
meaningful shift-invariant feature everywhere.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from nbody_tpu.ops.banded import neighbor_gather
from nbody_tpu.physics.pbc import min_image_diff


def lattice_site_positions(idx: jnp.ndarray, cells: int, box: float,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Grid-site positions of particle ids, elementwise (NO gather).

    Particle p = (i*C + j)*C + k originates at cell center
    ((i, j, k) + 0.5) * spacing (reference utils.py:611-613; data/grid.py).
    idx (...,) int -> (..., 3) site coordinates in raw units.
    """
    spacing = box / cells
    x = (idx // (cells * cells)).astype(dtype)
    y = ((idx // cells) % cells).astype(dtype)
    z = (idx % cells).astype(dtype)
    return (jnp.stack([x, y, z], axis=-1) + 0.5) * spacing


def neighbor_positions(pos: jnp.ndarray, idx: jnp.ndarray, box: float,
                       band: Optional[int] = None, lattice=None,
                       masks=None) -> jnp.ndarray:
    """Gather neighbor positions (b, N, K, 3) with bf16-safe magnitudes.

    The TPU fast path rounds gathered VALUES to bf16; absolute coordinates
    (up to `box`) would pick up O(box * 2^-9) ~ 0.25-unit quantization —
    position-dependent noise in a shift-invariant model.  For grid-ordered
    cubes we instead gather the min-image DISPLACEMENT from each particle's
    origin site (magnitude ~ a grid spacing, so bf16 error ~1e-2 units) and
    reconstruct the neighbor position as site(idx) + displacement, where
    site(idx) is exact elementwise arithmetic.  Non-cube point sets fall
    back to an exact (f32) gather of the positions themselves.
    """
    n = pos.shape[-2]
    cells = int(round(n ** (1.0 / 3.0)))
    if cells ** 3 != n:
        return neighbor_gather(pos, idx, band, lattice, exact=True)
    sites = lattice_site_positions(
        jnp.arange(n, dtype=jnp.int32), cells, box, pos.dtype)
    disp = min_image_diff(pos, sites[None], box)          # small everywhere
    nbr_disp = neighbor_gather(disp, idx, band, lattice, masks=masks)
    return lattice_site_positions(idx, cells, box, pos.dtype)[..., :] + nbr_disp


def edge_features_za(pos: jnp.ndarray, idx: jnp.ndarray, za_disp: jnp.ndarray,
                     box: float, band: Optional[int] = None,
                     lattice=None, masks=None) -> jnp.ndarray:
    """Edges = neighbor relative positions, ZA displacement on the self-edge.

    pos (b, N, 3) raw positions; idx (b, N, K) with idx[..., 0] == self;
    za_disp (b, N, 3).  Returns (b, N, K, 3).
    """
    nbr = neighbor_positions(pos, idx, box, band, lattice, masks)
    edges = min_image_diff(nbr, pos[:, :, None, :], box)
    # self-edge (slot 0) carries the ZA displacement (graph.py:338-343)
    return edges.at[:, :, 0, :].set(za_disp)


def edge_features_with_nodes(pos: jnp.ndarray, idx: jnp.ndarray,
                             node_feats: jnp.ndarray, box: float,
                             band: Optional[int] = None,
                             za_disp: Optional[jnp.ndarray] = None,
                             redshift: Optional[jnp.ndarray] = None,
                             lattice=None, masks=None) -> jnp.ndarray:
    """Edges + broadcast node features (reference include_node_features).

    Returns (b, N, K, 3 + 2*C_node [+1]): [rel_pos, node[row], node[col], z?].
    With za_disp, the self-edge (slot 0) of the relative-position block
    carries the ZA displacement (graph.py:338-343), as in edge_features_za.
    Used by the velocity model (models/shiftinv.shiftinv_vel_model).
    """
    n = pos.shape[-2]
    cells = int(round(n ** (1.0 / 3.0)))
    if cells ** 3 == n:
        # one fused gather for [origin-site displacement, node features]
        # (both ride the same masks/band pass; the displacement trick is
        # neighbor_positions' bf16-safe form, reconstructed below)
        sites = lattice_site_positions(
            jnp.arange(n, dtype=jnp.int32), cells, box, pos.dtype)
        disp = min_image_diff(pos, sites[None], box)
        payload = jnp.concatenate([disp, node_feats], axis=-1)
        g = neighbor_gather(payload, idx, band, lattice, masks=masks)
        nbr = lattice_site_positions(idx, cells, box, pos.dtype) + g[..., :3]
        cols = g[..., 3:]
    else:
        nbr = neighbor_gather(pos, idx, band, lattice, exact=True)
        cols = neighbor_gather(node_feats, idx, band, lattice, masks=masks)
    edges = min_image_diff(nbr, pos[:, :, None, :], box)
    if za_disp is not None:
        edges = edges.at[:, :, 0, :].set(za_disp)
    rows = jnp.broadcast_to(node_feats[:, :, None, :],
                            edges.shape[:3] + (node_feats.shape[-1],))
    feats = [edges, rows, cols]
    if redshift is not None:
        z = jnp.broadcast_to(redshift.reshape(-1, 1, 1, 1),
                             edges.shape[:3] + (1,)).astype(edges.dtype)
        feats.append(z)
    return jnp.concatenate(feats, axis=-1)
