"""Uniform Lagrangian grid generation.

The reference builds initial grid positions as
``einsum('ijkl->kjli', meshgrid(range(2, 130, 4)^3)).reshape(-1, 3)``
(reference utils.py:611-613, nn.py:183-189).  That einsum is exactly an
'ij'-indexed meshgrid stacked on the last axis: particle p = (i*C + j)*C + k
sits at (2+4i, 2+4j, 2+4k).  Generalized: C cells per side in a box of size
`box`, sites at cell centers spacing/2 + spacing*i with spacing = box/C.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def grid_positions_np(cells_per_side: int = 32, box: float = 128.0,
                      dtype=np.float32) -> np.ndarray:
    """(C^3, 3) cell-center grid, ordering identical to the reference."""
    spacing = box / cells_per_side
    axis = (spacing / 2.0 + spacing * np.arange(cells_per_side)).astype(dtype)
    g = np.stack(np.meshgrid(axis, axis, axis, indexing="ij"), axis=-1)
    return g.reshape(-1, 3)


def grid_positions(cells_per_side: int = 32, box: float = 128.0,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Device twin of :func:`grid_positions_np` (reference nn.py:192-197)."""
    spacing = box / cells_per_side
    axis = spacing / 2.0 + spacing * jnp.arange(cells_per_side, dtype=dtype)
    g = jnp.stack(jnp.meshgrid(axis, axis, axis, indexing="ij"), axis=-1)
    return g.reshape(-1, 3)
