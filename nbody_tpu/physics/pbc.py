"""Periodic-boundary-condition math (pure jnp, fully unit-testable).

Reference twins:
  * periodic_boundary_dist (nn.py:123-134): elementwise min over image
    shifts {0, +1, -1} of squared differences.  Here generalized to the
    exact min-image convention for any box size: d - box*round(d/box).
    For coordinates in [0, box) the two are identical (tested).
  * get_readout (nn.py:107-119): wraps predicted coordinates back into the
    box with a single +-1 shift.  Here: true modular wrap (identical on the
    reference's domain, correct everywhere).
"""

from __future__ import annotations

import jax.numpy as jnp


def min_image_diff(a: jnp.ndarray, b: jnp.ndarray, box: float = 1.0) -> jnp.ndarray:
    """Signed displacement a - b under the min-image convention."""
    d = a - b
    return d - box * jnp.round(d / box)


def min_image_sq_dist(a: jnp.ndarray, b: jnp.ndarray, box: float = 1.0) -> jnp.ndarray:
    """Elementwise squared min-image difference (reference nn.py:123-134)."""
    d = min_image_diff(a, b, box)
    return d * d


def wrap_coords(x: jnp.ndarray, box: float = 1.0) -> jnp.ndarray:
    """Map coordinates into [0, box)."""
    return jnp.mod(x, box)


def readout_wrap(h_out: jnp.ndarray, box: float = 1.0) -> jnp.ndarray:
    """Wrap the first 3 channels into the box; pass through the rest.

    Reference get_readout (nn.py:107-119) uses sign algebra equivalent to a
    single +-box shift; modular wrap agrees on (-box, 2*box) and extends it.
    """
    coords = wrap_coords(h_out[..., :3], box)
    if h_out.shape[-1] > 3:
        return jnp.concatenate([coords, h_out[..., 3:]], axis=-1)
    return coords
