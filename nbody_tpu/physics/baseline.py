"""Linear-velocity comparison baseline (reference plot_eval.py:85-96).

The reference evaluates models against a trivial predictor: advance
positions by a single least-squares-fit timestep of the input velocity.
"""

from __future__ import annotations

import jax.numpy as jnp


def calculate_timestep(x_in: jnp.ndarray, x_true: jnp.ndarray) -> jnp.ndarray:
    """Least-squares timestep fit (reference plot_eval.py:85-88).

    x_in, x_true: (N, 6) [pos(3), vel(3)].  Solves ||vel * t - dpos|| min.
    """
    diff = (x_true[:, :3] - x_in[:, :3]).reshape(-1)
    vel = x_in[:, 3:].reshape(-1, 1)
    t, *_ = jnp.linalg.lstsq(vel, diff)
    return t[0]


def linear_velocity_pred(x_in: jnp.ndarray, timestep: jnp.ndarray) -> jnp.ndarray:
    """pos + t * vel (reference get_linearVel_pred, plot_eval.py:90-93)."""
    return x_in[:, :3] + timestep * x_in[:, 3:]


def l2_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-particle L2 distance (reference l2_dist, plot_eval.py:95-96)."""
    return jnp.sqrt(jnp.sum(jnp.square(a - b), axis=-1))
