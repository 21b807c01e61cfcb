"""Training losses (reference nn.py:137-180)."""

from __future__ import annotations

import jax.numpy as jnp

from nbody_tpu.physics.pbc import min_image_sq_dist


def loss_za(predicted_error: jnp.ndarray, true_error: jnp.ndarray) -> jnp.ndarray:
    """MSE of predicted vs true ZA->FastPM displacement residual.

    mean over (batch, particles) of the squared error summed over xyz
    (reference loss_ZA, nn.py:151-166).
    """
    err = jnp.square(predicted_error - true_error)
    return jnp.mean(jnp.sum(err, axis=-1))


def pbc_loss(x_pred: jnp.ndarray, x_truth: jnp.ndarray, box: float = 1.0,
             scale_error: bool = True) -> jnp.ndarray:
    """MSE on min-image periodic distance of coordinates, optionally x1e5
    (reference pbc_loss, nn.py:137-148)."""
    d = min_image_sq_dist(x_pred[..., :3], x_truth[..., :3], box)
    err = jnp.mean(jnp.sum(d, axis=-1))
    return err * 1e5 if scale_error else err


def mse_za(fpm_displacement, za_displacement) -> jnp.ndarray:
    """ZA-approximation baseline error (reference mse_za, nn.py:177-180)."""
    err = jnp.square(fpm_displacement - za_displacement)
    return jnp.mean(jnp.sum(err, axis=-1))
