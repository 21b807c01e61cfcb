import numpy as np
import jax.numpy as jnp

from nbody_tpu.physics.pbc import (
    min_image_diff, min_image_sq_dist, readout_wrap, wrap_coords)


def _reference_pbc_sq_dist(readout, truth):
    """Oracle: elementwise min of the three squared shifted differences
    (reference periodic_boundary_dist, nn.py:123-134); box = 1."""
    d1 = np.square(readout - truth)
    d2 = np.square(readout - (1 + truth))
    d3 = np.square((1 + readout) - truth)
    return np.minimum(np.minimum(d1, d2), d3)


def test_min_image_matches_reference_three_candidate():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    ours = np.asarray(min_image_sq_dist(jnp.asarray(a), jnp.asarray(b), box=1.0))
    np.testing.assert_allclose(ours, _reference_pbc_sq_dist(a, b), atol=1e-6)


def test_min_image_general_box():
    d = np.asarray(min_image_diff(jnp.asarray([127.0]), jnp.asarray([1.0]), box=128.0))
    np.testing.assert_allclose(d, [-2.0], atol=1e-6)


def test_min_image_bounded_by_half_box():
    rng = np.random.default_rng(1)
    a = rng.uniform(-5, 5, (100,)).astype(np.float32)
    b = rng.uniform(-5, 5, (100,)).astype(np.float32)
    d = np.asarray(min_image_diff(jnp.asarray(a), jnp.asarray(b), box=1.0))
    assert np.all(np.abs(d) <= 0.5 + 1e-6)


def test_wrap_and_readout():
    x = jnp.asarray([[-0.25, 0.5, 1.25]])
    np.testing.assert_allclose(np.asarray(wrap_coords(x)), [[0.75, 0.5, 0.25]],
                               atol=1e-6)
    # readout passes non-coordinate channels through (reference nn.py:117-118)
    h = jnp.asarray([[[1.25, -0.5, 0.5, 7.0, 8.0]]])
    out = np.asarray(readout_wrap(h))
    np.testing.assert_allclose(out, [[[0.25, 0.5, 0.5, 7.0, 8.0]]], atol=1e-6)
