import numpy as np
import jax.numpy as jnp

from nbody_tpu.data.grid import grid_positions, grid_positions_np


def _reference_grid_oracle():
    """Literal transcription of the reference construction
    (utils.py:611-613): einsum('ijkl->kjli', meshgrid(range(2,130,4)^3))."""
    mg = range(2, 130, 4)
    q = np.einsum("ijkl->kjli", np.array(np.meshgrid(mg, mg, mg)))
    return q.reshape(-1, 3)


def test_grid_matches_reference_construction():
    ours = grid_positions_np(32, box=128.0)
    oracle = _reference_grid_oracle()
    np.testing.assert_array_equal(ours, oracle.astype(np.float32))


def test_grid_device_twin_matches_host():
    np.testing.assert_allclose(np.asarray(grid_positions(8, box=32.0)),
                               grid_positions_np(8, box=32.0), rtol=1e-6)


def test_grid_scales():
    g = grid_positions_np(4, box=16.0)
    assert g.shape == (64, 3)
    assert g.min() == 2.0 and g.max() == 14.0
    # ordering: last axis varies fastest
    np.testing.assert_array_equal(g[0], [2.0, 2.0, 2.0])
    np.testing.assert_array_equal(g[1], [2.0, 2.0, 6.0])
    np.testing.assert_array_equal(g[4], [2.0, 6.0, 2.0])
    np.testing.assert_array_equal(g[16], [6.0, 2.0, 2.0])
