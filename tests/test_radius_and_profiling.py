import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.ops.radius import radius_neighbors, radius_neighbors_batch
from nbody_tpu.utils.profiling import StepTimer, fetch, timed


def _oracle_radius(pos, r, include_self=True):
    d = pos[:, None, :] - pos[None, :, :]
    d -= np.round(d)
    d2 = (d * d).sum(-1)
    n = len(pos)
    if not include_self:
        d2[np.arange(n), np.arange(n)] = np.inf
    return [set(np.where(d2[i] <= r * r)[0].tolist()) for i in range(n)]


def test_radius_neighbors_match_oracle():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    r = 0.2
    idx, mask, w = radius_neighbors(jnp.asarray(pos), r, max_neighbors=32)
    oracle = _oracle_radius(pos, r)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for i in range(100):
        live = set(idx[i][mask[i] > 0].tolist())
        assert live == oracle[i], f"row {i}"
    # weights: 1/deg on live slots, rows sum to 1
    np.testing.assert_allclose(np.asarray(w).sum(1), 1.0, atol=1e-5)


def test_radius_capacity_overflow_keeps_nearest():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    idx, mask, _ = radius_neighbors(jnp.asarray(pos), radius=1.0, max_neighbors=4)
    # radius 1.0 covers everything -> capacity-limited to the 4 nearest
    assert np.asarray(mask).sum() == 50 * 4
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(50))


def test_radius_batch():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 1, (2, 40, 3)).astype(np.float32)
    idx, mask, w = radius_neighbors_batch(jnp.asarray(pos), 0.3, 16)
    assert idx.shape == (2, 40, 16) and mask.shape == w.shape == idx.shape


def test_step_timer():
    timer = StepTimer(particles_per_step=100)
    timer.start()
    for _ in range(3):
        x = jnp.ones((8, 8)) * 2
        timer.tick(x)
    s = timer.summary()
    assert s["steps"] == 3 and s["steps_per_sec"] > 0
    assert abs(s["particle_steps_per_sec"] - 100 * s["steps_per_sec"]) < 1e-6


def test_timed_and_fetch():
    out, sec = timed(lambda: jnp.arange(10) * 2)
    assert sec >= 0
    np.testing.assert_array_equal(np.asarray(out), np.arange(10) * 2)
    assert fetch(None) is None or True
