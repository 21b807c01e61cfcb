import numpy as np
import jax.numpy as jnp

from nbody_tpu.physics.losses import loss_za, pbc_loss, mse_za
from nbody_tpu.physics.baseline import calculate_timestep, linear_velocity_pred, l2_dist


def test_loss_za_formula():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(2, 16, 3)).astype(np.float32)
    t = rng.normal(size=(2, 16, 3)).astype(np.float32)
    ours = float(loss_za(jnp.asarray(p), jnp.asarray(t)))
    oracle = np.mean(np.sum(np.square(p - t), axis=-1))
    np.testing.assert_allclose(ours, oracle, rtol=1e-6)


def test_loss_za_zero_at_perfect():
    x = jnp.ones((1, 8, 3))
    assert float(loss_za(x, x)) == 0.0


def test_pbc_loss_scaling_and_wrap():
    # points on opposite faces are close under PBC
    a = jnp.full((1, 4, 3), 0.99)
    b = jnp.full((1, 4, 3), 0.01)
    scaled = float(pbc_loss(a, b))
    unscaled = float(pbc_loss(a, b, scale_error=False))
    np.testing.assert_allclose(scaled, unscaled * 1e5, rtol=1e-6)
    np.testing.assert_allclose(unscaled, 3 * 0.02 ** 2, rtol=1e-4)


def test_mse_za_matches_loss_za():
    rng = np.random.default_rng(1)
    f = rng.normal(size=(4, 8, 3)).astype(np.float32)
    z = rng.normal(size=(4, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(float(mse_za(f, z)),
                               float(loss_za(jnp.asarray(f), jnp.asarray(z))),
                               rtol=1e-6)


def test_linear_velocity_baseline_recovers_exact_timestep():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 1, (32, 3)).astype(np.float32)
    vel = rng.normal(size=(32, 3)).astype(np.float32)
    t_true = 0.37
    x_in = np.concatenate([pos, vel], -1)
    x_out = np.concatenate([pos + t_true * vel, vel], -1)
    t = float(calculate_timestep(jnp.asarray(x_in), jnp.asarray(x_out)))
    np.testing.assert_allclose(t, t_true, rtol=1e-4)
    pred = linear_velocity_pred(jnp.asarray(x_in), t)
    np.testing.assert_allclose(np.asarray(l2_dist(pred, jnp.asarray(x_out[:, :3]))),
                               0.0, atol=1e-4)
