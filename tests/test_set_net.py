import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.models.set_net import init_set_params, set_layer, set_network


CHANNELS = [6, 16, 8, 3]


def _params(seed=0):
    return init_set_params(jax.random.PRNGKey(seed), CHANNELS)


def test_set_layer_formula():
    params = _params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 6)).astype(np.float32))
    out = np.asarray(set_layer(x, params[0]))
    w = np.asarray(params[0]["W"][0])
    b = np.asarray(params[0]["B"][0])
    xc = np.asarray(x) - np.asarray(x).mean(1, keepdims=True)
    np.testing.assert_allclose(out, xc @ w + b, rtol=1e-5, atol=1e-6)


def test_permutation_equivariance():
    params = _params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 6)).astype(np.float32))
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(2), 32))
    out = np.asarray(set_network(params, x))
    out_perm = np.asarray(set_network(params, x[:, perm]))
    np.testing.assert_allclose(out_perm, out[:, perm], rtol=1e-4, atol=1e-5)


def test_translation_invariance_in_features():
    # mean-centering makes each layer invariant to constant feature shifts
    params = _params()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, 6)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(1, 1, 6)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(set_network(params, x + shift)),
                               np.asarray(set_network(params, x)),
                               rtol=1e-4, atol=1e-5)


def test_no_activation_on_last_layer():
    params = _params()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 64, 6)).astype(np.float32))
    out = np.asarray(set_network(params, x))
    assert out.min() < 0  # relu on the output would forbid this


def test_default_channels_param_shapes():
    from nbody_tpu import config as C
    params = init_set_params(jax.random.PRNGKey(0), C.CHANNELS)
    assert len(params) == len(C.CHANNELS) - 1
    assert params[0]["W"].shape == (1, 6, 64)
    assert params[-1]["W"].shape == (1, 16, 3)
    assert abs(float(params[0]["B"][0, 0]) - 1e-8) < 1e-12
