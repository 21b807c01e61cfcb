import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.models.attn import (
    init_attn_params, attn_layer, attn_network, set_transform, batch_norm)

CHANNELS = [6, 16, 16, 16, 3]


def _params(seed=0):
    return init_attn_params(jax.random.PRNGKey(seed), CHANNELS)


def test_set_transform_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 6)).astype(np.float32)
    w = rng.normal(size=(6, 4)).astype(np.float32)
    out = np.asarray(set_transform(jnp.asarray(x), jnp.asarray(w)))
    xc = x - x.mean(1, keepdims=True)
    np.testing.assert_allclose(out, xc @ w, rtol=1e-5, atol=1e-6)


def test_attn_layer_coupled_gate_oracle():
    """Gate computed over all b*N rows jointly (reference experiment.py:122-128)."""
    rng = np.random.default_rng(1)
    params = _params()
    x = jnp.asarray(rng.normal(size=(2, 12, 6)).astype(np.float32))
    out = np.asarray(attn_layer(x, params[0], batch_coupled_gate=True))

    def st(xx, w):
        xc = xx - xx.mean(1, keepdims=True)
        return xc @ w

    xn = np.asarray(x)
    xf = st(xn, np.asarray(params[0]["Wf"])).reshape(-1, 16)
    xg = st(xn, np.asarray(params[0]["Wg"])).reshape(-1, 16)
    xh = st(xn, np.asarray(params[0]["Wh"])).reshape(-1, 16)
    logits = xf.T @ xg
    gate = np.exp(logits - logits.max(-1, keepdims=True))
    gate = gate / gate.sum(-1, keepdims=True)
    oracle = (xh @ gate).reshape(2, 12, 16) + np.asarray(params[0]["B"])
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_attn_layer_uncoupled_is_batch_independent():
    rng = np.random.default_rng(2)
    params = _params(1)
    x = jnp.asarray(rng.normal(size=(3, 10, 6)).astype(np.float32))
    full = np.asarray(attn_layer(x, params[0], batch_coupled_gate=False))
    solo = np.asarray(attn_layer(x[1:2], params[0], batch_coupled_gate=False))
    np.testing.assert_allclose(full[1:2], solo, rtol=1e-5, atol=1e-6)


def test_batch_norm_normalizes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(4, 50, 8)).astype(np.float32))
    out = np.asarray(batch_norm(x, jnp.ones(8), jnp.zeros(8)))
    np.testing.assert_allclose(out.mean((0, 1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std((0, 1)), 1.0, atol=1e-2)


def test_attn_network_shapes_and_gradients():
    params = _params(2)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 20, 6)).astype(np.float32))
    out = attn_network(params, x)
    assert out.shape == (2, 20, 3)

    def loss(p):
        return jnp.sum(attn_network(p, x) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_attn_permutation_equivariance():
    params = _params(3)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 6)).astype(np.float32))
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(6), 16))
    out = np.asarray(attn_network(params, x))
    out_p = np.asarray(attn_network(params, x[:, perm]))
    np.testing.assert_allclose(out_p, out[:, perm], rtol=1e-3, atol=1e-4)
