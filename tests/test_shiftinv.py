import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu.models.shiftinv import (
    init_shiftinv_params, shift_inv_layer, shiftinv_network, shiftinv_model)
from nbody_tpu.ops.knn import knn_periodic_batch
from nbody_tpu.ops.graph_features import edge_features_za

CHANNELS = [3, 8, 4, 3]
B, N, K = 2, 24, 4


def _random_graph(seed=0):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(B, N, K, 3)).astype(np.float32)
    # neighbor ids with self at slot 0, random others
    idx = rng.integers(0, N, size=(B, N, K)).astype(np.int32)
    idx[:, :, 0] = np.arange(N)
    return jnp.asarray(h), jnp.asarray(idx)


def _oracle_layer(h, idx, w, b, is_last):
    """COO-semantics oracle: direct transcription of the reference layer
    (graph.py:367-456) with numpy loops — pool via unsorted_segment_mean,
    re-broadcast by gather, matmul AFTER broadcasting."""
    bsz, n, k, c = h.shape
    q = w.shape[-1]
    out = np.zeros((bsz, n, k, q), np.float32)
    for s in range(bsz):
        rows = np.repeat(np.arange(n), k)
        cols = np.asarray(idx[s]).reshape(-1)
        hh = np.asarray(h[s]).reshape(n * k, c)

        def seg_mean(vals, ids, num):
            res = np.zeros((num, vals.shape[-1]), np.float32)
            cnt = np.zeros(num, np.float32)
            for e, g in enumerate(ids):
                res[g] += vals[e]
                cnt[g] += 1
            cnt[cnt == 0] = 1
            return res / cnt[:, None]

        h1 = hh @ w[0]
        h2 = seg_mean(hh, cols, n)[cols] @ w[1]
        h3 = seg_mean(hh, rows, n)[rows] @ w[2]
        h4 = np.tile(hh.mean(0, keepdims=True), (n * k, 1)) @ w[3]
        o = (h1 + h2 + h3 + h4 + b).astype(np.float32)
        out[s] = o.reshape(n, k, q)
    if is_last:
        return out.mean(2)
    return out


def test_layer_matches_coo_oracle():
    h, idx = _random_graph()
    params = init_shiftinv_params(jax.random.PRNGKey(0), CHANNELS)
    p0 = params[0]
    ours = np.asarray(shift_inv_layer(h, idx, p0))
    oracle = _oracle_layer(h, idx, np.asarray(p0["W"]), np.asarray(p0["B"][0]),
                           is_last=False)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_last_layer_pools_to_particles():
    h, idx = _random_graph(1)
    params = init_shiftinv_params(jax.random.PRNGKey(1), CHANNELS)
    p0 = params[0]
    ours = np.asarray(shift_inv_layer(h, idx, p0, is_last=True))
    assert ours.shape == (B, N, CHANNELS[1])
    oracle = _oracle_layer(h, idx, np.asarray(p0["W"]), np.asarray(p0["B"][0]),
                           is_last=True)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_network_output_shape():
    h, idx = _random_graph(2)
    params = init_shiftinv_params(jax.random.PRNGKey(2), CHANNELS)
    out = shiftinv_network(params, h, idx)
    assert out.shape == (B, N, 3)


def _model_setup(seed=3):
    rng = np.random.default_rng(seed)
    box = 16.0
    pos = rng.uniform(0, box, (B, N, 3)).astype(np.float32)
    za = 0.1 * rng.normal(size=(B, N, 3)).astype(np.float32)
    params = init_shiftinv_params(jax.random.PRNGKey(seed), CHANNELS)
    return box, jnp.asarray(pos), jnp.asarray(za), params


def test_model_shift_invariance():
    """Translating the whole cube (with wrap) must not change the output:
    the property the reference's architecture is named for."""
    box, pos, za, params = _model_setup()
    idx = knn_periodic_batch(jnp.mod(pos / box, 1.0), K)
    out1 = np.asarray(shiftinv_model(params, pos, za, idx, box))

    shift = jnp.asarray([3.7, -1.2, 8.9])
    pos2 = jnp.mod(pos + shift, box)
    idx2 = knn_periodic_batch(jnp.mod(pos2 / box, 1.0), K)
    out2 = np.asarray(shiftinv_model(params, pos2, za, idx2, box))
    np.testing.assert_allclose(out1, out2, rtol=1e-3, atol=1e-4)


def test_model_permutation_equivariance():
    box, pos, za, params = _model_setup(4)
    idx = knn_periodic_batch(jnp.mod(pos / box, 1.0), K)
    out = np.asarray(shiftinv_model(params, pos, za, idx, box))

    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(7), N))
    pos_p, za_p = pos[:, perm], za[:, perm]
    idx_p = knn_periodic_batch(jnp.mod(pos_p / box, 1.0), K)
    out_p = np.asarray(shiftinv_model(params, pos_p, za_p, idx_p, box))
    np.testing.assert_allclose(out_p, out[:, perm], rtol=1e-3, atol=1e-4)


def test_edge_features_za_self_slot():
    box, pos, za, _ = _model_setup(5)
    idx = knn_periodic_batch(jnp.mod(pos / box, 1.0), K)
    e = np.asarray(edge_features_za(pos, idx, za, box))
    np.testing.assert_allclose(e[:, :, 0, :], np.asarray(za), atol=1e-6)
    # non-self edges are min-image relative positions, bounded by box/2
    assert np.all(np.abs(e[:, :, 1:, :]) <= box / 2 + 1e-5)
