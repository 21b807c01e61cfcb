import numpy as np
import jax.numpy as jnp

from nbody_tpu.ops.knn import knn_periodic, knn_periodic_batch, pairwise_min_image_sq_dist


def _oracle_min_image_d2(pos):
    """Independent numpy min-image pairwise squared distances, box=1."""
    d = pos[:, None, :] - pos[None, :, :]
    d = d - np.round(d)
    return np.sum(d * d, axis=-1)


def _oracle_knn(pos, k, include_self=True):
    d2 = _oracle_min_image_d2(pos)
    n = pos.shape[0]
    if include_self:
        d2[np.arange(n), np.arange(n)] = -1.0
    else:
        d2[np.arange(n), np.arange(n)] = np.inf
    return np.argsort(d2, axis=1, kind="stable")[:, :k]


def test_pairwise_matches_oracle():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    ours = np.asarray(pairwise_min_image_sq_dist(jnp.asarray(pos), jnp.asarray(pos)))
    np.testing.assert_allclose(ours, _oracle_min_image_d2(pos), atol=1e-5)


def test_knn_matches_oracle_generic_positions():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 1, (200, 3)).astype(np.float32)  # generic: no ties
    k = 8
    ours = np.asarray(knn_periodic(jnp.asarray(pos), k, row_chunk=64))
    oracle = _oracle_knn(pos, k)
    # same neighbor *sets* (ordering may differ among equal distances)
    np.testing.assert_array_equal(np.sort(ours, 1), np.sort(oracle, 1))


def test_knn_self_at_slot_zero():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    idx = np.asarray(knn_periodic(jnp.asarray(pos), 5))
    np.testing.assert_array_equal(idx[:, 0], np.arange(64))


def test_knn_exclude_self():
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    idx = np.asarray(knn_periodic(jnp.asarray(pos), 5, include_self=False))
    assert not np.any(idx == np.arange(64)[:, None])


def test_knn_periodic_wrap_across_boundary():
    # two points on opposite faces are each other's nearest neighbor
    pos = np.array([[0.01, 0.5, 0.5],
                    [0.99, 0.5, 0.5],
                    [0.5, 0.5, 0.5],
                    [0.4, 0.5, 0.5]], dtype=np.float32)
    idx = np.asarray(knn_periodic(jnp.asarray(pos), 2))
    assert idx[0, 1] == 1  # wrapped neighbor beats anything in-box
    assert idx[1, 1] == 0


def test_knn_nonuniform_box_via_normalization():
    # raw box-128 coords, normalized before the call
    rng = np.random.default_rng(4)
    pos_raw = rng.uniform(0, 128, (100, 3)).astype(np.float32)
    idx1 = np.asarray(knn_periodic(jnp.asarray(pos_raw / 128.0), 6))
    idx2 = np.asarray(knn_periodic(jnp.asarray(pos_raw), 6, box=128.0))
    np.testing.assert_array_equal(np.sort(idx1, 1), np.sort(idx2, 1))


def test_knn_batch_shape_and_consistency():
    rng = np.random.default_rng(5)
    pos = rng.uniform(0, 1, (3, 40, 3)).astype(np.float32)
    idx = np.asarray(knn_periodic_batch(jnp.asarray(pos), 4))
    assert idx.shape == (3, 40, 4)
    single = np.asarray(knn_periodic(jnp.asarray(pos[1]), 4))
    np.testing.assert_array_equal(idx[1], single)


def test_knn_vs_sklearn_ghost_padding_semantics():
    """Cross-check against the reference's approach: sklearn kNN on a
    ghost-padded cube (reference graph.py:827-917) gives the same neighbor
    sets as our min-image metric."""
    from sklearn.neighbors import kneighbors_graph
    rng = np.random.default_rng(6)
    pos = rng.uniform(0, 1, (80, 3)).astype(np.float64)
    k = 6
    # ghost-pad: clone every particle into all 26 shifted images, query kNN
    shifts = np.array([[i, j, l] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for l in (-1, 0, 1)], dtype=np.float64)
    padded = (shifts[:, None, :] + pos[None, :, :]).reshape(-1, 3)
    owner = np.tile(np.arange(80), 27)
    graph = kneighbors_graph(padded, k, include_self=True)
    rows = graph[13 * 80:(13 + 1) * 80]  # the unshifted copies (shift [0,0,0])
    sk_sets = [set(owner[rows[i].indices]) for i in range(80)]
    ours = np.asarray(knn_periodic(jnp.asarray(pos.astype(np.float32)), k))
    for i in range(80):
        assert set(ours[i].tolist()) == sk_sets[i], f"particle {i}"


def test_banded_knn_matches_exact_on_grid_cubes():
    """On grid-ordered cubes (the real data layout) the banded search finds
    the same neighbors as the exact O(N^2) search."""
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch, positions_from_inputs
    raw = synthetic_raw_cubes(num_samples=2, cells=8, seed=11)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=32.0))
    exact = np.asarray(knn_periodic_batch(pos, 8))
    banded = np.asarray(knn_periodic_batch(pos, 8, band=256))
    np.testing.assert_array_equal(np.sort(banded, -1), np.sort(exact, -1))
    np.testing.assert_array_equal(banded[..., 0], exact[..., 0])  # self first


def test_banded_knn_wraps_index_space():
    # particles in index order around the seam: row 0's spatial neighbors
    # include high-index particles; band window must wrap.  Jitter breaks
    # distance ties (tie order may differ between search layouts).
    n = 64
    rng = np.random.default_rng(8)
    t = (np.linspace(0, 1, n, endpoint=False)
         + rng.uniform(-0.2, 0.2, n) / n) % 1.0
    pos = np.stack([t, rng.uniform(0, .001, n), np.zeros(n)], -1).astype(np.float32)
    exact = np.asarray(knn_periodic(jnp.asarray(pos), 4))
    banded = np.asarray(knn_periodic(jnp.asarray(pos), 4, band=16))
    np.testing.assert_array_equal(np.sort(banded, -1), np.sort(exact, -1))
    assert n - 1 in banded[0].tolist()  # wrapped neighbor found


def test_lattice_knn_matches_exact_on_grid_cubes():
    from nbody_tpu.ops.knn import knn_periodic_lattice
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch, positions_from_inputs
    raw = synthetic_raw_cubes(num_samples=2, cells=8, seed=13)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=32.0))
    for b in range(2):
        exact = np.asarray(knn_periodic(pos[b], 8))
        lattice = np.asarray(knn_periodic_lattice(pos[b], 8, cells=8))
        np.testing.assert_array_equal(np.sort(lattice, -1), np.sort(exact, -1))
        np.testing.assert_array_equal(lattice[:, 0], np.arange(512))


def test_lattice_knn_periodic_wrap():
    """Neighbors across the cube faces are found via per-coordinate wrap."""
    from nbody_tpu.ops.knn import knn_periodic_lattice
    from nbody_tpu.data.grid import grid_positions_np
    cells = 8
    rng = np.random.default_rng(3)
    pos = grid_positions_np(cells, box=1.0)  # sites at spacing/2 + i*spacing
    pos = (pos + 0.02 * rng.normal(size=pos.shape)).astype(np.float32) % 1.0
    exact = np.asarray(knn_periodic(jnp.asarray(pos), 6))
    lattice = np.asarray(knn_periodic_lattice(jnp.asarray(pos), 6, cells=cells))
    np.testing.assert_array_equal(np.sort(lattice, -1), np.sort(exact, -1))


def test_lattice_violations_diagnostic():
    from nbody_tpu.ops.knn import lattice_violations
    from nbody_tpu.data.grid import grid_positions_np
    cells = 8
    pos = grid_positions_np(cells, box=1.0).astype(np.float32)
    assert int(lattice_violations(jnp.asarray(pos), cells)) == 0
    bad = pos.copy()
    bad[0] = (bad[0] + 0.45) % 1.0  # kicked ~3.6 spacings away
    assert int(lattice_violations(jnp.asarray(bad), cells)) >= 1


def test_topk_min_iter_matches_top_k():
    """ops.knn.topk_min_iter == jax.lax.top_k(-d2, k) (values AND index
    order, incl. the lowest-slot tie rule) on random and tie-heavy data."""
    import jax
    import numpy as np
    from nbody_tpu.ops.knn import topk_min_iter
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.random((257, 125)).astype(np.float32))
    _, want = jax.lax.top_k(-d2, 14)
    got = topk_min_iter(d2, 14)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # exact ties (quantized distances): both must break to the lowest slot
    d2q = jnp.floor(d2 * 8.0)
    _, want_q = jax.lax.top_k(-d2q, 14)
    got_q = topk_min_iter(d2q, 14)
    np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
    # candidate exhaustion (k > finite lanes): selections stay DISTINCT and
    # in range like top_k's, never duplicating a slot (code review r4)
    d2x = jnp.asarray([[0.5, np.inf, 0.2, np.inf]], np.float32)
    got_x = np.asarray(topk_min_iter(d2x, 4))[0]
    assert sorted(got_x.tolist()) == [0, 1, 2, 3]
    assert got_x[0] == 2 and got_x[1] == 0


def test_lattice_knn_iter_select_matches_sort():
    """knn_periodic_lattice(select='iter') returns the same graph as the
    top_k sort on real synthetic positions."""
    import numpy as np
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import (features_from_raw, split_batch,
                                        positions_from_inputs)
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    cells = 8
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=11)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in),
                                            box=4.0 * cells))
    pn = jnp.mod(pos / (4.0 * cells), 1.0)
    i_sort = knn_periodic_lattice_batch(pn, 6, cells=cells, window=2)
    i_iter = knn_periodic_lattice_batch(pn, 6, cells=cells, window=2,
                                        select="iter")
    np.testing.assert_array_equal(np.asarray(i_iter), np.asarray(i_sort))


def test_topk_min_pallas_matches_top_k():
    """The VMEM-resident Pallas k-selection (ops/pallas/topk_kernels.py,
    interpret mode on CPU) == lax.top_k on random, tie-heavy, and
    exhausted-candidate inputs, batched through the lattice search."""
    import jax
    import numpy as np
    from nbody_tpu.ops.pallas.topk_kernels import topk_min_pallas
    rng = np.random.default_rng(1)
    d2 = jnp.asarray(rng.random((512, 125)).astype(np.float32))
    _, want = jax.lax.top_k(-d2, 14)
    got = topk_min_pallas(d2, 14)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    d2q = jnp.floor(d2 * 8.0)
    _, want_q = jax.lax.top_k(-d2q, 14)
    np.testing.assert_array_equal(np.asarray(topk_min_pallas(d2q, 14)),
                                  np.asarray(want_q))
    d2x = jnp.asarray([[0.5, np.inf, 0.2, np.inf]] * 8, np.float32)
    got_x = np.asarray(topk_min_pallas(d2x, 4))
    assert (np.sort(got_x, axis=1) == np.arange(4)).all()


def test_lattice_knn_pallas_select_matches_sort():
    import numpy as np
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import (features_from_raw, split_batch,
                                        positions_from_inputs)
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    cells = 8
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=11)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in),
                                            box=4.0 * cells))
    pn = jnp.mod(pos / (4.0 * cells), 1.0)
    i_sort = knn_periodic_lattice_batch(pn, 6, cells=cells, window=2)
    i_pal = knn_periodic_lattice_batch(pn, 6, cells=cells, window=2,
                                       select="pallas")
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_sort))
