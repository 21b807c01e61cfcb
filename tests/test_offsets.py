"""Offset-space neighbor ops vs dense oracles (ops/offsets.py).

The offset-space formulation must agree exactly with plain indexed
gather/scatter for any lattice-kNN graph (all offsets within the window).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.knn import knn_periodic_lattice_batch
from nbody_tpu.ops.offsets import (edge_offset_sel, num_offsets,
                                   offset_bin, offset_fold, offset_gather,
                                   offset_scatter_add, window_stack)

CELLS = 8
N = CELLS ** 3
K = 6
W = 2
B = 2


@pytest.fixture(scope="module")
def graph():
    rng = np.random.RandomState(0)
    # grid-ordered positions with sub-spacing jitter (box-normalized)
    from nbody_tpu.data.grid import grid_positions
    base = np.asarray(grid_positions(CELLS, box=1.0)).reshape(N, 3)
    pos = base[None] + rng.uniform(-0.4, 0.4, (B, N, 3)) / CELLS
    pos = np.mod(pos, 1.0).astype(np.float32)
    idx = np.asarray(knn_periodic_lattice_batch(jnp.asarray(pos), K,
                                                cells=CELLS, window=W))
    return pos, idx


def test_sel_roundtrip(graph):
    """Decoding sel back to a neighbor id reproduces idx exactly."""
    _, idx = graph
    sel = np.asarray(edge_offset_sel(jnp.asarray(idx), CELLS, W))
    assert sel.min() >= 0 and sel.max() < num_offsets(W)
    s = 2 * W + 1
    dx = sel // (s * s) - W
    dy = (sel // s) % s - W
    dz = sel % s - W
    ii = np.arange(N)
    x, y, z = ii // (CELLS * CELLS), (ii // CELLS) % CELLS, ii % CELLS
    nx = np.mod(x[None, :, None] + dx, CELLS)
    ny = np.mod(y[None, :, None] + dy, CELLS)
    nz = np.mod(z[None, :, None] + dz, CELLS)
    np.testing.assert_array_equal((nx * CELLS + ny) * CELLS + nz, idx)


def test_window_stack(graph):
    """W[b, n, o] == values[b, n (+) delta_o] for every offset."""
    rng = np.random.RandomState(1)
    v = rng.randn(B, N, 3).astype(np.float32)
    w = np.asarray(window_stack(jnp.asarray(v), CELLS, W))
    s = 2 * W + 1
    cube = v.reshape(B, CELLS, CELLS, CELLS, 3)
    for o in [0, 1, 17, 62, 77, 124]:
        ox, oy, oz = o // (s * s) - W, (o // s) % s - W, o % s - W
        want = np.roll(cube, (-ox, -oy, -oz), axis=(1, 2, 3)).reshape(B, N, 3)
        np.testing.assert_array_equal(w[:, :, o, :], want)


@pytest.mark.parametrize("impl", ["take", "onehot"])
def test_offset_gather(graph, impl):
    _, idx = graph
    rng = np.random.RandomState(2)
    v = rng.randn(B, N, 5).astype(np.float32)
    sel = edge_offset_sel(jnp.asarray(idx), CELLS, W)
    out = np.asarray(offset_gather(jnp.asarray(v), sel, CELLS, W, impl=impl))
    want = np.stack([v[b][idx[b]] for b in range(B)])
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-6)


def test_offset_scatter_add(graph):
    _, idx = graph
    rng = np.random.RandomState(3)
    vals = rng.randn(B, N, K, 5).astype(np.float32)
    sel = edge_offset_sel(jnp.asarray(idx), CELLS, W)
    out = np.asarray(offset_scatter_add(jnp.asarray(vals), sel, CELLS, W))
    want = np.zeros((B, N, 5), np.float32)
    for b in range(B):
        np.add.at(want[b], idx[b].reshape(-1), vals[b].reshape(-1, 5))
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-5)


def test_fold_is_stack_transpose():
    """<W(v), bins> == <v, fold(bins)> — exact adjoint pair."""
    rng = np.random.RandomState(4)
    v = jnp.asarray(rng.randn(1, N, 2).astype(np.float32))
    bins = jnp.asarray(rng.randn(1, N, num_offsets(W), 2).astype(np.float32))
    lhs = jnp.vdot(window_stack(v, CELLS, W), bins)
    rhs = jnp.vdot(v, offset_fold(bins, CELLS, W))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_gather_grad_is_scatter(graph):
    """AD through offset_gather equals the explicit scatter (and vice
    versa) — the pair is mutually adjoint, so plain autodiff stays in
    offset space with no indexed ops."""
    _, idx = graph
    rng = np.random.RandomState(5)
    v = jnp.asarray(rng.randn(B, N, 4).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, N, K, 4).astype(np.float32))
    sel = edge_offset_sel(jnp.asarray(idx), CELLS, W)

    _, vjp = jax.vjp(lambda x: offset_gather(x, sel, CELLS, W, impl="onehot"), v)
    got = vjp(ct)[0]
    want = offset_scatter_add(ct, sel, CELLS, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
