"""Exactness contract for the fused layer-boundary kernel (PERF.md
round-5 ledger item 1; reference hot op graph.py:367-391).

The kernel streams each (ET, P) mask tile once and computes layer i's
gather, the per-edge chain, and layer i+1's pre-fold scatter; these tests
pin it (CPU interpret mode) against the unfused shared-mask einsum
composition on REAL block masks from a lattice kNN graph, in f32 (exact)
and bf16 (the production dtype)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops import blocked
from nbody_tpu.ops.knn import knn_periodic_lattice
from nbody_tpu.ops.pallas.fused_kernels import (boundary_reference,
                                                fused_boundary_dot)

CELLS, WINDOW, K, C, Q = 8, 2, 6, 8, 4


def _setup(dtype):
    rng = np.random.default_rng(7)
    n = CELLS ** 3
    grid = np.stack(np.meshgrid(*[np.arange(CELLS)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3) * 4.0
    pos = jnp.asarray(grid + rng.normal(scale=0.3, size=(n, 3)))
    idx = knn_periodic_lattice(pos, k=K, cells=CELLS, box=4.0 * CELLS)[None]
    core = (2, 2, 2)
    masks = blocked.block_masks(idx, CELLS, WINDOW, dtype=dtype, core=core)
    b, nb, et, p = masks.shape
    patches = jnp.asarray(rng.normal(size=(b, nb, p, C)), dtype)
    a_edge = jnp.asarray(rng.normal(size=(b, nb, et, C)), dtype)
    w1 = jnp.asarray(rng.normal(size=(C, Q)), dtype)
    w2 = jnp.asarray(rng.normal(size=(C, Q)), dtype)
    return masks, patches, a_edge, w1, w2


@pytest.mark.parametrize("group", [1, 2])
def test_fused_boundary_matches_unfused_f32(group):
    args = _setup(jnp.float32)
    act_k, h1_k, s_k = fused_boundary_dot(*args, group=group)
    act_r, h1_r, s_r = boundary_reference(*args)
    np.testing.assert_allclose(np.asarray(act_k), np.asarray(act_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1_k), np.asarray(h1_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-5, atol=1e-5)


def test_fused_boundary_matches_unfused_bf16():
    args = _setup(jnp.bfloat16)
    act_k, h1_k, s_k = fused_boundary_dot(*args)
    act_r, h1_r, s_r = boundary_reference(*args)
    np.testing.assert_allclose(np.asarray(act_k, np.float32),
                               np.asarray(act_r, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(h1_k), np.asarray(h1_r),
                               rtol=2e-2, atol=2e-1)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=2e-2, atol=2e-1)


def test_fused_boundary_is_the_layer_boundary_math():
    """The kernel's (gather + per-edge chain + scatter) equals the model's
    own ops composed directly: masked gather of pooled rows, +A, act,
    weight dots, masked scatter — i.e. the thing the step actually runs
    at a layer boundary (models/shiftinv.py op 2 of adjacent layers)."""
    masks, patches, a_edge, w1, w2 = _setup(jnp.float32)
    _, h1_k, s_k = fused_boundary_dot(masks, patches, a_edge, w1, w2)
    e = blocked._mask_contract_gather(masks, patches)
    e = jax.nn.relu(e + a_edge)
    hw = jnp.einsum("bnec,cq->bneq", e.astype(jnp.float32), w2)
    s_r = blocked._mask_contract_scatter(masks, hw)
    h1_r = jnp.einsum("bnec,cq->bneq", e.astype(jnp.float32), w1)
    np.testing.assert_allclose(np.asarray(h1_k), np.asarray(h1_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-4, atol=1e-4)
