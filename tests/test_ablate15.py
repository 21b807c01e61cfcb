"""The 15-op profiling ablation hook (models/shiftinv15.set_ablate).

The hook exists for scripts/profile15_parts.py: each name makes the
masked-path gather-impl layer skip one component at trace time so program
deltas localize the step cost.  These tests pin the contract: the default
(empty) set leaves the model bit-identical to the pre-hook path (the
oracle tests in test_shiftinv15.py cover exactness; here we pin state
hygiene), every single ablation still traces and returns finite values of
the right shape, and unknown names are rejected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu import config as C
from nbody_tpu.data.dataset import features_from_raw
from nbody_tpu.data.synthetic import synthetic_raw_cubes
from nbody_tpu.models import shiftinv15 as S15
from nbody_tpu.models.registry import build_model

CELLS, B, K, W = 8, 1, 4, 1


@pytest.fixture(scope="module")
def xin():
    raw = synthetic_raw_cubes(num_samples=B, cells=CELLS, seed=0)
    return jnp.asarray(features_from_raw(raw)[..., :6])


def _model():
    cfg = C.ModelConfig(family="shiftinv15", channels=(3, 8, 3),
                        k_neighbors=K, knn_window=W, neighbor_impl="masked")
    return build_model(cfg, box=4.0 * CELLS)


def test_default_ablate_empty():
    assert S15.ABLATE == frozenset()


def test_unknown_name_rejected():
    with pytest.raises(AssertionError):
        S15.set_ablate(["not_a_component"])
    assert S15.ABLATE == frozenset()


@pytest.mark.parametrize("name", ["transpose", "slotsum", "bcast", "diag",
                                  "pools", "maskmul"])
def test_each_ablation_traces_finite(name, xin):
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    try:
        S15.set_ablate([name])
        out = jax.jit(model.apply)(params, xin)
        assert out.shape == (B, CELLS ** 3, 3)
        assert np.all(np.isfinite(np.asarray(out)))
    finally:
        S15.set_ablate(())


def test_ablation_changes_the_program(xin):
    """An ablated program computes a different function (the hook is a
    measurement tool, not an optimization) — pin that it actually bites."""
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    full = np.asarray(jax.jit(model.apply)(params, xin))
    try:
        S15.set_ablate(["transpose"])
        ablated = np.asarray(jax.jit(_model().apply)(params, xin))
    finally:
        S15.set_ablate(())
    assert not np.allclose(full, ablated)
