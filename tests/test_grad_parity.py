"""Backward-pass parity: masked (shared one-hot einsum) vs index paths.

The masked path is the project-wide default, and training differentiates
through the fused s2 scatter, block-major network, and the wide transpose
gather — this pins the FULL loss gradient wrt params against the plain
indexed implementation (ADVICE r2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.flatten_util import ravel_pytree

from nbody_tpu import config as C
from nbody_tpu.data.synthetic import synthetic_raw_cubes
from nbody_tpu.data.dataset import features_from_raw, split_batch
from nbody_tpu.models.registry import build_model
from nbody_tpu.physics.losses import loss_za

CELLS = 8
K = 6


def _grads(family, impl):
    # 48-wide hidden layer puts K*C = 288 > 256: exercises the wide masked
    # transpose gather (shiftinv15._transpose) beyond the old slice cap
    cfg = C.ModelConfig(family=family, channels=(3, 48, 6, 3), k_neighbors=K,
                        dtype="float32", knn_window=2, knn_method="lattice",
                        neighbor_impl=impl, seed=3)
    box = 4.0 * CELLS
    model = build_model(cfg, box=box)
    raw = synthetic_raw_cubes(num_samples=2, cells=CELLS, seed=0)
    x_in, y_true = split_batch(jnp.asarray(features_from_raw(raw)), 6)
    params = model.init(jax.random.PRNGKey(cfg.seed))

    def loss(p):
        return loss_za(model.apply(p, x_in), y_true)

    val, grads = jax.value_and_grad(loss)(params)
    return float(val), grads


@pytest.mark.parametrize("family", ["shiftinv", "shiftinv15"])
def test_masked_grads_match_indexed(family):
    v_masked, g_masked = _grads(family, "masked")
    v_index, g_index = _grads(family, "block")  # banded/index path off-TPU
    assert np.isfinite(v_masked)
    np.testing.assert_allclose(v_masked, v_index, rtol=1e-5)
    flat_m, _ = ravel_pytree(g_masked)
    flat_i, _ = ravel_pytree(g_index)
    gi = np.asarray(flat_i)
    gm = np.asarray(flat_m)
    # normalize per-element but floor the scale at a fraction of the grad
    # RMS: the two paths use different (equally valid) f32 summation trees
    # — verified to agree to ~1e-7 under float64 — so tiny-magnitude
    # elements carry ordering noise proportional to the overall scale,
    # not to their own value.
    rms = float(np.sqrt(np.mean(gi ** 2)))
    scale = np.maximum(np.abs(gi), 0.05 * rms)
    np.testing.assert_allclose(gm / scale, gi / scale, rtol=0, atol=2e-3)


@pytest.mark.parametrize("family", ["shiftinv", "shiftinv15"])
def test_masked_grads_match_indexed_bf16(family):
    """bf16-mode twin (ADVICE r3): with the pool divisions pinned to f32
    deg on the blocks path, the bf16 masked gradients must track the bf16
    indexed path within bf16 rounding (~8 bits -> ~1e-2 relative)."""
    def grads_bf16(impl):
        cfg = C.ModelConfig(family=family, channels=(3, 16, 3), k_neighbors=K,
                            dtype="bfloat16", knn_window=2,
                            knn_method="lattice", neighbor_impl=impl, seed=3)
        model = build_model(cfg, box=4.0 * CELLS)
        raw = synthetic_raw_cubes(num_samples=2, cells=CELLS, seed=0)
        x_in, y_true = split_batch(jnp.asarray(features_from_raw(raw)), 6)
        params = model.init(jax.random.PRNGKey(cfg.seed))

        def loss(p):
            return loss_za(model.apply(p, x_in), y_true)

        val, g = jax.value_and_grad(loss)(params)
        return float(val), g

    v_masked, g_masked = grads_bf16("masked")
    v_index, g_index = grads_bf16("block")
    assert np.isfinite(v_masked)
    np.testing.assert_allclose(v_masked, v_index, rtol=3e-2)
    flat_m, _ = ravel_pytree(g_masked)
    flat_i, _ = ravel_pytree(g_index)
    gi, gm = np.asarray(flat_i, np.float64), np.asarray(flat_m, np.float64)
    # bf16 relu gates can flip on near-zero pre-activations between the two
    # (equally valid) summation trees, so individual elements may diverge
    # O(1); the gradient as a vector must still agree: cosine > 0.998
    # (measured: 0.9997 four-op, 0.9990 fifteen-op — the 15-op layer runs
    # ~4x more bf16 ops per layer).  The per-element fraction inside the
    # normalized tolerance is family-dependent for the same reason
    # (measured: ~99% four-op, 89.9% fifteen-op on the pre-2LPT generator;
    # 96.5% four-op after the coupling term sharpened the data — more
    # near-zero pre-activations at the same seeds).
    cos = float(gi @ gm / (np.linalg.norm(gi) * np.linalg.norm(gm)))
    assert cos > 0.998, f"gradient cosine similarity {cos}"
    rms = float(np.sqrt(np.mean(gi ** 2)))
    scale = np.maximum(np.abs(gi), 0.25 * rms)
    frac_ok = float(np.mean(np.abs(gm - gi) / scale < 8e-2))
    min_frac = 0.95 if family == "shiftinv" else 0.85
    assert frac_ok >= min_frac, \
        f"only {frac_ok:.1%} of grads within tolerance (need {min_frac:.0%})"


@pytest.mark.parametrize("family", ["shiftinv", "shiftinv15"])
def test_index_mode_grads_match_masked_under_remat(family):
    """The idx-dot kernels' custom VJPs must compose with jax.checkpoint —
    the 64^3 training path runs remat=True, and in index mode every
    rematerialized layer re-synthesizes the one-hot in VMEM.  Pins the
    full bf16 loss gradient of (mask_dtype='index', remat=True) against
    (mask_dtype='auto', remat=False)."""
    def grads(mask_dtype, remat):
        cfg = C.ModelConfig(family=family, channels=(3, 16, 3), k_neighbors=K,
                            dtype="bfloat16", knn_window=2,
                            knn_method="lattice", neighbor_impl="masked",
                            mask_dtype=mask_dtype, remat=remat, seed=3)
        model = build_model(cfg, box=4.0 * CELLS)
        raw = synthetic_raw_cubes(num_samples=2, cells=CELLS, seed=0)
        x_in, y_true = split_batch(jnp.asarray(features_from_raw(raw)), 6)
        params = model.init(jax.random.PRNGKey(cfg.seed))

        def loss(p):
            return loss_za(model.apply(p, x_in), y_true)

        val, g = jax.value_and_grad(loss)(params)
        return float(val), g

    v_auto, g_auto = grads("auto", remat=False)
    v_idx, g_idx = grads("index", remat=True)
    assert np.isfinite(v_idx)
    # identical one-hot content; bf16 masks vs bf16 in-VMEM synthesis only
    # differ in contraction layout -> bf16-rounding-level agreement
    np.testing.assert_allclose(v_idx, v_auto, rtol=3e-2)
    flat_a, _ = ravel_pytree(g_auto)
    flat_x, _ = ravel_pytree(g_idx)
    ga, gx = np.asarray(flat_a, np.float64), np.asarray(flat_x, np.float64)
    rms = float(np.sqrt(np.mean(ga ** 2)))
    scale = np.maximum(np.abs(ga), 0.05 * rms)
    np.testing.assert_allclose(gx / scale, ga / scale, rtol=0, atol=6e-2)
