"""Banded gather/scatter: jnp path and Pallas kernels (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.banded import (
    banded_gather, banded_scatter_add, banded_segment_mean, band_violations,
    default_band)
from nbody_tpu.ops.pallas.banded_kernels import (
    banded_gather_pallas, banded_scatter_add_pallas)

N, K, C, B = 256, 6, 5, 2


def _structured(seed=0, spread=40):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(N, C)).astype(np.float32)
    rel = rng.integers(-spread, spread, (N, K))
    idx = ((np.arange(N)[:, None] + rel) % N).astype(np.int32)
    vals = rng.normal(size=(N, K, C)).astype(np.float32)
    return v, idx, vals


@pytest.mark.parametrize("band", [None, 128, N])
def test_jnp_gather_exact(band):
    v, idx, _ = _structured()
    out = np.asarray(banded_gather(jnp.asarray(v), jnp.asarray(idx), band))
    np.testing.assert_array_equal(out, v[idx])


@pytest.mark.parametrize("band", [None, 128])
def test_jnp_scatter_matches_add_at(band):
    _, idx, vals = _structured(1)
    out = np.asarray(banded_scatter_add(jnp.asarray(vals), jnp.asarray(idx), band))
    ref = np.zeros((N, C), np.float32)
    np.add.at(ref, idx.reshape(-1), vals.reshape(-1, C))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_jnp_segment_mean():
    _, idx, vals = _structured(2)
    out = np.asarray(banded_segment_mean(jnp.asarray(vals), jnp.asarray(idx), 128))
    sums = np.zeros((N, C), np.float32)
    cnt = np.zeros(N, np.float32)
    np.add.at(sums, idx.reshape(-1), vals.reshape(-1, C))
    np.add.at(cnt, idx.reshape(-1), 1.0)
    ref = sums / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_gather_grad_is_scatter():
    v, idx, _ = _structured(3)
    ct = np.random.default_rng(4).normal(size=(N, K, C)).astype(np.float32)

    def f(vv):
        return jnp.sum(banded_gather(vv, jnp.asarray(idx), 128) * jnp.asarray(ct))

    g = np.asarray(jax.grad(f)(jnp.asarray(v)))
    ref = np.zeros((N, C), np.float32)
    np.add.at(ref, idx.reshape(-1), ct.reshape(-1, C))
    np.testing.assert_allclose(g, ref, atol=1e-4)


def test_band_violations_counts():
    _, idx, _ = _structured(5, spread=40)
    assert int(band_violations(jnp.asarray(idx), 128)) == 0
    assert int(band_violations(jnp.asarray(idx), 16)) > 0


def test_default_band_reasonable():
    # must cover the lattice kNN's construction bound 2*w*(c^2+c+1)
    assert default_band(32) >= 2 * 3 * (32 * 32 + 32 + 1)
    assert default_band(8) <= 512
    assert default_band(8, window=2) <= default_band(8, window=3)


def _batched(seed=0, spread=40):
    v, idx, vals = _structured(seed, spread)
    rng = np.random.default_rng(seed + 100)
    v2, idx2, vals2 = _structured(seed + 1, spread)
    return (np.stack([v, v2]), np.stack([idx, idx2]).astype(np.int32),
            np.stack([vals, vals2]))


@pytest.mark.parametrize("band", [None, 128])
def test_pallas_gather_interpret(band):
    v, idx, _ = _batched()
    out = np.asarray(banded_gather_pallas(jnp.asarray(v), jnp.asarray(idx),
                                          band, interpret=True, fast=False))
    for b in range(B):
        np.testing.assert_array_equal(out[b], v[b][idx[b]])


@pytest.mark.parametrize("band", [None, 128])
def test_pallas_scatter_interpret(band):
    _, idx, vals = _batched(1)
    out = np.asarray(banded_scatter_add_pallas(jnp.asarray(vals),
                                               jnp.asarray(idx),
                                               band, interpret=True,
                                               fast=False))
    for b in range(B):
        ref = np.zeros((N, C), np.float32)
        np.add.at(ref, idx[b].reshape(-1), vals[b].reshape(-1, C))
        np.testing.assert_allclose(out[b], ref, atol=1e-4)


def test_pallas_matches_jnp_path():
    v, idx, vals = _batched(7)
    gp = np.asarray(banded_gather_pallas(jnp.asarray(v), jnp.asarray(idx),
                                         128, interpret=True, fast=False))
    gj = np.stack([np.asarray(banded_gather(jnp.asarray(v[b]),
                                            jnp.asarray(idx[b]), 128))
                   for b in range(B)])
    np.testing.assert_array_equal(gp, gj)



def test_pallas_fast_mode_bf16_tolerance():
    """fast=True rounds values to bf16: within ~1e-2 relative of exact."""
    v, idx, vals = _batched(9)
    g = np.asarray(banded_gather_pallas(jnp.asarray(v), jnp.asarray(idx),
                                        128, interpret=True, fast=True))
    for b in range(B):
        ref = v[b][idx[b]]
        np.testing.assert_allclose(g[b], ref, rtol=1e-2, atol=1e-2)
    s = np.asarray(banded_scatter_add_pallas(jnp.asarray(vals),
                                             jnp.asarray(idx), 128,
                                             interpret=True, fast=True))
    for b in range(B):
        ref = np.zeros((N, C), np.float32)
        np.add.at(ref, idx[b].reshape(-1), vals[b].reshape(-1, C))
        np.testing.assert_allclose(s[b], ref, rtol=5e-2, atol=5e-2)


def test_block_ops_match_gather_semantics():
    """3D-block gather/scatter (interpret mode) == direct indexing on a
    lattice-kNN graph."""
    import jax
    from nbody_tpu.ops.blocked import block_gather, block_scatter_add
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch, positions_from_inputs

    cells, W, K2, C2, B2 = 8, 2, 6, 5, 2
    n = cells ** 3
    rng = np.random.default_rng(3)
    raw = synthetic_raw_cubes(num_samples=B2, cells=cells, seed=7)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=4.0 * cells))
    idx = knn_periodic_lattice_batch(pos, K2, cells=cells, window=W)
    v = jnp.asarray(rng.normal(size=(B2, n, C2)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(B2, n, K2, C2)).astype(np.float32))

    g = np.asarray(block_gather(v, idx, cells, W, fast=False, interpret=True))
    for b in range(B2):
        np.testing.assert_array_equal(g[b], np.asarray(v)[b][np.asarray(idx)[b]])

    s = np.asarray(block_scatter_add(vals, idx, cells, W, fast=False,
                                     interpret=True))
    for b in range(B2):
        ref = np.zeros((n, C2), np.float32)
        np.add.at(ref, np.asarray(idx)[b].reshape(-1),
                  np.asarray(vals)[b].reshape(-1, C2))
        np.testing.assert_allclose(s[b], ref, atol=1e-4)


def test_default_band_covers_coordinate_wrap():
    """Regression (review finding): a wrapped y/z coordinate produces flat
    offsets up to (window+1)*c^2 - 1; the default band must cover them and
    band_violations must report zero for any lattice-kNN graph."""
    import jax
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch, positions_from_inputs

    cells, w = 8, 2
    # large displacements force boundary wraps
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=17, za_rms=1.5)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=4.0 * cells))
    idx = knn_periodic_lattice_batch(pos, 8, cells=cells, window=w)
    band = default_band(cells, window=w)
    assert int(band_violations(idx, band)) == 0
    # and the gather at that band is exact
    rng = np.random.default_rng(0)
    v = rng.normal(size=(cells ** 3, 4)).astype(np.float32)
    g = np.asarray(banded_gather(jnp.asarray(v), idx[0], band))
    np.testing.assert_array_equal(g, v[np.asarray(idx[0])])


def test_masked_ops_match_gather_semantics():
    """Precomputed-mask gather/scatter (XLA einsum path) == direct indexing,
    and its autodiff transposes correctly (grad of sum(gather) == in-degree
    broadcast)."""
    from nbody_tpu.ops.blocked import block_masks, masked_gather, masked_scatter_add
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import (features_from_raw, split_batch,
                                        positions_from_inputs)

    cells, W, K2, C2, B2 = 8, 2, 6, 5, 2
    n = cells ** 3
    rng = np.random.default_rng(3)
    raw = synthetic_raw_cubes(num_samples=B2, cells=cells, seed=7)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=4.0 * cells))
    idx = knn_periodic_lattice_batch(pos, K2, cells=cells, window=W)
    v = jnp.asarray(rng.normal(size=(B2, n, C2)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(B2, n, K2, C2)).astype(np.float32))

    masks = block_masks(idx, cells, W, dtype=jnp.float32)
    # each mask row selects exactly one patch site
    np.testing.assert_array_equal(np.asarray(jnp.sum(masks, axis=-1)), 1.0)

    g = np.asarray(masked_gather(v, masks, cells, W))
    i_np = np.asarray(idx)
    for b in range(B2):
        np.testing.assert_allclose(g[b], np.asarray(v)[b][i_np[b]], atol=1e-5)

    s = np.asarray(masked_scatter_add(vals, masks, cells, W))
    for b in range(B2):
        ref = np.zeros((n, C2), np.float32)
        np.add.at(ref, i_np[b].reshape(-1),
                  np.asarray(vals)[b].reshape(-1, C2))
        np.testing.assert_allclose(s[b], ref, atol=1e-4)

    # AD: d(sum gather)/d(values)[j] == in-degree of j (the transposed einsum
    # reads the same masks — no custom VJP involved)
    grad = jax.grad(lambda vv: jnp.sum(masked_gather(vv, masks, cells, W)))(v)
    deg = np.zeros((B2, n), np.float32)
    for b in range(B2):
        np.add.at(deg[b], i_np[b].reshape(-1), 1.0)
    np.testing.assert_allclose(np.asarray(grad)[..., 0], deg, atol=1e-4)


def test_masked_model_matches_block_model():
    """shiftinv forward with neighbor_impl='masked' == 'block' (f32, CPU)."""
    from nbody_tpu import config as C
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch

    cells = 8
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=5)
    x_in, _ = split_batch(features_from_raw(raw))
    x_in = jnp.asarray(x_in)
    outs = {}
    for impl in ("block", "masked"):
        cfg = C.ModelConfig(family="shiftinv", channels=(3, 8, 8, 3),
                            k_neighbors=6, knn_window=2, neighbor_impl=impl)
        model = build_model(cfg, box=4.0 * cells)
        params = model.init(jax.random.PRNGKey(0))
        outs[impl] = np.asarray(jax.jit(model.apply)(params, x_in))
    np.testing.assert_allclose(outs["masked"], outs["block"],
                               rtol=1e-4, atol=1e-5)


def test_masked_vel_model_matches_block_model():
    """shiftinv_vel forward with neighbor_impl='masked' == 'block' (f32)."""
    from nbody_tpu import config as C
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw

    cells = 8
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=9)
    x = features_from_raw(raw)
    x_in = jnp.asarray(x[..., :9])
    outs = {}
    for impl in ("block", "masked"):
        cfg = C.ModelConfig(family="shiftinv_vel", channels=(9, 8, 8, 6),
                            k_neighbors=6, knn_window=2, neighbor_impl=impl)
        model = build_model(cfg, box=4.0 * cells)
        params = model.init(jax.random.PRNGKey(0))
        outs[impl] = np.asarray(jax.jit(model.apply)(params, x_in))
    np.testing.assert_allclose(outs["masked"], outs["block"],
                               rtol=1e-4, atol=1e-5)


def test_masked_ops_exact_across_core_shapes():
    """masked_gather / masked_scatter_add must be exact for every legal
    core shape (the bench core sweep relies on set_masked_core; a wrong
    geometry would silently corrupt the swept measurements)."""
    import itertools
    import numpy as np
    import jax.numpy as jnp
    from nbody_tpu.ops.blocked import (block_masks, masked_gather,
                                       masked_scatter_add)

    rng = np.random.default_rng(0)
    cells, k, w, b, c = 8, 6, 2, 2, 5
    n = cells ** 3
    coords = np.array(list(itertools.product(range(cells), repeat=3)))
    offs = np.array(list(itertools.product(range(-w, w + 1), repeat=3)))
    idx = np.zeros((b, n, k), np.int32)
    for bi in range(b):
        for ni in range(n):
            sel = offs[rng.choice(len(offs), k, replace=False)]
            cc = (coords[ni] + sel) % cells
            idx[bi, ni] = (cc[:, 0] * cells + cc[:, 1]) * cells + cc[:, 2]
    v = rng.normal(size=(b, n, c)).astype(np.float32)
    ev = rng.normal(size=(b, n, k, c)).astype(np.float32)
    ref_g = np.stack([v[bi][idx[bi]] for bi in range(b)])
    ref_s = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        np.add.at(ref_s, (bi, idx[bi].reshape(-1)), ev[bi].reshape(-1, c))

    for core in [(2, 2, 2), (2, 2, 4), (2, 4, 4), (4, 4, 4)]:
        masks = block_masks(jnp.asarray(idx), cells, w, dtype=jnp.float32,
                            core=core)
        g = np.asarray(masked_gather(jnp.asarray(v), masks, cells, w,
                                     core=core))
        s = np.asarray(masked_scatter_add(jnp.asarray(ev), masks, cells, w,
                                          core=core))
        np.testing.assert_allclose(g, ref_g, atol=1e-6, err_msg=str(core))
        np.testing.assert_allclose(s, ref_s, atol=1e-5, err_msg=str(core))


@pytest.mark.parametrize("mask_dt", ["int8", "int4", "index"])
def test_masked_int8_ops_match_indexing(mask_dt):
    """int8/int4 masks route through the Pallas mask-dot kernels
    (ops/pallas/mask_kernels.py) and 'index' positions through the
    mask-free idx-dot kernels (ops/pallas/idx_kernels.py), interpret-mode
    on CPU: gather == direct indexing and scatter == np.add.at for
    bf16-representable values (the dot is one-hot bf16 x bf16 with f32
    accumulation, so bf16-exact inputs pass through exactly)."""
    from nbody_tpu.ops.blocked import (block_masks, block_positions,
                                       masked_gather, masked_scatter_add)
    from nbody_tpu.ops.knn import knn_periodic_lattice_batch
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import (features_from_raw, split_batch,
                                        positions_from_inputs)

    cells, W, K2, C2, B2 = 8, 2, 6, 5, 2
    n = cells ** 3
    rng = np.random.default_rng(3)
    raw = synthetic_raw_cubes(num_samples=B2, cells=cells, seed=7)
    x_in, _ = split_batch(features_from_raw(raw))
    pos = jnp.asarray(positions_from_inputs(jnp.asarray(x_in), box=4.0 * cells))
    idx = knn_periodic_lattice_batch(pos, K2, cells=cells, window=W)
    # bf16-representable inputs -> the int8 path must be EXACT
    v = jnp.asarray(rng.normal(size=(B2, n, C2)).astype(np.float32)
                    ).astype(jnp.bfloat16).astype(jnp.float32)
    vals = jnp.asarray(rng.normal(size=(B2, n, K2, C2)).astype(np.float32)
                       ).astype(jnp.bfloat16).astype(jnp.float32)

    if mask_dt == "index":
        masks = block_positions(idx, cells, W)
        assert masks.ndim == 3 and masks.dtype == jnp.int32
    else:
        masks = block_masks(idx, cells, W,
                            dtype=jnp.int8 if mask_dt == "int8" else jnp.int4)
        assert masks.dtype == jnp.dtype(mask_dt)
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(masks.astype(jnp.int32), axis=-1)), 1)

    g = np.asarray(masked_gather(v, masks, cells, W))
    i_np = np.asarray(idx)
    for b in range(B2):
        np.testing.assert_array_equal(g[b], np.asarray(v)[b][i_np[b]])

    s = np.asarray(masked_scatter_add(vals, masks, cells, W))
    for b in range(B2):
        ref = np.zeros((n, C2), np.float32)
        np.add.at(ref, i_np[b].reshape(-1),
                  np.asarray(vals)[b].reshape(-1, C2))
        np.testing.assert_allclose(s[b], ref, atol=1e-5)

    # custom-VJP pair: d(sum gather)/d(values)[j] == in-degree of j (the
    # backward rides the transposed Pallas kernel against the SAME int8
    # masks; the masks' own cotangent is float0 — zero-size)
    grad = jax.grad(lambda vv: jnp.sum(masked_gather(vv, masks, cells, W)))(v)
    deg = np.zeros((B2, n), np.float32)
    for b in range(B2):
        np.add.at(deg[b], i_np[b].reshape(-1), 1.0)
    np.testing.assert_allclose(np.asarray(grad)[..., 0], deg, atol=1e-4)
    # and d(sum scatter)/d(vals) == 1 everywhere (every edge lands once)
    grad_s = jax.grad(lambda ee: jnp.sum(
        masked_scatter_add(ee, masks, cells, W)))(vals)
    np.testing.assert_allclose(np.asarray(grad_s), 1.0, atol=1e-5)


def test_masked_int8_model_matches_bf16_masks():
    """shiftinv with mask_dtype='int8' (Pallas mask-dot path, bf16 compute)
    tracks mask_dtype='auto' (bf16 einsum masks) within bf16 rounding —
    same model, same masks content, only the mask storage/contract route
    differs."""
    from nbody_tpu import config as C
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch

    cells = 8
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=5)
    x_in, _ = split_batch(features_from_raw(raw))
    x_in = jnp.asarray(x_in)
    outs = {}
    for mdt in ("auto", "int8", "int4", "index"):
        cfg = C.ModelConfig(family="shiftinv", channels=(3, 8, 8, 3),
                            k_neighbors=6, knn_window=2, dtype="bfloat16",
                            neighbor_impl="masked", mask_dtype=mdt)
        model = build_model(cfg, box=4.0 * cells)
        params = model.init(jax.random.PRNGKey(0))
        outs[mdt] = np.asarray(jax.jit(model.apply)(params, x_in))
    for mdt in ("int8", "int4", "index"):
        np.testing.assert_allclose(outs[mdt], outs["auto"],
                                   rtol=5e-2, atol=5e-3, err_msg=mdt)


def test_idx_dot_nt_synthesis_matches_t():
    """The idx-dot gather's two one-hot synthesis orientations
    (NBODY_IDX_SYNTH 't'/'nt', chip-swept) are numerically identical:
    gather == direct indexing and the VJP scatter degree check holds
    under 'nt' too (idx_kernels._onehot_nt + standard-orientation dot)."""
    from nbody_tpu.ops.pallas import idx_kernels as IK

    B2, NB, ET, P, C2 = 2, 4, 40, 24, 8
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.integers(0, P, (B2, NB, ET)), jnp.int32)
    pat = jnp.asarray(rng.standard_normal((B2, NB, P, C2)).astype(np.float32)
                      ).astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray(IK.idx_dot_gather(pos, pat))
    # 'nt' is an explicit, trace-visible parameter (ADVICE r4) — no module
    # globals to mutate
    out = np.asarray(IK.idx_dot_gather(pos, pat, synth="nt"))
    np.testing.assert_array_equal(out, ref)
    direct = np.take_along_axis(np.asarray(pat),
                                np.asarray(pos)[..., None], 2)
    np.testing.assert_array_equal(out, direct)
    # VJP under 'nt': d(sum gather)/d(patches)[p] == in-degree of p
    grad = jax.grad(
        lambda v: jnp.sum(IK.idx_dot_gather(pos, v, synth="nt")))(pat)
    deg = np.zeros((B2, NB, P), np.float32)
    for b in range(B2):
        for nb in range(NB):
            np.add.at(deg[b, nb], np.asarray(pos)[b, nb], 1.0)
    np.testing.assert_allclose(np.asarray(grad)[..., 0], deg, atol=1e-4)


def test_masked_index_shiftinv15_matches_auto():
    """The mask-free idx-dot path under the 15-op family: its fused wide
    gathers contract at K*C-wide channel dims through the same kernels —
    outputs must match the bf16-mask einsum path (identical one-hot
    content, synthesized in VMEM instead of stored)."""
    from nbody_tpu import config as C
    from nbody_tpu.models.registry import build_model
    from nbody_tpu.data.synthetic import synthetic_raw_cubes
    from nbody_tpu.data.dataset import features_from_raw, split_batch

    cells = 8
    raw = synthetic_raw_cubes(num_samples=2, cells=cells, seed=5)
    x_in, _ = split_batch(features_from_raw(raw))
    x_in = jnp.asarray(x_in)
    outs = {}
    for mdt in ("auto", "index"):
        cfg = C.ModelConfig(family="shiftinv15", channels=(3, 8, 8, 3),
                            k_neighbors=6, knn_window=2, dtype="bfloat16",
                            neighbor_impl="masked", mask_dtype=mdt)
        model = build_model(cfg, box=4.0 * cells)
        params = model.init(jax.random.PRNGKey(0))
        outs[mdt] = np.asarray(jax.jit(model.apply)(params, x_in))
    np.testing.assert_allclose(outs["index"], outs["auto"],
                               rtol=5e-2, atol=5e-3)
