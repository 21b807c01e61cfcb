"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. Integer payloads through the TPU gather kernels must use the exact
   (f32) path — the default bf16 fast path rounds ids above 256 and
   silently corrupts the shiftinv15 symmetrized graph.
2. Edge featurizers must not gather ABSOLUTE positions through the bf16
   fast path (O(0.5)-unit position-dependent quantization); they gather
   small min-image displacements and reconstruct neighbor positions from
   elementwise lattice-site arithmetic instead.
3. band='auto' must resolve to None (no structural assumption) when the
   kNN search is exact or the lattice assumption fails.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nbody_tpu import config as C
from nbody_tpu.models.registry import _effective_band
from nbody_tpu.ops.graph_features import (lattice_site_positions,
                                          neighbor_positions)
from nbody_tpu.ops.pallas.banded_kernels import banded_gather_pallas
from nbody_tpu.data.grid import grid_positions_np


def test_exact_kernel_path_preserves_large_integer_ids():
    """fast=False (the exact=True route of neighbor_gather) returns ids
    beyond bf16's 256-integer range exactly; fast=True does not (the bug)."""
    n, k = 4096, 6
    rng = np.random.default_rng(0)
    rel = rng.integers(-50, 50, (1, n, k))
    idx = ((np.arange(n)[None, :, None] + rel) % n).astype(np.int32)
    payload = jnp.asarray(idx, jnp.float32)  # gather the ids themselves

    out_exact = np.asarray(banded_gather_pallas(
        payload, jnp.asarray(idx), band=256, interpret=True, fast=False))
    want = idx[0][idx[0]][None]  # (1, n, k, k)
    np.testing.assert_array_equal(np.round(out_exact).astype(np.int64), want)

    out_fast = np.asarray(banded_gather_pallas(
        payload, jnp.asarray(idx), band=256, interpret=True, fast=True))
    assert np.any(np.round(out_fast).astype(np.int64) != want), \
        "bf16 fast path unexpectedly exact — test payload too small"


def test_lattice_site_positions_match_grid():
    cells, box = 8, 32.0
    sites = grid_positions_np(cells, box)
    got = np.asarray(lattice_site_positions(
        jnp.arange(cells ** 3, dtype=jnp.int32), cells, box))
    np.testing.assert_allclose(got, sites, atol=1e-6)


def test_neighbor_positions_semantics_cube():
    """neighbor_positions == pos[idx] (mod box) for grid-ordered cubes."""
    cells, box = 8, 32.0
    n, k = cells ** 3, 5
    rng = np.random.default_rng(1)
    pos = grid_positions_np(cells, box) + rng.normal(
        0, 1.0, (n, 3)).astype(np.float32)
    rel = rng.integers(-20, 20, (1, n, k))
    idx = ((np.arange(n)[None, :, None] + rel) % n).astype(np.int32)
    got = np.asarray(neighbor_positions(
        jnp.asarray(pos)[None], jnp.asarray(idx), box))
    want = pos[idx[0]][None]
    # equal modulo the box (the reconstruction wraps displacements)
    d = got - want
    d -= box * np.round(d / box)
    np.testing.assert_allclose(d, 0, atol=1e-4)


def test_displacement_gather_beats_position_gather_in_bf16():
    """The measured motivation for neighbor_positions: bf16-gathering
    displacements (~1 unit) is far more accurate than bf16-gathering
    absolute coordinates (~box units)."""
    cells, box = 8, 128.0  # big box = big absolute coordinates
    n, k = cells ** 3, 4
    rng = np.random.default_rng(2)
    sites = grid_positions_np(cells, box)
    disp = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pos = sites + disp
    rel = rng.integers(-10, 10, (1, n, k))
    idx = ((np.arange(n)[None, :, None] + rel) % n).astype(np.int32)
    band = 512

    abs_out = np.asarray(banded_gather_pallas(
        jnp.asarray(pos)[None], jnp.asarray(idx), band, interpret=True,
        fast=True))
    disp_out = np.asarray(banded_gather_pallas(
        jnp.asarray(disp)[None], jnp.asarray(idx), band, interpret=True,
        fast=True))
    err_abs = np.abs(abs_out - pos[idx[0]][None]).max()
    err_disp = np.abs(disp_out - disp[idx[0]][None]).max()
    assert err_disp * 10 < err_abs, (err_disp, err_abs)
    assert err_disp < 2e-2


def test_redshift_table_matches_reference():
    """The 20-snapshot vocabulary z = 9.0 -> 0.0
    (reference visualization/plot_eval.py:19-21)."""
    want = [9.0000, 4.7897, 3.2985, 2.4950, 1.9792, 1.6141, 1.3385,
            1.1212, 0.9438, 0.7955, 0.6688, 0.5588, 0.4620, 0.3758,
            0.2983, 0.2280, 0.1639, 0.1049, 0.0505, 0.0000]
    assert C.REDSHIFTS == want
    assert len(C.REDSHIFTS) == 20
    assert C.REDSHIFTS[-1] == 0.0


def test_effective_band_none_for_exact_search():
    cells = 8
    cfg = C.ModelConfig(family="shiftinv", knn_method="exact")
    assert _effective_band(cfg, 512, cells ** 3, cells) is None
    cfg = C.ModelConfig(family="shiftinv", knn_method="lattice")
    # lattice on a full cube keeps the band ...
    assert _effective_band(cfg, 512, cells ** 3, cells) == 512
    # ... but the non-cube fallback (exact search) must drop it
    assert _effective_band(cfg, 512, 100, cells) is None
    cfg = C.ModelConfig(family="shiftinv", knn_method="banded")
    assert _effective_band(cfg, 512, 100, cells) == 512


def test_block_dispatch_falls_back_on_indivisible_cells():
    """cells not divisible by the CORE block must not trip an assert —
    _block_ok routes to the banded path instead (ADVICE.md low)."""
    from nbody_tpu.ops.banded import _block_ok
    assert _block_ok(8 ** 3, (8, 2))
    assert not _block_ok(12 ** 3, (12, 2))   # 12 % 8 != 0
    assert not _block_ok(4 ** 3, (4, 2))     # 4 % 8 != 0
    assert not _block_ok(100, (8, 2))        # not a full cube
    assert not _block_ok(8 ** 3, None)


# ---------------------------------------------------------------------------
# Graph-coverage guard (the anti-silent-edge-dropping runtime check)
# ---------------------------------------------------------------------------

def _features(cells, b, disp_scale, seed=0):
    box = 4.0 * cells
    n = cells ** 3
    rng = np.random.default_rng(seed)
    q = grid_positions_np(cells, box)
    za = (disp_scale * rng.normal(size=(b, n, 3))).astype(np.float32)
    fpm = np.zeros_like(za)
    return np.concatenate(
        [np.broadcast_to(q[None] - box / 2.0, za.shape), za, fpm],
        axis=-1).astype(np.float32)


def test_coverage_violations_zero_on_tame_data():
    from nbody_tpu.models.registry import coverage_violations
    cells = 8
    cfg = C.ModelConfig(family="shiftinv", k_neighbors=4, knn_method="lattice",
                        knn_window=2)
    x = _features(cells, 2, disp_scale=0.5)
    assert coverage_violations(cfg, 4.0 * cells, x[..., :6]) == 0


def test_coverage_violations_detects_big_displacements():
    from nbody_tpu.models.registry import coverage_violations
    cells = 8
    cfg = C.ModelConfig(family="shiftinv", k_neighbors=4, knn_method="lattice",
                        knn_window=2)
    # displacements of ~3 grid spacings blow past the window-2 safe margin
    x = _features(cells, 2, disp_scale=12.0)
    assert coverage_violations(cfg, 4.0 * cells, x[..., :6]) > 0


def test_coverage_violations_banded_vs_exact_graph():
    from nbody_tpu.models.registry import coverage_violations
    cells = 8
    # a deliberately tiny band cannot hold the exact graph's edges
    cfg = C.ModelConfig(family="shiftinv", k_neighbors=8, knn_method="banded",
                        band=4)
    x = _features(cells, 1, disp_scale=0.5)
    assert coverage_violations(cfg, 4.0 * cells, x[..., :6]) > 0


def test_trainer_warns_on_coverage_violation(capsys):
    from nbody_tpu.train.trainer import Trainer
    cfg = C.Config(
        data=C.DataConfig(data_dir="/nonexistent", num_test=2, num_val=2,
                          cells_per_side=8, synthetic_num_samples=8),
        model=C.ModelConfig(family="shiftinv", channels=(3, 8, 3),
                            k_neighbors=4, knn_window=2),
        train=C.TrainConfig(num_iters=1, batch_size=2))
    t = Trainer(cfg)
    x = jnp.asarray(_features(8, 2, disp_scale=12.0)[..., :6])
    v = t.check_graph_coverage(x)
    assert v > 0
    out = capsys.readouterr().out
    assert "graph coverage violated" in out
    assert any("graph_coverage_violations" in r for r in t.metrics_log)


def _bench_module(monkeypatch):
    import sys as _sys
    _sys.path.insert(0, "/root/repo")
    import bench
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        bench, "load_or_measure_baseline",
        lambda: {"graph": {"particle_steps_per_sec": 1.0},
                 "graph16": {"particle_steps_per_sec": 2.0}})
    return bench


def test_bench_refuses_on_coverage_error(monkeypatch, capsys):
    """bench.main must exit nonzero WITHOUT printing a JSON result line
    when the coverage guard trips."""
    import json
    import pytest
    bench = _bench_module(monkeypatch)
    monkeypatch.setattr(bench, "tunnel_alive", lambda: True)

    def boom(timeout_s, force_cpu, cells=32):
        raise bench.CoverageError("COVERAGE_VIOLATIONS=7: test")

    monkeypatch.setattr(bench, "_measure_in_subprocess", boom)
    with pytest.raises(SystemExit):
        bench.main()
    captured = capsys.readouterr()
    assert '"vs_baseline"' not in captured.out
    assert "REFUSING" in captured.err


def test_bench_dead_probe_goes_straight_to_fallback(monkeypatch, capsys):
    """VERDICT r3 #1: a dead tunnel probe must skip the TPU attempts
    entirely and land the honestly-labeled CPU fallback number against
    the same-size denominator."""
    import json
    bench = _bench_module(monkeypatch)
    monkeypatch.setattr(bench, "tunnel_alive", lambda: False)
    calls = []

    def fake_measure(timeout_s, force_cpu, cells=32):
        calls.append((force_cpu, cells))
        assert force_cpu, "dead probe must not attempt a TPU measurement"
        return 4.0, [0.5, 0.6, 0.7]

    monkeypatch.setattr(bench, "_measure_in_subprocess", fake_measure)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls == [(True, bench.FALLBACK_CELLS)]
    assert "CPU_FALLBACK_tpu_tunnel_down" in rec["metric"]
    assert rec["vs_baseline"] == 2.0          # 4.0 / graph16's 2.0


def test_bench_live_probe_reports_tpu_number(monkeypatch, capsys):
    """A live probe runs the full TPU measurement and scores against the
    32^3 denominator with no fallback labeling."""
    import json
    bench = _bench_module(monkeypatch)
    monkeypatch.setattr(bench, "tunnel_alive", lambda: True)

    def fake_measure(timeout_s, force_cpu, cells=32):
        assert not force_cpu and cells == 32
        return 10.0, [0.1, 0.2, 0.3]

    monkeypatch.setattr(bench, "_measure_in_subprocess", fake_measure)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "FALLBACK" not in rec["metric"]
    assert rec["vs_baseline"] == 10.0
    assert rec["step_secs_sorted"] == [0.1, 0.2, 0.3]


def test_host_exact_knn_matches_device_exact():
    """The large-N coverage path (host sklearn ghost-padding search,
    baseline_cpu.pbc_knn_host with the adaptive ghost shell) must agree
    with the on-device exact search — registry.coverage_violations swaps
    to it above 100k particles because the 64^3 O(N^2) device program has
    crashed this machine's TPU worker."""
    import numpy as np
    import jax.numpy as jnp
    from nbody_tpu.baseline_cpu import pbc_knn_host
    from nbody_tpu.ops.knn import knn_periodic_batch

    rng = np.random.default_rng(3)
    cells, k = 8, 9
    n = cells ** 3
    base = (np.indices((cells,) * 3).reshape(3, -1).T + 0.5) / cells
    pos = np.mod(base + rng.normal(scale=0.02, size=(2, n, 3)),
                 1.0).astype(np.float32)
    thr = max(0.1, 4.0 * n ** (-1.0 / 3.0))  # registry's adaptive shell
    ih = np.stack([pbc_knn_host(p, k, boundary_threshold=thr) for p in pos])
    ie = np.asarray(knn_periodic_batch(jnp.asarray(pos), k))
    assert (ih[..., 0] == np.arange(n)).all()  # self at slot 0

    def ksum(idx):
        out = np.zeros(idx.shape[:2])
        for b in range(2):
            d = pos[b][idx[b]] - pos[b][:, None, :]
            d -= np.round(d)
            out[b] = np.sum(d.astype(np.float64) ** 2, axis=(1, 2))
        return out

    np.testing.assert_allclose(ksum(ih), ksum(ie), atol=1e-6)
