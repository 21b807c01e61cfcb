"""Continuous coverage guard: displacement growth mid-run trips the
monitor (VERDICT r2 weak #4 — the exact guard only ran on batch 0)."""

import numpy as np
import jax

from nbody_tpu import config as C
from nbody_tpu.train.trainer import Trainer

CELLS = 8


def _cfg(window=2, checkpoint_every=2):
    return C.Config(
        data=C.DataConfig(data_dir="/nonexistent", num_test=2, num_val=2,
                          cells_per_side=CELLS, synthetic_num_samples=16),
        model=C.ModelConfig(family="shiftinv", channels=(3, 8, 3),
                            k_neighbors=4, knn_window=window, seed=5),
        train=C.TrainConfig(num_iters=6, batch_size=2,
                            checkpoint_every=checkpoint_every))


def test_guard_trips_on_midrun_displacement_growth():
    t = Trainer(_cfg())
    orig = t.dataset.get_minibatch
    calls = {"n": 0}

    def growing(key, bsize):
        batch = np.asarray(orig(key, bsize)).copy()
        calls["n"] += 1
        if calls["n"] > 3:
            # inflate the ZA displacement far beyond the search window:
            # batch 0 is covered, later batches are not
            batch[..., 3:6] *= 25.0
        return batch

    t.dataset.get_minibatch = growing
    t.fit(verbose=False)
    cov = [r for r in t.metrics_log if "coverage_margin_violations" in r]
    assert cov, "no checkpoint carried the coverage monitor"
    assert cov[0]["coverage_margin_violations"] == 0      # healthy early
    assert cov[-1]["coverage_margin_violations"] > 0      # tripped late
    exact = [r for r in t.metrics_log if "graph_coverage_violations" in r]
    assert exact and exact[-1]["graph_coverage_violations"] > 0


def test_guard_quiet_on_healthy_run():
    t = Trainer(_cfg())
    t.fit(verbose=False)
    cov = [r for r in t.metrics_log if "coverage_margin_violations" in r]
    assert cov and all(r["coverage_margin_violations"] == 0 for r in cov)
    assert not any("graph_coverage_violations" in r for r in t.metrics_log)


def test_guard_rearms_after_recovery():
    """A second, later violation episode gets its own exact count: the
    confirmation latch re-arms when margins return to zero (VERDICT r3
    weak #7)."""
    cfg = _cfg()
    cfg = C.Config(data=cfg.data, model=cfg.model,
                   train=C.TrainConfig(num_iters=8, batch_size=2,
                                       checkpoint_every=2))
    t = Trainer(cfg)
    orig = t.dataset.get_minibatch
    calls = {"n": 0}

    def episodic(key, bsize):
        batch = np.asarray(orig(key, bsize)).copy()
        calls["n"] += 1
        # checkpoints monitor calls 2/4/6/8: healthy, TRIP, healthy, TRIP
        if calls["n"] in (3, 4, 7, 8):
            batch[..., 3:6] *= 25.0
        return batch

    t.dataset.get_minibatch = episodic
    t.fit(verbose=False)
    ckpts = [r for r in t.metrics_log if "coverage_margin_violations" in r]
    assert [c["coverage_margin_violations"] > 0 for c in ckpts] == \
        [False, True, False, True]
    confirmed = [c for c in ckpts if "graph_coverage_violations" in c]
    assert len(confirmed) == 2, \
        "each violation episode must get its own exact confirmation"
    assert all(c["graph_coverage_violations"] > 0 for c in confirmed)
