import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from nbody_tpu.viz.plot_eval import (
    get_mask, calculate_timestep, get_linear_vel_pred, l2_dist,
    plot_model_vs_linear, plot_multi_model, plot_results_dir)
from nbody_tpu.viz.vis_pointcloud import volumize_ptc, volumize_arrow


def _cubes(s=2, n=128, seed=0):
    rng = np.random.default_rng(seed)
    truth = rng.uniform(0, 1, (s, n, 3)).astype(np.float32)
    pred = truth + 0.01 * rng.normal(size=(s, n, 3)).astype(np.float32)
    vel = rng.normal(size=(s, n, 3)).astype(np.float32)
    return truth, pred, vel


def test_mask_strips_boundary_shell():
    x = np.array([[[0.05, 0.5, 0.5], [0.5, 0.5, 0.5], [0.95, 0.5, 0.5]]])
    m = get_mask(x, 0.1)
    np.testing.assert_array_equal(m, [[False, True, False]])


def test_linear_velocity_baseline_numpy():
    truth, _, vel = _cubes()
    t_true = 0.25
    x_in = np.concatenate([truth, vel], -1)
    x_out = np.concatenate([truth + t_true * vel, vel], -1)
    t = calculate_timestep(x_in, x_out)
    assert abs(t - t_true) < 1e-5
    pred = get_linear_vel_pred(x_in, t)
    assert l2_dist(pred, x_out[..., :3]).max() < 1e-5


def test_plot_single_and_multi(tmp_path):
    truth, pred, vel = _cubes()
    x_in = np.concatenate([truth, vel], -1)
    p1 = str(tmp_path / "single.png")
    plot_model_vs_linear(truth, pred, x_in, boundary=0.1, title="t", save_path=p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "multi.png")
    plot_multi_model([truth, truth], [pred, pred], ["a", "b"], save_path=p2)
    assert os.path.getsize(p2) > 0


def test_plot_results_dir(tmp_path):
    truth, pred, _ = _cubes()
    cube = np.stack([truth, pred])           # (2, S, N, 3) Saver layout
    np.save(tmp_path / "X_0_prediction.npy", cube)
    p = str(tmp_path / "res.png")
    plot_results_dir(str(tmp_path), "X_0", save_path=p)
    assert os.path.getsize(p) > 0


def test_pointcloud_renders(tmp_path):
    truth, pred, vel = _cubes(s=1)
    p1 = str(tmp_path / "ptc.png")
    volumize_ptc(truth[0], boundary=0.1, save_path=p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "arrows.png")
    volumize_arrow(truth[0],
                   {"truth": (pred[0] - truth[0], "r"),
                    "vel": (0.01 * vel[0], "g")},
                   boundary=0.1, subsample=4, save_path=p2)
    assert os.path.getsize(p2) > 0


def test_get_bins_percentile_bound():
    """Reference get_bins (plot_eval.py:69-77): 500 edges from 0 to
    min(90th percentile, mean + 2*std)."""
    from nbody_tpu.viz.plot_eval import get_bins
    rng = np.random.default_rng(0)
    # fat-tailed sample: the p90 bound must kick in below the max
    d = np.concatenate([rng.normal(1.0, 0.1, 1000), [50.0, 80.0]])
    bins = get_bins(d)
    assert bins.shape == (500,)
    assert bins[0] == 0.0
    want_upper = min(np.percentile(d, 90), d.mean() + 2 * d.std())
    np.testing.assert_allclose(bins[-1], want_upper)
    assert bins[-1] < 5.0  # outliers excluded


def test_plot_masks_by_input_not_truth(tmp_path):
    """Masking uses the INPUT cube's boundary shell (reference
    plot_eval.py:186-199), not the truth coords."""
    from nbody_tpu.viz import plot_eval as pe
    rng = np.random.default_rng(1)
    s, n = 2, 64
    x_input = rng.uniform(0, 1, (s, n, 6)).astype(np.float32)
    # truth displaced OUTSIDE the shell for some input-inside particles
    truth = np.clip(x_input[..., :3] + 0.05, 0, 1)
    pred = truth + 0.01

    calls = {}
    orig = pe.get_mask

    def spy(x, boundary=0.1):
        calls["arg"] = x
        return orig(x, boundary)

    pe.get_mask, _ = spy, None
    try:
        fig = pe.plot_model_vs_linear(truth, pred, x_input=x_input,
                                      boundary=0.1)
    finally:
        pe.get_mask = orig
    np.testing.assert_array_equal(calls["arg"], x_input[..., :3])
    import matplotlib.pyplot as plt
    plt.close(fig)
