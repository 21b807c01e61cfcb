"""Offline evaluation histograms vs the linear-velocity baseline.

Reference twin: visualization/plot_eval.py (C21 in SURVEY.md §2) — loads
result cubes saved by the trainer, strips a boundary shell, builds the
least-squares linear-velocity baseline, and plots L2-distance histograms
with median markers, single and multi-model layouts.

Host-side only (numpy + matplotlib); consumes the np.save artifacts written
by io_.Saver in the reference's layout, so it works on either framework's
outputs.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

# 20 redshift snapshots, z = 9.0 -> 0.0 (reference plot_eval.py:19-21)
from nbody_tpu.config import REDSHIFTS  # noqa: F401

CUBE_FNAME = "X_{}-{}_{}"  # zx-zy pair naming (reference plot_eval.py:16)


def load_cube(path: str) -> np.ndarray:
    return np.load(path)


def get_mask(x: np.ndarray, boundary: float = 0.1) -> np.ndarray:
    """Mask particles inside the inner cube, away from the boundary shell
    (reference plot_eval.py:48-56).  x (..., N, 3) coords in [0, 1]."""
    lower, upper = boundary, 1.0 - boundary
    return np.all((x >= lower) & (x <= upper), axis=-1)


def get_bins(dist: np.ndarray, num: int = 500) -> np.ndarray:
    """Percentile-driven histogram bin edges (reference get_bins,
    plot_eval.py:69-77): upper bound = min(90th percentile, mean + 2*std),
    500 bins from 0 — what keeps comparison plots readable when the
    baseline has fat tails."""
    dist = np.asarray(dist).reshape(-1)
    q = np.percentile(dist, 90)
    mu, std = np.mean(dist), np.std(dist)
    upper = min(q, mu + 2.0 * std)
    return np.linspace(0.0, upper, num)


def calculate_timestep(x_in: np.ndarray, x_true: np.ndarray) -> float:
    """Least-squares timestep fit t: ||vel*t - dpos|| min
    (reference plot_eval.py:85-88)."""
    diff = (x_true[..., :3] - x_in[..., :3]).reshape(-1)
    vel = x_in[..., 3:].reshape(-1, 1)
    t, *_ = np.linalg.lstsq(vel, diff, rcond=None)
    return float(t[0])


def get_linear_vel_pred(x_in: np.ndarray, timestep: float) -> np.ndarray:
    """pos + t*vel (reference plot_eval.py:90-93)."""
    return x_in[..., :3] + timestep * x_in[..., 3:]


def l2_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.sqrt(np.sum(np.square(a - b), axis=-1))


def angle(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Per-row angle between vector fields, in degrees (reference angle(),
    plot_eval.py:78-81) — e.g. the angular error between predicted and true
    displacement vectors.  v1, v2 (..., 3) -> (...,).

    Deviation from the reference: the cosine is clipped to [-1, 1] before
    arccos (f32 roundoff on parallel vectors otherwise yields NaN) and
    zero-length rows divide against eps instead of warning."""
    v1, v2 = np.asarray(v1), np.asarray(v2)
    norms = np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1)
    cos = np.sum(v1 * v2, axis=-1) / np.maximum(norms, 1e-30)
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def plot_angle_hist(truth_disp: np.ndarray, pred_disp: np.ndarray,
                    bins: int = 90, title: str = "",
                    save_path: Optional[str] = None):
    """Histogram of angular errors between predicted and true displacement
    vectors — the eval view the reference's angle() helper existed for
    (plot_eval.py:78-81; it had no caller there, completing C21)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ang = angle(truth_disp, pred_disp).reshape(-1)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.hist(ang, bins=np.linspace(0.0, 180.0, bins + 1), alpha=0.5,
            color=MODEL_COLORS[0],
            label=series_label(ang, "angular error (deg)"))
    ax.axvline(float(np.median(ang)), color=MODEL_COLORS[0],
               linestyle="--", linewidth=1)
    ax.legend(prop={"family": "monospace", "size": 9})
    ax.grid(True, alpha=0.5, ls="--")
    ax.set_xlabel("Angle (degrees)")
    ax.set_ylabel("count")
    ax.set_title(title)
    if save_path:
        save_plot(fig, save_path)
    return fig


# Series styling (reference plot_eval.py:99-105): red baseline, blue/green
# 'Updated'/'Previous' model series, alpha 0.5
LINEAR_VEL_LABEL = "linear vel"
LINEAR_VEL_COLOR = "r"
MODEL_LABELS = ["Updated", "Previous"]
MODEL_COLORS = ["b", "g"]


def pair_title(zx: int, zy: int) -> str:
    """Redshift-pair panel title (reference label_hist_ax,
    plot_eval.py:109-121): snapshot indices plus their redshift values."""
    return ("Error comparison, {:>2}-{:>2}: {:.4f} --> {:.4f}"
            .format(zx, zy, REDSHIFTS[zx], REDSHIFTS[zy]))


def series_label(dist: np.ndarray, tag: str) -> str:
    """Monospace-aligned legend entry with the series median
    (reference get_label, plot_eval.py:123-129)."""
    return "{:>20}: {:.6f}".format(tag, float(np.median(dist)))


def plot_hist_ax(ax, dists: Sequence[np.ndarray], labels: Sequence[str],
                 colors: Optional[Sequence[str]] = None, bins=None,
                 rs_pair: Optional[Tuple[int, int]] = None):
    """Overlaid L2-distance histograms with median legend entries
    (reference plot_hist_ax, plot_eval.py:130-147).  Bin edges default to
    get_bins of the FIRST series (the baseline), shared by every series —
    the reference's convention (plot_eval.py:131-132).  rs_pair titles the
    panel by redshift pair (label_hist_ax, plot_eval.py:109-121)."""
    colors = colors or [f"C{i}" for i in range(len(dists))]
    if bins is None:
        bins = get_bins(dists[0])
    for d, lab, col in zip(dists, labels, colors):
        d = d.reshape(-1)
        med = float(np.median(d))
        ax.hist(d, bins=bins, alpha=0.5, color=col, label=series_label(d, lab))
        ax.axvline(med, color=col, linestyle="--", linewidth=1)
    leg = ax.legend(prop={"family": "monospace", "size": 9})
    for line in leg.get_lines():
        line.set_linewidth(1)
    ax.grid(True, alpha=0.5, ls="--")
    ax.set_xlabel("Distance (L2)")
    ax.set_ylabel("count")
    if rs_pair is not None:
        ax.set_title(pair_title(*rs_pair), size="medium", style="italic")


def plot_model_vs_linear(truth: np.ndarray, pred: np.ndarray,
                         x_input: Optional[np.ndarray] = None,
                         boundary: Optional[float] = None,
                         title: str = "", save_path: Optional[str] = None):
    """Single-model comparison figure (reference plot_side_by_side_singles,
    plot_eval.py:180-207).  truth/pred (S, N, 3); x_input (S, N, 6) enables
    the linear-velocity baseline curve."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if boundary is not None:
        # mask every series by the INPUT cube's boundary shell when inputs
        # are available (reference plot_eval.py:186-199 masks x_input) —
        # the same particle set for baseline, truth, and prediction even
        # when displacements cross the shell
        base = x_input[..., :3] if x_input is not None else truth
        mask = get_mask(base, boundary)
    else:
        mask = np.ones(truth.shape[:-1], bool)

    dists = [l2_dist(pred, truth)[mask]]
    labels = ["model"]
    if x_input is not None:
        t = calculate_timestep(x_input, np.concatenate(
            [truth, x_input[..., 3:]], axis=-1))
        lin = get_linear_vel_pred(x_input, t)
        dists.insert(0, l2_dist(lin, truth)[mask])
        labels.insert(0, "linear velocity")

    fig, ax = plt.subplots(figsize=(8, 5))
    plot_hist_ax(ax, dists, labels)
    ax.set_title(title)
    if save_path:
        save_plot(fig, save_path)
    return fig


def _panel_dists(x_input: np.ndarray, truth: np.ndarray,
                 preds: Sequence[np.ndarray], boundary: Optional[float]):
    """Shared per-panel pipeline (reference plot_multi_single /
    plot_multiStep_comp, plot_eval.py:149-178, 210-246): mask every series
    by the INPUT cube's boundary shell, fit the linear-velocity timestep on
    the masked data, return ([baseline dist, model dists...], labels)."""
    if boundary is not None:
        mask = get_mask(x_input[..., :3], boundary)
    else:
        mask = np.ones(truth.shape[:-1], bool)
    t = calculate_timestep(x_input[mask], np.concatenate(
        [truth, x_input[..., 3:]], axis=-1)[mask])
    lin = get_linear_vel_pred(x_input, t)
    dists = [l2_dist(lin, truth)[mask]]
    labels = [LINEAR_VEL_LABEL]
    colors = [LINEAR_VEL_COLOR]
    for i, pred in enumerate(preds):
        dists.append(l2_dist(pred, truth)[mask])
        labels.append(MODEL_LABELS[i] if i < len(MODEL_LABELS)
                      else f"model {i}")
        colors.append(MODEL_COLORS[i] if i < len(MODEL_COLORS) else f"C{i}")
    return dists, labels, colors


def plot_multi_model(x_inputs: Sequence[np.ndarray],
                     truths: Sequence[np.ndarray],
                     model_preds: Sequence[Sequence[np.ndarray]],
                     rs_pairs: Sequence[Tuple[int, int]],
                     model_names: Optional[Sequence[str]] = None,
                     boundary: Optional[float] = 0.1,
                     ncols: int = 2,
                     save_path: Optional[str] = None):
    """Multi-model / multi-redshift-pair comparison grid (reference
    plot_multi_single + plot_multiStep_comp, plot_eval.py:149-178,210-246).

    One panel per redshift pair; EVERY panel overlays the linear-velocity
    baseline (red) plus all model series ('Updated'/'Previous', blue/green)
    with monospace median legends, titled by its redshift pair.

    x_inputs[p] (S, N, 6): pair p's input positions+velocities;
    truths[p]   (S, N, 3): pair p's target positions;
    model_preds[m][p] (S, N, 3): model m's prediction for pair p;
    rs_pairs[p]: (zx, zy) snapshot indices into REDSHIFTS.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    num_pairs = len(rs_pairs)
    ncols = min(ncols, num_pairs)
    nrows = (num_pairs + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(7 * ncols, 5 * nrows),
                             squeeze=False)
    for p, pair in enumerate(rs_pairs):
        ax = axes[p // ncols][p % ncols]
        preds_p = [mp[p] for mp in model_preds]
        dists, labels, colors = _panel_dists(x_inputs[p], truths[p],
                                             preds_p, boundary)
        if model_names:
            labels = [labels[0]] + list(model_names)
        plot_hist_ax(ax, dists, labels, colors=colors, rs_pair=pair)
    for p in range(num_pairs, nrows * ncols):
        axes[p // ncols][p % ncols].axis("off")
    fig.tight_layout()
    if save_path:
        save_plot(fig, save_path)
    return fig


def plot_multistep_comparison(truth_chain: Sequence[np.ndarray],
                              vel_chain: Sequence[np.ndarray],
                              model_preds: Sequence[Sequence[np.ndarray]],
                              rs_indices: Sequence[int],
                              model_names: Optional[Sequence[str]] = None,
                              boundary: Optional[float] = 0.1,
                              save_path: Optional[str] = None):
    """Rollout-chain comparison (reference plot_multiStep_comp,
    plot_eval.py:210-246): panel p uses snapshot p of the truth chain as
    the input and snapshot p+1 as the target, so a chained multi-step
    rollout is judged per hop against the per-hop linear baseline.

    truth_chain[i] (S, N, 3) positions at rs_indices[i];
    vel_chain[i]   (S, N, 3) velocities at rs_indices[i];
    model_preds[m][p] (S, N, 3): model m's prediction for hop p.
    """
    x_inputs = [np.concatenate([truth_chain[i], vel_chain[i]], axis=-1)
                for i in range(len(truth_chain) - 1)]
    truths = [truth_chain[i + 1] for i in range(len(truth_chain) - 1)]
    rs_pairs = [(rs_indices[i], rs_indices[i + 1])
                for i in range(len(rs_indices) - 1)]
    return plot_multi_model(x_inputs, truths, model_preds, rs_pairs,
                            model_names=model_names, boundary=boundary,
                            save_path=save_path)


def save_plot(fig, path: str, dpi: int = 700):
    """PNG save at the reference's dpi (plot_eval.py:37-42)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")


def plot_results_dir(results_dir: str, cube_stem: str,
                     save_path: Optional[str] = None):
    """Plot straight from a Saver Results/ directory: loads the
    (2, S, N, out) prediction cube (slot 0 truth, slot 1 prediction)."""
    cube = np.load(os.path.join(results_dir, f"{cube_stem}_prediction.npy"))
    return plot_model_vs_linear(cube[0][..., :3], cube[1][..., :3],
                                title=cube_stem, save_path=save_path)
