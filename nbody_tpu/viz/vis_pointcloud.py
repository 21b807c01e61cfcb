"""3D point-cloud and displacement-field renders.

Reference twin: visualization/vis_pointcloud.py (C22 in SURVEY.md §2) —
mayavi points3d/quiver3d of cubes with a wireframe box, arrow fields for
input/truth/predicted displacements, boundary-shell masking.  Mayavi/VTK is
not available here; matplotlib's 3D toolkit renders the same content
(points, quivers, unit-cube wireframe, interior masking, PNG save).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from nbody_tpu.viz.plot_eval import get_mask


def _wire_cube(ax, box: float = 1.0, color: str = "k", lw: float = 0.6):
    """Wireframe box edges (reference draws a unit-cube frame)."""
    r = [0.0, box]
    import itertools
    for s, e in itertools.combinations(
            [np.array(p) for p in itertools.product(r, r, r)], 2):
        if np.sum(np.abs(s - e) > 0) == 1:    # axis-aligned edge
            ax.plot(*zip(s, e), color=color, linewidth=lw)


def volumize_ptc(pos: np.ndarray, boundary: Optional[float] = None,
                 box: float = 1.0, color: str = "C0", size: float = 1.0,
                 save_path: Optional[str] = None, ax=None):
    """Scatter render of one cube (reference volumize_ptc)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure(figsize=(7, 7))
        ax = fig.add_subplot(111, projection="3d")
    mask = get_mask(pos / box, boundary) if boundary else np.ones(len(pos), bool)
    p = pos[mask]
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=size, c=color, depthshade=False)
    _wire_cube(ax, box)
    ax.set_axis_off()
    if save_path:
        _save(ax.figure, save_path)
    return ax


def volumize_arrow(pos: np.ndarray, fields: dict, boundary: Optional[float] = None,
                   box: float = 1.0, length: float = 1.0, subsample: int = 1,
                   save_path: Optional[str] = None):
    """Quiver render of displacement fields (reference volumize_arrow):
    fields maps label -> ((N,3) vectors, color), e.g.
    {"truth": (d_true, "r"), "input": (vel, "g"), "pred": (d_hat, "b")}."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    mask = get_mask(pos / box, boundary) if boundary else np.ones(len(pos), bool)
    sel = np.where(mask)[0][::subsample]
    p = pos[sel]
    for label, (vec, color) in fields.items():
        v = vec[sel]
        ax.quiver(p[:, 0], p[:, 1], p[:, 2], v[:, 0], v[:, 1], v[:, 2],
                  color=color, length=length, normalize=False, label=label,
                  linewidth=0.5)
    _wire_cube(ax, box)
    ax.legend()
    ax.set_axis_off()
    if save_path:
        _save(fig, save_path)
    return fig


def _save(fig, path: str, dpi: int = 300):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
