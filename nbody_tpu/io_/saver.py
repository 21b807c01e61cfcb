"""Experiment naming, result persistence, metrics log.

Reference twin: the Saver class (utils.py:424-515) — random constellation
model tags, {EXPERIMENTS_DIR}/{name}/{Session,Results} layout, np.save of
error arrays and prediction cubes, console reports.  Additions: a
structured metrics.jsonl, and checkpoints that restore (io_/checkpoint.py).
The .npy artifacts keep the reference's exact layout — error_test.npy and
X_{i}_{truth,prediction}.npy cubes of shape (2, ntest, N, out_ch)
(reference train.py:131-132, utils.py:488-498) — so the host visualization
tooling (viz/plot_eval.py) reads them unchanged.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Optional

import numpy as np

from nbody_tpu import config as C


def random_model_tag(rng: Optional[random.Random] = None) -> str:
    """Three random constellation names (reference utils.py:452-454)."""
    rng = rng or random
    return "-".join(rng.choices(C.MODEL_TAGLIST, k=3))


def mkpath(p: str):
    os.makedirs(p, exist_ok=True)


class Saver:
    """Pathing + persistence for one experiment (reference utils.py:430-515).

    Attrs
    -----
    name    : model name, e.g. 'ZA-FPM_2_erid-ursa-hyda'
    results : '{experiments_dir}/{name}/Results'
    params  : '{experiments_dir}/{name}/Session'
    """

    def __init__(self, label_idx: int, model_tag: str = "",
                 experiments_dir: Optional[str] = None,
                 basename: str = C.MODEL_NAME_ZA, cube_name: str = C.CUBE_NAME):
        if model_tag == "":
            model_tag = random_model_tag()
        model_tag = f"{label_idx}_{model_tag}"
        self.name = basename.format(model_tag)
        self.cube = cube_name.format(label_idx)
        base = experiments_dir or C.default_experiments_dir()
        root = os.path.join(base, self.name)
        self.results = os.path.join(root, "Results")
        self.params = os.path.join(root, "Session")
        mkpath(self.results)
        mkpath(self.params)
        self._metrics_path = os.path.join(root, "metrics.jsonl")
        print(f"MODEL NAMED: {self.name}")

    # --- checkpoints (working restore — reference gap, utils.py:481) ------
    def save_checkpoint(self, state: Any, step: int) -> str:
        from nbody_tpu.io_.checkpoint import save_checkpoint
        return save_checkpoint(self.params, state, step)

    def restore_checkpoint(self, like: Any, step: Optional[int] = None) -> Any:
        from nbody_tpu.io_.checkpoint import restore_checkpoint
        return restore_checkpoint(self.params, like, step)

    # --- results (np.save layout identical to the reference) --------------
    def save_error(self, error: np.ndarray, training: bool = False) -> str:
        suffix = "training" if training else "test"
        dst = os.path.join(self.results, f"error_{suffix}")
        np.save(dst, error)
        print(f"Saved model {suffix} error: {dst}.npy")
        return dst + ".npy"

    def save_cube(self, cube: np.ndarray, ground_truth: bool = False) -> str:
        suffix = "truth" if ground_truth else "prediction"
        dst = os.path.join(self.results, f"{self.cube}_{suffix}")
        np.save(dst, cube)
        print(f"Saved {suffix} cube: {dst}.npy")
        return dst + ".npy"

    # --- metrics -----------------------------------------------------------
    def append_metrics(self, record: dict):
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # --- console reports (reference utils.py:500-515) ----------------------
    @staticmethod
    def print_checkpoint(step: int, err: float):
        print(f"Checkpoint {step + 1:>5} : {err:.6f}")

    @staticmethod
    def print_evaluation_results(err: np.ndarray, label: str = "Test"):
        tbody = [f"\n# {label} Error\n# {'=' * 17}",
                 f"  median : {np.median(err): .5f}",
                 f"    mean : {np.mean(err): .5f} +- {np.std(err): .4f} stdv"]
        print("\n".join(tbody))
