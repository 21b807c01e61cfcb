"""Checkpoint save/restore with orbax — restore actually works.

Reference twin: the tf.train.Saver wrapper (utils.py:473-486) saved every
250 steps but `restore_model_parameters` raised NotImplementedError
(utils.py:481-482) and the restore CLI flag was commented out
(utils.py:274-276).  This module closes that gap: full TrainState pytrees
(params + optimizer state + step) round-trip through orbax.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_STEP_DIR = "chkpt-{step}"


def _ckpt_path(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), _STEP_DIR.format(step=step))


def save_checkpoint(base_dir: str, state: Any, step: int) -> str:
    """Save a pytree checkpoint under base_dir/chkpt-{step}."""
    path = _ckpt_path(base_dir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(base_dir: str) -> Optional[int]:
    """Largest saved step in base_dir, or None."""
    if not os.path.isdir(base_dir):
        return None
    steps = []
    for name in os.listdir(base_dir):
        m = re.fullmatch(r"chkpt-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(base_dir: str, like: Any, step: Optional[int] = None) -> Any:
    """Restore the checkpoint at `step` (default: latest) into the structure
    of `like` (a template TrainState with correct shapes/dtypes)."""
    if step is None:
        step = latest_step(base_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
    path = _ckpt_path(base_dir, step)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    return ckptr.restore(path, abstract)
