"""Multi-step autoregressive rollout across the redshift chain.

The reference only *implies* this capability: models are trained per
redshift pair (zx -> zy) and the eval tooling compares chained multi-step
predictions (visualization/plot_eval.py:210-246, REDSHIFTS table
plot_eval.py:19-21, cube naming 'X_{}-{}_{}' plot_eval.py:16) — but no
rollout code exists in the training stack (SURVEY.md §3.4).  Here it is a
first-class jitted program: a lax.scan over the chain of per-pair model
parameters, each step feeding its corrected displacement into the next,
with the periodic kNN graph rebuilt on device inside every step (for graph
families) — BASELINE.json config 3.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nbody_tpu.models.registry import Model
from nbody_tpu.physics.losses import loss_za


def stack_params(params_seq: Sequence[Any]):
    """Stack a list of same-structure param pytrees on a leading step axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_seq)


def make_rollout(model: Model, jit: bool = True,
                 coverage_fn: Callable = None) -> Callable:
    """Build rollout(stacked_params, x_in0) -> (final_disp, trajectory).

    stacked_params: pytree with leading axis T (one slice per redshift pair);
    x_in0 (b, N, 6) = [centered grid, initial displacement].
    Returns final displacement (b, N, 3) and the trajectory (T, b, N, 3) of
    displacements after each step.

    coverage_fn (optional): jittable (x_in (b, N, 6)) -> scalar count,
    evaluated on EVERY step's input inside the scan — displacements grow
    along a rollout chain, so the lattice search window that covered step 0
    can stop covering later steps (the continuous-guard class,
    trainer._make_coverage_margin_fn).  When given, rollout returns
    (final, (traj, per_step_counts)).
    """

    def rollout(stacked_params, x_in0):
        q = x_in0[..., :3]

        def step(disp, params):
            x_in = jnp.concatenate([q, disp], axis=-1)
            new_disp = disp + model.apply(params, x_in)
            if coverage_fn is not None:
                return new_disp, (new_disp, coverage_fn(x_in))
            return new_disp, new_disp

        final, traj = jax.lax.scan(step, x_in0[..., 3:6], stacked_params)
        return final, traj

    return jax.jit(rollout) if jit else rollout


def rollout_mse(model: Model, stacked_params, x_in0: jnp.ndarray,
                truth_traj: jnp.ndarray) -> jnp.ndarray:
    """Per-step position MSE of the rollout vs a truth displacement
    trajectory (T, b, N, 3) — the BASELINE.json rollout quality metric."""
    _, traj = make_rollout(model, jit=False)(stacked_params, x_in0)
    return jax.vmap(loss_za)(traj, truth_traj)
