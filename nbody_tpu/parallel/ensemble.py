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
from nbody_tpu.parallel.mesh import DATA_AXIS
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


def ensemble_apply(model: Model, stacked_params, x_in: jnp.ndarray) -> jnp.ndarray:
    """(E-stacked params, shared batch) -> (E, b, N, 3) predictions."""
    return jax.vmap(model.apply, in_axes=(0, None))(stacked_params, x_in)


def make_ensemble_train_step(model: Model, optimizer: optax.GradientTransformation,
                             mesh: Mesh, loss_fn: Callable = loss_za):
    """Jitted (stacked state, shared batch) -> (state', per-member losses)."""
    esh = ensemble_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def member_step(params, opt_state, x_in, y_true):
        def loss(p):
            return loss_fn(model.apply(p, x_in), y_true)

        loss_val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss_val

    def step(state: TrainState, x_in, y_true):
        params, opt_state, losses = jax.vmap(
            member_step, in_axes=(0, 0, None, None))(
            state.params, state.opt_state, x_in, y_true)
        return TrainState(params, opt_state, state.step + 1), losses

    state_sh = TrainState(params=esh, opt_state=esh, step=rep)
    return jax.jit(step,
                   in_shardings=(state_sh, rep, rep),
                   out_shardings=(state_sh, esh),
                   donate_argnums=(0,))


def init_ensemble_state(model: Model, optimizer: optax.GradientTransformation,
                        seeds: Sequence[int]) -> TrainState:
    params = init_ensemble_params(model, seeds)
    opt_state = jax.vmap(optimizer.init)(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))
