"""Sharded train/eval steps and the sharded periodic kNN.

TPU-native scaling design (SURVEY.md §2.3, §5):
  * batches (b, N, C) shard as P("data", "particle", None): cubes over the
    data axis, particles over the particle axis;
  * params/opt state are replicated; GSPMD turns the set layer's particle
    mean into a psum over "particle" and the gradient reduction into a psum
    over "data" — the XLA collectives ride ICI, no NCCL/MPI layer exists;
  * the sharded kNN all-gathers positions over the particle axis inside
    shard_map (each shard owns its rows, columns are global) — the
    TPU-native replacement for the reference's host-side ghost padding.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from nbody_tpu.models.registry import Model
from nbody_tpu.ops.knn import _chunk_topk
from nbody_tpu.parallel.mesh import DATA_AXIS, PARTICLE_AXIS
from nbody_tpu.physics.losses import loss_za
from nbody_tpu.train.trainer import TrainState


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (b, N, C) batches: cubes x particles."""
    return NamedSharding(mesh, P(DATA_AXIS, PARTICLE_AXIS, None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_sharded_train_step(model: Model, optimizer: optax.GradientTransformation,
                            mesh: Mesh, loss_fn: Callable = loss_za):
    """Jitted sharded (state, x_in, y_true) -> (state', loss).

    State replicated, batch sharded (data, particle); GSPMD inserts the
    collectives.  Donates the state buffers.
    """
    bs = batch_sharding(mesh)
    rep = replicate(mesh)

    def step(state: TrainState, x_in, y_true):
        def loss(params):
            return loss_fn(model.apply(params, x_in), y_true)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_val

    return jax.jit(step,
                   in_shardings=(rep, bs, bs),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))


def make_sharded_train_scan(model: Model,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh, loss_fn: Callable = loss_za):
    """Sharded twin of trainer.make_train_scan: (state, batches (T, b, N, C),
    num_inputs) -> (state', losses (T,)), with batches sharded
    P(None, "data", "particle", None) and T steps per host dispatch."""
    bs = NamedSharding(mesh, P(None, DATA_AXIS, PARTICLE_AXIS, None))
    rep = replicate(mesh)

    def one_step(state: TrainState, batch, num_inputs: int):
        x_in, y_true = batch[..., :num_inputs], batch[..., num_inputs:]

        def loss(params):
            return loss_fn(model.apply(params, x_in), y_true)

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_val

    def scan_steps(state: TrainState, batches, num_inputs: int):
        return jax.lax.scan(
            lambda s, b: one_step(s, b, num_inputs), state, batches)

    return jax.jit(scan_steps, static_argnums=(2,),
                   in_shardings=(rep, bs), out_shardings=(rep, rep),
                   donate_argnums=(0,))


def make_sharded_eval_step(model: Model, mesh: Mesh, loss_fn: Callable = loss_za):
    bs = batch_sharding(mesh)
    rep = replicate(mesh)
    fwd = model.eval_fn

    def step(params, x_in, y_true):
        pred = fwd(params, x_in)
        return pred, loss_fn(pred, y_true)

    return jax.jit(step, in_shardings=(rep, bs, bs),
                   out_shardings=(bs, rep))


def halo_knn_usable(cells: int, n: int, mesh: Mesh, window: int) -> bool:
    """Whether the halo-exchange lattice kNN can serve this geometry:
    a full cube, the x-extent divisible by the particle axis, and halos
    that reach only adjacent shards."""
    if mesh is None:
        return False
    p_size = mesh.shape[PARTICLE_AXIS]
    if p_size <= 1 or n != cells ** 3 or cells % p_size:
        return False
    w = min(window, (cells - 1) // 2)
    return w <= cells // p_size


def knn_lattice_sharded_batch(pos: jnp.ndarray, k: int, cells: int,
                              mesh: Mesh, box: float = 1.0,
                              include_self: bool = True,
                              window: int = 3,
                              select: str = "sort",
                              batch_replicated: bool = False) -> jnp.ndarray:
    """Halo-exchange lattice kNN for particle-sharded cubes.

    The TPU-native equivalent of the reference's host-side ghost-particle
    padding (reference graph.py:798-917), over the ICI mesh: the particle
    axis is sharded in x-slabs (grid order is x-major), and each shard
    ppermutes its boundary slabs of `window` x-planes to its ring neighbors
    instead of all-gathering the whole cube.  Communication per shard is
    2 * window * cells^2 positions — independent of the shard count — vs
    the full N of the all-gather variant.

    pos (b, N, 3) sharded P("data", "particle") -> idx (b, N, k) sharded
    the same (this is the in-training form: models/registry routes the
    graph build here when a particle-sharded mesh is configured, so the
    per-step graph rebuild communicates at halo scale, not cube scale).
    Requires cells divisible by the particle-axis size p, and
    window <= cells/p (halos touch only adjacent shards).

    batch_replicated: the ensemble composition replicates the SHARED batch
    over the "data" (member) axis — the search then keeps the batch axis
    unsharded (specs P(None, "particle")), running redundantly per member
    shard; the ppermute halo exchange on "particle" is unchanged
    (VERDICT r4 #4: one halo search, reused by all members).
    """
    p_size = mesh.shape[PARTICLE_AXIS]
    assert cells % p_size == 0, "cells must divide by the particle axis"
    local_x = cells // p_size
    w = min(window, (cells - 1) // 2)
    assert w <= local_x, (
        f"window {w} needs halos beyond adjacent shards (local_x={local_x}); "
        "use fewer shards or the all-gather variant")
    n = pos.shape[-2]
    assert n == cells ** 3

    from nbody_tpu.physics.pbc import min_image_diff

    offs = [(dx, dy, dz)
            for dx in range(-w, w + 1)
            for dy in range(-w, w + 1)
            for dz in range(-w, w + 1)]

    def local_knn(local_pos):                    # (b_local, N/p, 3)
        bsz = local_pos.shape[0]
        grid = local_pos.reshape(bsz, local_x, cells, cells, 3)
        # halo exchange on the ring: shard i's last w planes -> shard i+1
        # (arriving as the LEFT halo), first w planes -> shard i-1 (RIGHT)
        fwd = [(i, (i + 1) % p_size) for i in range(p_size)]
        bwd = [(i, (i - 1) % p_size) for i in range(p_size)]
        left = jax.lax.ppermute(grid[:, -w:], PARTICLE_AXIS, fwd)
        right = jax.lax.ppermute(grid[:, :w], PARTICLE_AXIS, bwd)
        padded = jnp.concatenate([left, grid, right], axis=1)

        d2 = []
        for (dx, dy, dz) in offs:
            cand = padded[:, w + dx:w + dx + local_x]
            cand = jnp.roll(cand, (-dy, -dz), axis=(2, 3)).reshape(bsz, -1, 3)
            delta = min_image_diff(cand, local_pos, box)
            dist = jnp.sum(delta * delta, axis=-1)
            if (dx, dy, dz) == (0, 0, 0):
                dist = jnp.full_like(dist, -1.0 if include_self else jnp.inf)
            d2.append(dist)
        d2 = jnp.stack(d2, axis=2)               # (b, N/p, num_off)
        eff_select = select
        if select == "pallas" and jax.default_backend() == "cpu":
            # interpret-mode pallas cannot run under shard_map's vma
            # checking (the HLO interpreter's internal loop carries
            # unvarying constants); the iter variant is the same
            # selection in plain XLA — the kernel engages on real TPU
            eff_select = "iter"
        if eff_select == "iter":
            from nbody_tpu.ops.knn import topk_min_iter
            sel = topk_min_iter(d2, k)
        elif eff_select == "pallas":
            # shard_map is manual mode — pallas_call composes with it
            from nbody_tpu.ops.pallas.topk_kernels import topk_min_pallas
            sel = jax.vmap(lambda d: topk_min_pallas(d, k))(d2)
        else:
            _, sel = jax.lax.top_k(-d2, k)
        # lexicographic slot -> (dx, dy, dz) arithmetically (no table
        # gather; same decode as ops/knn.knn_periodic_lattice)
        mo = 2 * w + 1
        dxyz = jnp.stack([sel // (mo * mo) - w,
                          (sel // mo) % mo - w,
                          sel % mo - w], axis=-1)  # (b, N/p, k, 3)

        shard = jax.lax.axis_index(PARTICLE_AXIS)
        ii = jnp.arange(local_x * cells * cells, dtype=jnp.int32)
        x = ii // (cells * cells) + shard * local_x
        y = (ii // cells) % cells
        z = ii % cells
        nx = jnp.mod(x[None, :, None] + dxyz[..., 0], cells)
        ny = jnp.mod(y[None, :, None] + dxyz[..., 1], cells)
        nz = jnp.mod(z[None, :, None] + dxyz[..., 2], cells)
        return ((nx * cells + ny) * cells + nz).astype(jnp.int32)

    baxis = None if batch_replicated else DATA_AXIS
    fn = shard_map(local_knn, mesh=mesh,
                   in_specs=P(baxis, PARTICLE_AXIS, None),
                   out_specs=P(baxis, PARTICLE_AXIS, None))
    return fn(pos)


def knn_lattice_sharded(pos: jnp.ndarray, k: int, cells: int, mesh: Mesh,
                        box: float = 1.0, include_self: bool = True,
                        window: int = 3, select: str = "sort") -> jnp.ndarray:
    """Unbatched halo-exchange lattice kNN: pos (N, 3) sharded
    P("particle") -> idx (N, k).  See knn_lattice_sharded_batch."""
    return knn_lattice_sharded_batch(pos[None], k, cells, mesh, box,
                                     include_self, window, select)[0]


def knn_periodic_sharded(pos: jnp.ndarray, k: int, mesh: Mesh,
                         box: float = 1.0, include_self: bool = True) -> jnp.ndarray:
    """Periodic kNN with the particle axis sharded over the mesh.

    pos (N, 3) sharded P("particle", None) -> idx (N, k) sharded the same.
    Each shard all-gathers the global positions over ICI (393 KB/cube at
    32^3 — cheap), then computes exact min-image top-k for its local rows.
    """
    n = pos.shape[0]
    p_size = mesh.shape[PARTICLE_AXIS]
    local_n = n // p_size

    def local_knn(local_pos):
        all_pos = jax.lax.all_gather(local_pos, PARTICLE_AXIS, axis=0, tiled=True)
        shard_id = jax.lax.axis_index(PARTICLE_AXIS)
        row_ids = shard_id * local_n + jnp.arange(local_n, dtype=jnp.int32)
        return _chunk_topk(local_pos, row_ids, all_pos, k, box, include_self)

    fn = shard_map(local_knn, mesh=mesh,
                   in_specs=P(PARTICLE_AXIS, None),
                   out_specs=P(PARTICLE_AXIS, None))
    return fn(pos)
