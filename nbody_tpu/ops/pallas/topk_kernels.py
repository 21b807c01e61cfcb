"""Pallas k-selection kernel for the lattice kNN search.

The lattice search scores (2w+1)^3 candidate offsets per particle and
keeps the k nearest (ops/knn.py).  Both XLA selections have an HBM cost
the selection itself doesn't need:
  * lax.top_k sorts all 125 lanes (a full sort network for k=14 winners);
  * ops/knn.topk_min_iter streams the whole (B, N, 125) distance array
    from HBM once per argmin pass — k passes = k full reads.

This kernel loads each row tile ONCE into VMEM and runs all k
argmin+mask passes there — selection becomes pure VPU work on resident
data (the same finite priority encoding as topk_min_iter: taken > NaN >
+inf > finite, ties to the lowest slot, exactly lax.top_k's order).

Replaces the selection step of the reference's sklearn kneighbors_graph
(reference graph.py:704-713) on the TPU-native path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step: (T, 125) f32 tile ~ 1 MB at 2048 — VMEM-resident
ROW_TILE = 2048


def _topk_kernel(d_ref, o_ref, *, k: int, m: int):
    d = d_ref[...]                                    # (T, M) f32
    big = jnp.finfo(d.dtype).max
    d = jnp.where(jnp.isnan(d), big * 0.5, jnp.minimum(d, big * 0.25))
    lanes = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    taken = jnp.zeros(d.shape, jnp.bool_)
    for i in range(k):
        cur = jnp.where(taken, big, d)
        mn = jnp.min(cur, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(cur == mn, lanes, m), axis=1)   # (T,)
        o_ref[:, i] = sel.astype(jnp.int32)
        taken = taken | (lanes == sel[:, None])


def topk_min_pallas(d2: jnp.ndarray, k: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """(N, M) distances -> (N, k) int32 slots, ascending, lowest-slot ties
    — topk_min_iter semantics with the row tile resident in VMEM."""
    n, m = d2.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    t = ROW_TILE
    while n % t:
        t //= 2
    t = max(t, 1)
    # under shard_map (manual mode) the output aval must declare which mesh
    # axes it varies over — inherit the input's vma (None outside)
    vma = getattr(jax.typeof(d2), "vma", None)
    out_shape = (jax.ShapeDtypeStruct((n, k), jnp.int32, vma=vma)
                 if vma else jax.ShapeDtypeStruct((n, k), jnp.int32))
    return pl.pallas_call(
        functools.partial(_topk_kernel, k=k, m=m),
        grid=(n // t,),
        in_specs=[pl.BlockSpec((t, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(d2)
