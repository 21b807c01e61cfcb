"""Pallas mask-dot kernels: the shared-mask einsum with int8 mask reads.

The masked neighbor path (ops/blocked.py, neighbor_impl='masked') is at the
mask-read roofline: each of the ~34 masked einsums per train step streams
the full (B, NB, ET, P) one-hot from HBM (4.23 GB in bf16 at 32^3 b4 K14
core (4,8,8) — ~5.2 ms/op at 819 GB/s; PERF.md).  Storing the one-hot in a
cheaper dtype does NOT help at the XLA level: the convert before the dot
materializes a bf16 copy in HBM, so int8/fp8 masks measured identical to
bf16 (PERF.md round-3 table).

These kernels fix exactly that: the mask tile is loaded as int8 (half the
HBM bytes) and converted to bf16 in VMEM, where the convert is free
relative to HBM.  Everything else — the (ET, P) x (P, C) MXU dot per
block, f32 accumulation, the batched (B, NB) structure — is identical to
the XLA einsum the sweep already tuned (PERF.md core sweep), so this is a
pure operand-traffic cut, not a reformulation.  {0, 1} are exact in int8.

`group` folds G consecutive blocks into one grid step to amortize
per-grid-step overheads (Mosaic fixed cost measured ~19 us on simple
kernels; PERF.md platform facts) — sweepable on-chip.

Replaces the hot op of the reference's shift-inv layers
(reference graph.py:367-391, the pool-over-neighbors segment ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# blocks folded into one grid step (amortizes per-step fixed cost);
# override with set_group() for on-chip sweeps
GROUP = 2


def set_group(g: int):
    global GROUP
    GROUP = int(g)


def _pick_group(nb: int, group=None) -> int:
    g = int(group or GROUP)
    while nb % g:
        g -= 1
    return max(g, 1)


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _gather_kernel(m_ref, p_ref, o_ref, *, g: int):
    # m (1, g, ET, P) int8, p (1, g, P, C) bf16 -> o (1, g, ET, C) f32
    for i in range(g):
        m = m_ref[0, i].astype(jnp.bfloat16)     # VMEM convert — no HBM copy
        o_ref[0, i] = jnp.dot(m, p_ref[0, i],
                              preferred_element_type=jnp.float32)


def _scatter_kernel(m_ref, v_ref, o_ref, *, g: int):
    # m (1, g, ET, P) int8, v (1, g, ET, C) bf16 -> o (1, g, P, C) f32
    for i in range(g):
        m = m_ref[0, i].astype(jnp.bfloat16)
        o_ref[0, i] = jnp.dot(m.T, v_ref[0, i],
                              preferred_element_type=jnp.float32)


def _mask_dot_call(masks: jnp.ndarray, vals: jnp.ndarray, transpose: bool,
                   group=None, interpret: bool | None = None) -> jnp.ndarray:
    """masks (B, NB, ET, P) int8; vals (B, NB, P, C) [gather] or
    (B, NB, ET, C) [scatter=transpose]; returns f32 (B, NB, ET|P, C)."""
    b, nb, et, p = masks.shape
    c = vals.shape[-1]
    out_rows = p if transpose else et
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = _pick_group(nb, group)
    kernel = _scatter_kernel if transpose else _gather_kernel
    return pl.pallas_call(
        functools.partial(kernel, g=g),
        grid=(b, nb // g),
        in_specs=[
            pl.BlockSpec((1, g, et, p), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, vals.shape[2], c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, out_rows, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, out_rows, c), jnp.float32),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(masks, vals)


def _float0_zeros(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# The two directions are each other's transpose against the SAME int8 mask
# array, so the VJPs are a mutually-referencing pair — forward AND backward
# of every masked neighbor op read int8, never a bf16 mask copy.  int8
# primals take float0 cotangents (zero-size), so the masks cost nothing in
# the backward pass.

@jax.custom_vjp
def mask_dot_gather(masks: jnp.ndarray, patches: jnp.ndarray) -> jnp.ndarray:
    """(B, NB, ET, P) int8 one-hot x (B, NB, P, C) -> (B, NB, ET, C) f32."""
    return _mask_dot_call(masks, patches.astype(jnp.bfloat16), transpose=False)


def _gather_fwd(masks, patches):
    # residuals must be JAX types: a zero-size array witnesses the dtype
    return mask_dot_gather(masks, patches), (masks,
                                             jnp.zeros((0,), patches.dtype))


def _gather_bwd(res, ct):
    masks, pdt = res
    d_patches = _mask_dot_call(masks, ct.astype(jnp.bfloat16), transpose=True)
    return _float0_zeros(masks), d_patches.astype(pdt.dtype)


mask_dot_gather.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def mask_dot_scatter(masks: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """(B, NB, ET, P) int8 one-hot x (B, NB, ET, C) -> (B, NB, P, C) f32
    per-block accumulations (caller overlap-adds via patches_fold)."""
    return _mask_dot_call(masks, edges.astype(jnp.bfloat16), transpose=True)


def _scatter_fwd(masks, edges):
    return mask_dot_scatter(masks, edges), (masks,
                                            jnp.zeros((0,), edges.dtype))


def _scatter_bwd(res, ct):
    masks, edt = res
    d_edges = _mask_dot_call(masks, ct.astype(jnp.bfloat16), transpose=False)
    return _float0_zeros(masks), d_edges.astype(edt.dtype)


mask_dot_scatter.defvjp(_scatter_fwd, _scatter_bwd)
