"""Pallas kernels for the 3D-block gather/scatter (ops/blocked.py).

The simplest kernels in the framework: per (batch, block) grid step, ONE
one-hot matmul against the block's dilated patch — no in-kernel loops, no
dynamic slices, all operands streamed by BlockSpec.  The patch width P
(e.g. 768 at window 2) replaces the thousands-wide index-band slab of
ops/pallas/banded_kernels.py.

fast=True casts dot operands to bf16 (single MXU pass; one-hot side exact,
values rounded ~1e-2 relative); fast=False keeps exact f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shared precision policy for all one-hot MXU dots
from nbody_tpu.ops.pallas.banded_kernels import _dot


def _gather_kernel(p_ref, patch_ref, out_ref, *, fast):
    p = p_ref[0, 0, 0]                              # (ET,)
    lane = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0],
                                                patch_ref.shape[-2]), 1)
    oh = (p[:, None] == lane).astype(jnp.bfloat16 if fast else jnp.float32)
    out_ref[0, 0] = _dot(oh, patch_ref[0, 0], fast)


def block_gather_pallas(p: jnp.ndarray, patches: jnp.ndarray,
                        fast: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """p (B, NB, ET) patch positions, patches (B, NB, P, C) -> (B, NB, ET, C)."""
    b, nb, et = p.shape
    _, _, pp, c = patches.shape
    out = pl.pallas_call(
        functools.partial(_gather_kernel, fast=fast),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, et), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pp, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, et, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, et, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(p.reshape(b, nb, 1, et), patches)
    return out


def _scatter_kernel(p_ref, vals_ref, out_ref, *, fast):
    p = p_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0],
                                                out_ref.shape[-2]), 1)
    oh = (p[:, None] == lane).astype(jnp.bfloat16 if fast else jnp.float32)
    out_ref[0, 0] = _dot(oh.T, vals_ref[0, 0], fast)


def block_scatter_pallas(p: jnp.ndarray, vals: jnp.ndarray, ext,
                         fast: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """p (B, NB, ET), vals (B, NB, ET, C) -> per-block sums (B, NB, P, C)."""
    b, nb, et = p.shape
    c = vals.shape[-1]
    pp = ext[0] * ext[1] * ext[2]
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, fast=fast),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, et), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, et, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, pp, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, pp, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(p.reshape(b, nb, 1, et), vals)
    return out
