"""Pallas TPU kernels: banded gather / scatter-add as in-VMEM one-hot matmuls.

Why a kernel: XLA's dynamic gather is pathologically slow on this TPU
(~60 MB/s measured), and the jnp one-hot-matmul fallback in ops/banded.py
materializes (R*K, slab) one-hot tiles in HBM (~15 GB of traffic per op at
32^3).  Here the one-hot tiles are *generated inside VMEM* from slab
positions and consumed immediately by the MXU — HBM sees only the values,
the positions, and the output.

Semantics identical to ops.banded.banded_gather / banded_scatter_add:
  gather:  out[b, n, k, :] = values[b, idx[b, n, k], :]
  scatter: out[b, j, :]    = sum_{(n,k): idx[b,n,k]==j} vals[b, n, k, :]
with targets restricted to a circular index band around each row (one-hot
rows for out-of-band targets are all-zero -> gather 0 / drop contribution,
matching the jnp path).  One-hot selection on the MXU is exact: each product
is value * {0,1}, each one-hot row has at most one nonzero, and the dots run
at Precision.HIGHEST so f32 values survive the multi-pass bf16 MXU exactly.

Layout: the batch is the leading (sequential) grid dimension; row tiles of R
particles (R*K one-hot rows, a multiple of 128 lanes); the value slab for a
tile spans [t0 - half, t0 + R + half) in circularly padded coordinates,
scanned in chunks of S=512 columns; one batch member's padded values live
wholly in VMEM (a few MB at 32^3 widths).  The TPU grid is sequential, so
the scatter kernel read-modify-writes a shared per-batch VMEM accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = 2048  # slab-chunk width (MXU contraction dim)


def _row_tile(n: int, k: int) -> int:
    """Prefer large row tiles: in-kernel loop iterations carry ~80 us of
    overhead on this platform (PERF.md), so fewer, bigger dots win."""
    for r in (512, 256, 128, 64, 32, 16, 8):
        if n % r == 0 and (r * k) % 128 == 0:
            return r
    for r in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % r == 0:
            return r
    return 1


def _geometry(n: int, r: int, band: Optional[int]):
    band = n if band is None else min(band, n)
    half = band // 2
    slab = r + 2 * half
    chunks = -(-slab // _S)
    pad_len = chunks * _S + (n - r)   # last tile's chunks end exactly here
    return half, chunks, pad_len


def _slab_positions(idx: jnp.ndarray, n: int, r: int, half: int) -> jnp.ndarray:
    """(B, N, K) targets -> (B, T, 1, R*K) positions in each tile's slab."""
    b, _, k = idx.shape
    rows = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    rel = jnp.mod(idx.astype(jnp.int32) - rows + n // 2, n) - n // 2
    local = jnp.mod(rows, r)
    return (rel + local + half).reshape(b, n // r, 1, r * k)


def _pad_values(values: jnp.ndarray, half: int, pad_len: int) -> jnp.ndarray:
    """(B, N, C) -> (B, pad_len, C): [last half rows | values | cyclic head]."""
    n = values.shape[1]
    head = pad_len - half - n
    parts = []
    if half > 0:
        parts.append(values[:, -half:])
    parts.append(values)
    while head > 0:
        take = min(head, n)
        parts.append(values[:, :take])
        head -= take
    return jnp.concatenate(parts, axis=1)


# fast=True: operands cast to bf16 -> ONE MXU pass.  The one-hot side is
# exact either way ({0,1} are bf16-representable); fast mode rounds the
# VALUES to bf16 (~1e-2 relative) — the right trade for training on this
# chip, where f32 dots run 6 passes (PERF.md).  fast=False keeps exact f32.
def _dot(a, b, fast=True):
    if fast:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _gather_kernel(p_ref, vpad_ref, out_ref, *, r, chunks, c, fast):
    et = p_ref.shape[-1]
    p = p_ref[0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (et, _S), 1)
    t0 = pl.program_id(1) * r

    def body(jc, acc):
        oh = (p[:, None] == lane + jc * _S).astype(jnp.bfloat16 if fast
                                                   else jnp.float32)
        chunk = vpad_ref[0, pl.ds(t0 + jc * _S, _S), :]
        return acc + _dot(oh, chunk, fast)

    out_ref[0, 0] = jax.lax.fori_loop(
        0, chunks, body, jnp.zeros((et, c), jnp.float32))


def banded_gather_pallas(values: jnp.ndarray, idx: jnp.ndarray,
                         band: Optional[int] = None,
                         interpret: bool = False,
                         fast: bool = True) -> jnp.ndarray:
    """values (B, N, C), idx (B, N, K) -> (B, N, K, C) = values[idx]."""
    b, n, c = values.shape
    k = idx.shape[-1]
    r = _row_tile(n, k)
    half, chunks, pad_len = _geometry(n, r, band)
    num_tiles = n // r

    p = _slab_positions(idx, n, r, half)
    vpad = _pad_values(values.astype(
        jnp.bfloat16 if fast else jnp.float32), half, pad_len)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, r=r, chunks=chunks, c=c, fast=fast),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, r * k), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad_len, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r * k, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_tiles, r * k, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(p, vpad)
    return out.reshape(b, n, k, c).astype(values.dtype)


def _scatter_kernel(p_ref, vals_ref, out_ref, *, r, chunks, fast):
    t0 = pl.program_id(1) * r

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    p = p_ref[0, 0, 0]
    vals = vals_ref[0, 0, 0]
    et = p.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (et, _S), 1)

    def body(jc, _):
        oh = (p[:, None] == lane + jc * _S).astype(jnp.bfloat16 if fast
                                                   else jnp.float32)
        contrib = _dot(oh.T, vals, fast)
        sl = pl.ds(t0 + jc * _S, _S)
        out_ref[0, sl, :] = out_ref[0, sl, :] + contrib
        return 0

    jax.lax.fori_loop(0, chunks, body, 0)


def banded_scatter_add_pallas(vals: jnp.ndarray, idx: jnp.ndarray,
                              band: Optional[int] = None,
                              interpret: bool = False,
                              fast: bool = True) -> jnp.ndarray:
    """vals (B, N, K, C), idx (B, N, K) -> (B, N, C) summed by target id."""
    b, n, k, c = vals.shape
    r = _row_tile(n, k)
    half, chunks, pad_len = _geometry(n, r, band)
    num_tiles = n // r

    p = _slab_positions(idx, n, r, half)
    vt = vals.astype(jnp.bfloat16 if fast else jnp.float32).reshape(
        b, num_tiles, 1, r * k, c)

    acc = pl.pallas_call(
        functools.partial(_scatter_kernel, r=r, chunks=chunks, fast=fast),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, r * k), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, r * k, c), lambda bi, i: (bi, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pad_len, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pad_len, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(p, vt)

    # fold the circular pad ends: pad coord q <-> global j = (q - half) mod n.
    # live region is q in [0, n + 2*half); beyond that nothing was written.
    out = acc[:, half:half + n]
    if half > 0:
        out = out.at[:, :half].add(acc[:, half + n:half + n + half])
        out = out.at[:, n - half:].add(acc[:, :half])
    return out.astype(vals.dtype)
