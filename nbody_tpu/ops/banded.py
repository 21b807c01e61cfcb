"""Banded gather/scatter as tiled one-hot matmuls (the MXU path).

Motivation (measured on this TPU): XLA dynamic gather of 1.8M rows runs at
~60 MB/s here — pathological — while MXU matmuls run at TFLOP/s.  The
N-body kNN graph has structure that converts gathers into matmuls:
particles sit on a near-uniform grid in index order (reference grid,
utils.py:611-613), so a particle's spatial neighbors are also its *index*
neighbors — the circular relative offset ((idx - n + N/2) mod N) - N/2 is
bounded by a small band (grid-adjacent sites differ by at most
~cells^2 + cells + 1 indices, plus displacement jitter).

banded_gather(values, idx):   out[n, k] = values[idx[n, k]]
banded_scatter_add(vals, idx): out[j] = sum over (n, k) with idx[n,k]==j

Both are computed per row-tile of R particles against a value "slab" of
R + band columns (circularly padded), via a one-hot (R*K, R+band) matrix
multiplied on the MXU.  One-hot selection is EXACT regardless of matmul
precision: every product is value * {0,1} and each one-hot row has a single
nonzero, so no rounding of sums occurs in the gather (the scatter sums are
ordinary f32 accumulation).

band=None means band=N: no structural assumption, always exact — used in
tests and for irregular point sets.  The performance path picks a band from
the cube geometry (see `default_band`).  Gradients are automatic: the VJP
of a one-hot matmul is the transposed one-hot matmul — also MXU work.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def default_band(cells: int, window: int = 3) -> int:
    """Index band covering every flat offset a +-window lattice-kNN
    neighbor can have.  The x offset folds circularly in flat index space
    (+-window*c^2 after the mod-N wrap), but a WRAPPED y or z coordinate
    does not: dy=-1 at y=0 lands at y=c-1, a flat offset of +(c-1)*c.
    Worst case |rel| = window*c^2 + (c-1)*c + (c-1) < (window+1)*c^2,
    so band = 2*(window+1)*c^2 is exact (a first version used
    2*w*(c^2+c+1) and silently dropped cross-boundary edges)."""
    n = cells ** 3
    return min(n, _round_up(2 * (window + 1) * cells * cells, 256))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_size(n: int) -> int:
    """Largest row tile <= 256 that divides n (any n is served: worst case 1)."""
    for r in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % r == 0:
            return r
    return 1


def _circular_pad(values: jnp.ndarray, half: int) -> jnp.ndarray:
    """(N, C) -> (N + 2*half, C) with wraparound on both ends."""
    if half == 0:
        return values
    return jnp.concatenate([values[-half:], values, values[:half]], axis=0)


def _slab_positions(idx_tile: jnp.ndarray, row_ids: jnp.ndarray, t0: jnp.ndarray,
                    n: int, half: int) -> jnp.ndarray:
    """Map target ids to positions within the tile's slab [t0-half, t0+R+half)."""
    rel = jnp.mod(idx_tile - row_ids + n // 2, n) - n // 2   # circular offset
    return rel + (row_ids - t0) + half


def banded_gather(values: jnp.ndarray, idx: jnp.ndarray,
                  band: Optional[int] = None) -> jnp.ndarray:
    """values (N, C), idx (N, K) -> (N, K, C) = values[idx] via MXU matmuls."""
    n, c = values.shape
    k = idx.shape[-1]
    band = n if band is None else min(band, n)
    half = band // 2
    r = _tile_size(n)
    num_tiles = n // r
    slab = r + 2 * half

    vpad = _circular_pad(values, half)                 # (N + 2*half, C)
    idx_tiles = idx.reshape(num_tiles, r, k)
    rows = jnp.arange(n, dtype=jnp.int32).reshape(num_tiles, r)
    lane = jnp.arange(slab, dtype=jnp.int32)[None, :]

    def tile_fn(carry, xs):
        idx_t, row_t = xs
        t0 = row_t[0]
        p = _slab_positions(idx_t, row_t[:, None], t0, n, half)   # (R, K)
        oh = (p.reshape(r * k, 1) == lane).astype(values.dtype)   # (R*K, slab)
        slab_vals = jax.lax.dynamic_slice(vpad, (t0, 0), (slab, c))
        out = jnp.dot(oh, slab_vals, preferred_element_type=values.dtype,
                      precision=jax.lax.Precision.HIGHEST)
        return carry, out

    _, out = jax.lax.scan(tile_fn, None, (idx_tiles, rows))
    return out.reshape(n, k, c)


def banded_scatter_add(vals: jnp.ndarray, idx: jnp.ndarray,
                       band: Optional[int] = None) -> jnp.ndarray:
    """vals (N, K, C), idx (N, K) -> (N, C): sum of vals grouped by target id.

    The transpose of banded_gather: per tile, oh^T @ vals accumulates into a
    circularly padded accumulator; the pad ends fold back afterwards.
    """
    n, k, c = vals.shape
    band = n if band is None else min(band, n)
    half = band // 2
    r = _tile_size(n)
    num_tiles = n // r
    slab = r + 2 * half

    idx_tiles = idx.reshape(num_tiles, r, k)
    val_tiles = vals.reshape(num_tiles, r * k, c)
    rows = jnp.arange(n, dtype=jnp.int32).reshape(num_tiles, r)
    lane = jnp.arange(slab, dtype=jnp.int32)[None, :]

    def tile_fn(acc, xs):
        idx_t, val_t, row_t = xs
        t0 = row_t[0]
        p = _slab_positions(idx_t, row_t[:, None], t0, n, half)
        oh = (p.reshape(r * k, 1) == lane).astype(vals.dtype)     # (R*K, slab)
        contrib = jnp.dot(oh.T, val_t, preferred_element_type=vals.dtype,
                          precision=jax.lax.Precision.HIGHEST)
        cur = jax.lax.dynamic_slice(acc, (t0, 0), (slab, c))
        return jax.lax.dynamic_update_slice(acc, cur + contrib, (t0, 0)), None

    acc0 = jnp.zeros((n + 2 * half, c), vals.dtype)
    acc, _ = jax.lax.scan(tile_fn, acc0, (idx_tiles, val_tiles, rows))
    out = acc[half:half + n]
    if half:
        out = out.at[:half].add(acc[half + n:])
        out = out.at[n - half:].add(acc[:half])
    return out


def banded_segment_mean(vals: jnp.ndarray, idx: jnp.ndarray,
                        band: Optional[int] = None) -> jnp.ndarray:
    """Mean of edge values grouped by target id (tf.unsorted_segment_mean
    semantics on the kNN graph: empty targets -> 0)."""
    n = vals.shape[0]
    sums = banded_scatter_add(vals, idx, band)
    ones = jnp.ones(idx.shape + (1,), vals.dtype)
    cnt = banded_scatter_add(ones, idx, band)[:, 0]
    return sums / jnp.maximum(cnt, 1.0)[:, None]


def band_violations(idx: jnp.ndarray, band: int) -> jnp.ndarray:
    """Count neighbor links outside the circular band (diagnostic; a correct
    band has zero).  idx (..., N, K).  rel in [-band//2, band//2] is in
    band, matching what the gather/scatter slabs actually cover."""
    n = idx.shape[-2]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    rel = jnp.mod(idx - rows + n // 2, n) - n // 2
    return jnp.sum((rel < -(band // 2)) | (rel > band // 2))


# ---------------------------------------------------------------------------
# Batched dispatch: Pallas kernels on TPU, jnp one-hot matmuls elsewhere.
# Custom VJPs close the loop: gather^T == scatter-add, so both directions
# stay on the MXU (XLA's native gather/scatter are pathologically slow on
# this TPU — measured ~60 MB/s; see ops/pallas/banded_kernels.py).
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    import jax as _jax
    # the Pallas kernels are TPU-only (Mosaic); 'axon' is this machine's
    # tunneled TPU platform name
    return _jax.default_backend() in ("tpu", "axon")


def _block_ok(n: int, lattice) -> bool:
    """The 3D-block kernels require a full cells^3 cube whose side the CORE
    block tiles evenly; anything else falls back to the banded path instead
    of tripping block_geometry's assert."""
    if lattice is None:
        return False
    from nbody_tpu.ops.blocked import CORE
    cells = lattice[0]
    return n == cells ** 3 and all(cells % d == 0 for d in CORE)


def _gather_impl(values: jnp.ndarray, idx: jnp.ndarray, band,
                 lattice=None, exact=False) -> jnp.ndarray:
    if _use_pallas():
        if _block_ok(values.shape[1], lattice):
            from nbody_tpu.ops.blocked import block_gather
            return block_gather(values, idx, lattice[0], lattice[1],
                                fast=not exact)
        from nbody_tpu.ops.pallas.banded_kernels import banded_gather_pallas
        return banded_gather_pallas(values, idx, band, fast=not exact)
    # non-TPU backends: XLA's native gather is fast there — use it directly
    # (banded_gather stays as the semantics oracle for tests)
    return jax.vmap(lambda v, i: v[i])(values, idx)


def _scatter_impl(vals: jnp.ndarray, idx: jnp.ndarray, band,
                  lattice=None, exact=False) -> jnp.ndarray:
    if _use_pallas():
        if _block_ok(vals.shape[1], lattice):
            from nbody_tpu.ops.blocked import block_scatter_add
            return block_scatter_add(vals, idx, lattice[0], lattice[1],
                                     fast=not exact)
        from nbody_tpu.ops.pallas.banded_kernels import banded_scatter_add_pallas
        return banded_scatter_add_pallas(vals, idx, band, fast=not exact)
    n = vals.shape[1]

    def one(v, i):
        return jnp.zeros((n, v.shape[-1]), v.dtype).at[i.reshape(-1)].add(
            v.reshape(-1, v.shape[-1]))

    return jax.vmap(one)(vals, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _neighbor_gather_idx(values: jnp.ndarray, idx: jnp.ndarray,
                         band: Optional[int] = None,
                         lattice=None, exact: bool = False) -> jnp.ndarray:
    return _gather_impl(values, idx, band, lattice, exact)


def _ng_fwd(values, idx, band, lattice, exact):
    return _gather_impl(values, idx, band, lattice, exact), idx


def _ng_bwd(band, lattice, exact, idx, ct):
    return _scatter_impl(ct, idx, band, lattice, exact), None


_neighbor_gather_idx.defvjp(_ng_fwd, _ng_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _neighbor_scatter_add_idx(vals: jnp.ndarray, idx: jnp.ndarray,
                              band: Optional[int] = None,
                              lattice=None, exact: bool = False) -> jnp.ndarray:
    return _scatter_impl(vals, idx, band, lattice, exact)


def _ns_fwd(vals, idx, band, lattice, exact):
    return _scatter_impl(vals, idx, band, lattice, exact), idx


def _ns_bwd(band, lattice, exact, idx, ct):
    return _gather_impl(ct, idx, band, lattice, exact), None


_neighbor_scatter_add_idx.defvjp(_ns_fwd, _ns_bwd)


def neighbor_gather(values: jnp.ndarray, idx: jnp.ndarray,
                    band: Optional[int] = None,
                    lattice=None, exact: bool = False,
                    masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched gather: values (b, N, C), idx (b, N, K) -> (b, N, K, C).

    lattice=(cells, window): idx comes from the lattice kNN — use the tight
    3D-block kernels (ops/blocked.py) on TPU.

    masks (from ops.blocked.block_masks, precomputed once per step): use the
    shared-mask XLA einsum path instead of a Pallas kernel — every op is one
    batched matmul, autodiff transposes it against the SAME mask array, and
    the Mosaic per-grid-step floor disappears.  Requires lattice.

    exact=True keeps values in f32 through the kernels (6-pass MXU dots) —
    REQUIRED for integer payloads (e.g. gathering neighbor-id rows), which
    the default bf16 fast path would round above 256.  exact with bf16
    masks would defeat the purpose, so exact falls back to the idx path."""
    if masks is not None and lattice is not None and not exact:
        from nbody_tpu.ops.blocked import (lattice_core, lattice_self_free,
                                           masked_gather)
        return masked_gather(values, masks, lattice[0], lattice[1],
                             core=lattice_core(lattice),
                             self_slot0=lattice_self_free(lattice))
    return _neighbor_gather_idx(values, idx, band, lattice, exact)


def neighbor_scatter_add(vals: jnp.ndarray, idx: jnp.ndarray,
                         band: Optional[int] = None,
                         lattice=None, exact: bool = False,
                         masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched scatter-add: vals (b, N, K, C), idx (b, N, K) -> (b, N, C)."""
    if masks is not None and lattice is not None and not exact:
        from nbody_tpu.ops.blocked import (lattice_core, lattice_self_free,
                                           masked_scatter_add)
        return masked_scatter_add(vals, masks, lattice[0], lattice[1],
                                  core=lattice_core(lattice),
                                  self_slot0=lattice_self_free(lattice))
    return _neighbor_scatter_add_idx(vals, idx, band, lattice, exact)


def neighbor_counts(idx: jnp.ndarray, band: Optional[int] = None,
                    dtype=jnp.float32, lattice=None,
                    masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """In-degree of each particle in the kNN graph: (b, N, K) -> (b, N).

    Depends only on idx — compute ONCE per step and reuse across layers
    (and fwd/bwd: it is stop_gradient'ed)."""
    ones = jnp.ones(idx.shape + (1,), dtype)
    return jax.lax.stop_gradient(
        neighbor_scatter_add(ones, idx, band, lattice, masks=masks))[..., 0]


def neighbor_segment_mean(vals: jnp.ndarray, idx: jnp.ndarray,
                          band: Optional[int] = None,
                          counts: Optional[jnp.ndarray] = None,
                          lattice=None,
                          masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched mean of edge values grouped by neighbor id: (b,N,K,C)->(b,N,C).

    tf.unsorted_segment_mean semantics (empty targets -> 0).  Pass
    precomputed `counts` (neighbor_counts) to avoid re-scattering ones."""
    sums = neighbor_scatter_add(vals, idx, band, lattice, masks=masks)
    cnt = counts if counts is not None else neighbor_counts(
        idx, band, vals.dtype, lattice, masks)
    return sums / jnp.maximum(cnt, 1.0)[..., None]
