"""3D-block gather/scatter: the tight tiling for lattice kNN graphs.

The banded ops (ops/banded.py) tile particles by flat index, so each row
tile must consider a slab of R + band candidates (band ~ 2*w*(c^2+c+1) —
thousands of rows) even though a lattice-kNN neighbor can only be one of
(2w+1)^3 offsets.  Tiling by 3D BLOCK removes that 1D artifact: all
neighbors of a (bx, by, bz) core block of particles originate inside its
dilated block of (bx+2w)(by+2w)(bz+2w) lattice sites — e.g. 8*8*12 = 768
for the default (4,4,8) core at window 2, vs a 4352-wide index band.

Pipeline (all static-shape, gather-free XLA except one tiny Pallas dot):
  cube_to_blocks / blocks_to_cube : pure reshapes+transposes between the
      z-major flat ordering and block-major ordering;
  block_patches : dilated blocks extracted from the circularly padded cube
      with per-axis STRIDED slices (ex+ey+ez ~ 28 ops, no gathers);
  block positions : each edge's neighbor as a flat offset into its core
      block's dilated patch (elementwise coordinate arithmetic);
  Pallas kernel : one (R*K, P) one-hot  x  (P, C) dot per block — no
      in-kernel loops at all (ops/pallas/block_kernels.py);
  scatter fold : the transpose — per-block (P, C) accumulations overlap-add
      back into the padded cube with strided slice-adds, then the circular
      pad rings fold in (6 static adds).

Requires N == cells^3 in grid order and |offset| <= window per coordinate —
exactly what ops/knn.knn_periodic_lattice guarantees by construction.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Core block shape (particles per block tile).  The per-edge one-hot dot is
# (R*K, P) with P = prod(core + 2*window): LARGER cores dilate less per
# particle relative to the ~19us Mosaic per-grid-step floor (PERF.md) —
# fewer, bigger dots win until the dot itself dominates.  Default chosen by
# measurement on the v5e (scripts/profile_ops.py); override with
# set_core() for experiments.
CORE = (4, 4, 8)

# Core for the MASKED (precomputed-shared-one-hot, XLA einsum) path.
# Empirically swept at 32^3 b4 K14 w2 (PERF.md, all same-program
# deterministic): step time falls monotonically with instance size up to
# (4,4,8) — (2,2,2) 1093 ms, (2,2,4) 854, (2,4,4) 456, (2,4,8) 411,
# (4,4,8) 327, (4,8,8) 321; (2,8,8) 402 turns back up.  The batched
# einsum is granularity-bound until ~(ET=1792, P=768) instances; beyond
# that the mask HBM bytes (B*N*K*P) win.  P = prod(core + 2w).  At sizes
# where this core's mask array exceeds the HBM cap, the registry's
# candidate list steps down ((4,4,8) at 64^3 b1) — models/registry.
MASKED_CORE = (4, 8, 8)


def set_core(core: Tuple[int, int, int]):
    """Swap the Pallas-path core block shape (performance experiments only;
    jitted callables trace the value at trace time, so swap BEFORE
    building/jitting a model and do not reuse previously-jitted
    functions)."""
    global CORE
    CORE = tuple(core)


def set_masked_core(core: Tuple[int, int, int]):
    """Swap the masked-path core block shape (same caveats as set_core)."""
    global MASKED_CORE
    MASKED_CORE = tuple(core)


def lattice_core(lattice) -> Tuple[int, int, int]:
    """Core shape carried by a lattice tuple: (cells, window[, core[, sf]]).

    The registry appends the chosen core when it builds shared masks (it
    may pick a smaller core than MASKED_CORE to fit the mask HBM budget at
    large N); 2-tuples fall back to the global default."""
    if lattice is not None and len(lattice) > 2 and lattice[2]:
        return tuple(lattice[2])
    return MASKED_CORE


def lattice_self_free(lattice) -> bool:
    """Whether the lattice tuple's masks were built with the self slot
    dropped (block_masks drop_self_slot0=True): slot 0 of every edge row is
    the particle itself (knn include_self guarantee), so its selection is
    an identity copy — the masks cover only slots 1..K-1, cutting mask HBM
    bytes (the step's dominant traffic) by 1/K."""
    return lattice is not None and len(lattice) > 3 and bool(lattice[3])


def block_geometry(cells: int, window: int, core=None):
    bx, by, bz = core or CORE
    assert cells % bx == 0 and cells % by == 0 and cells % bz == 0
    nb = (cells // bx, cells // by, cells // bz)
    ext = (bx + 2 * window, by + 2 * window, bz + 2 * window)
    return nb, ext


def cube_to_blocks(values: jnp.ndarray, cells: int, core=None) -> jnp.ndarray:
    """(B, N, C) z-major -> (B, NB, R, C) block-major. Pure reshape/transpose."""
    b, n, c = values.shape
    bx, by, bz = core or CORE
    v = values.reshape(b, cells // bx, bx, cells // by, by, cells // bz, bz, c)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return v.reshape(b, -1, bx * by * bz, c)


def blocks_to_cube(blocks: jnp.ndarray, cells: int, core=None) -> jnp.ndarray:
    """(B, NB, R, C) block-major -> (B, N, C) z-major."""
    b, nb, r, c = blocks.shape
    bx, by, bz = core or CORE
    v = blocks.reshape(b, cells // bx, cells // by, cells // bz, bx, by, bz, c)
    v = v.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return v.reshape(b, cells ** 3, c)


def _wrap_pad(grid: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, c, c, c, C) -> circularly padded (B, c+2w, c+2w, c+2w, C)."""
    return jnp.pad(grid, ((0, 0), (w, w), (w, w), (w, w), (0, 0)), mode="wrap")


def block_patches(values: jnp.ndarray, cells: int, window: int,
                  core=None) -> jnp.ndarray:
    """(B, N, C) -> (B, NB, P, C): each core block's dilated patch.

    Built with per-axis strided slices of the padded cube (ex+ey+ez ops)."""
    b, n, c = values.shape
    bx, by, bz = core or CORE
    (nbx, nby, nbz), (ex, ey, ez) = block_geometry(cells, window, core)
    padded = _wrap_pad(values.reshape(b, cells, cells, cells, c), window)
    pc = cells + 2 * window

    # axis by axis: gather all window-extent offsets with stride = core
    # size, always slicing/stacking on a LOW-RANK view (see patches_fold
    # for the tile-layout pathology high-rank intermediates trigger)
    p0 = padded.reshape(b, pc, pc * pc * c)
    px = jnp.stack([p0[:, lx:lx + nbx * bx:bx] for lx in range(ex)], axis=2)
    # (B, nbx, ex, pc*pc*C)
    px = px.reshape(b * nbx * ex, pc, pc * c)
    py = jnp.stack([px[:, ly:ly + nby * by:by] for ly in range(ey)], axis=2)
    # (B*nbx*ex, nby, ey, pc*C)
    py = py.reshape(b * nbx * ex * nby * ey, pc, c)
    pz = jnp.stack([py[:, lz:lz + nbz * bz:bz] for lz in range(ez)], axis=2)
    # (B*nbx*ex*nby*ey, nbz, ez, C)
    pz = pz.reshape(b, nbx, ex, nby, ey, nbz, ez, c)
    pz = pz.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return pz.reshape(b, nbx * nby * nbz, ex * ey * ez, c)


def patches_fold(acc: jnp.ndarray, cells: int, window: int,
                 core=None) -> jnp.ndarray:
    """(B, NB, P, C) per-block accumulations -> (B, N, C) summed cube.

    Exact transpose of block_patches: strided slice-adds into the padded
    cube, then circular fold of the pad rings."""
    b, nb, p, c = acc.shape
    bx, by, bz = core or CORE
    (nbx, nby, nbz), (ex, ey, ez) = block_geometry(cells, window, core)
    w = window
    a = acc.reshape(b, nbx, nby, nbz, ex, ey, ez, c)
    a = a.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B, nbx, ex, nby, ey, nbz, ez, C)

    pc = cells + 2 * w
    # inverse of the strided extraction, SEPARABLY per axis (ex+ey+ez ops,
    # not ex*ey*ez): fold z, then y, then x.  Each fold runs on a LOW-RANK
    # view (rows, strided-dim[, tail]) — high-rank intermediates with tiny
    # minor dims invite pathological TPU tile layouts (measured at 64^3
    # with the (4,4,8) core: a (1,16,8,8,12,8,1,16) f32 temp padded 170x,
    # 6 MB -> 1 GB, an instant OOM).
    # a: (B, nbx, ex, nby, ey, nbz, ez, C)
    rows_z = b * nbx * ex * nby * ey
    a3 = a.reshape(rows_z, nbz, ez, c)
    az = jnp.zeros((rows_z, pc, c), acc.dtype)
    for lz in range(ez):
        az = az.at[:, lz:lz + nbz * bz:bz, :].add(a3[:, :, lz, :])
    # az rows split back: (B*nbx*ex, nby, ey, pc*C), fold y
    rows_y = b * nbx * ex
    a4 = az.reshape(rows_y, nby, ey, pc * c)
    ay = jnp.zeros((rows_y, pc, pc * c), acc.dtype)
    for ly in range(ey):
        ay = ay.at[:, ly:ly + nby * by:by, :].add(a4[:, :, ly, :])
    # ay rows split back: (B, nbx, ex, pc*pc*C), fold x
    a5 = ay.reshape(b, nbx, ex, pc * pc * c)
    out = jnp.zeros((b, pc, pc * pc * c), acc.dtype)
    for lx in range(ex):
        out = out.at[:, lx:lx + nbx * bx:bx, :].add(a5[:, :, lx, :])
    out = out.reshape(b, pc, pc, pc, c)
    # fold the circular pad rings back: padded coords [0, w) belong to
    # global [n-w, n), and [w+n, n+2w) to [0, w)
    for axis in (1, 2, 3):
        core = jax.lax.slice_in_dim(out, w, w + cells, axis=axis)
        head = jax.lax.slice_in_dim(out, 0, w, axis=axis)
        tail = jax.lax.slice_in_dim(out, w + cells, 2 * w + cells, axis=axis)
        sel_hi = [slice(None)] * core.ndim
        sel_hi[axis] = slice(cells - w, cells)
        core = core.at[tuple(sel_hi)].add(head)
        sel_lo = [slice(None)] * core.ndim
        sel_lo[axis] = slice(0, w)
        core = core.at[tuple(sel_lo)].add(tail)
        out = core
    return out.reshape(b, cells ** 3, c)


def edge_block_positions(idx: jnp.ndarray, cells: int, window: int,
                         core=None) -> jnp.ndarray:
    """(B, N, K) neighbor ids -> (B, NB, R*K) flat positions within each core
    block's dilated patch (block-major edge order)."""
    b, n, k = idx.shape
    bx, by, bz = core or CORE
    (nbx, nby, nbz), (ex, ey, ez) = block_geometry(cells, window, core)
    w = window

    ii = jnp.arange(n, dtype=jnp.int32)
    x = ii // (cells * cells)
    y = (ii // cells) % cells
    z = ii % cells
    nx = idx // (cells * cells)
    ny = (idx // cells) % cells
    nz = idx % cells

    def wrapd(a, b_):
        return jnp.mod(a - b_ + cells // 2, cells) - cells // 2

    dx = wrapd(nx, x[None, :, None])
    dy = wrapd(ny, y[None, :, None])
    dz = wrapd(nz, z[None, :, None])
    lx = (x % bx)[None, :, None] + w + dx
    ly = (y % by)[None, :, None] + w + dy
    lz = (z % bz)[None, :, None] + w + dz
    p = (lx * ey + ly) * ez + lz                     # (B, N, K)
    # reorder particles to block-major and flatten edges per block
    p_blocks = cube_to_blocks(p.astype(jnp.int32), cells, core)  # (B, NB, R, K)
    return p_blocks.reshape(b, -1, bx * by * bz * k)


def block_masks(idx: jnp.ndarray, cells: int, window: int,
                dtype=jnp.bfloat16, core=None,
                drop_self_slot0: bool = False) -> jnp.ndarray:
    """(B, N, K) lattice-kNN ids -> (B, NB, ET, P) one-hot selection masks.

    The masks depend only on idx, so they are computed ONCE per train step
    and shared by every masked gather/scatter in the network — forward AND
    backward (autodiff of the einsums reads the same array).  This is the
    "precomputed shared one-hot" formulation from the PERF.md ledger: each
    neighbor op becomes one XLA batched matmul with no Mosaic per-grid-step
    floor and no per-op one-hot regeneration.

    drop_self_slot0: idx[:, :, 0] is the particle itself (the knn
    include_self guarantee) — its selection is an identity copy, so the
    masks cover slots 1..K-1 only (ET = R*(K-1)): 1/K less mask HBM
    traffic, which is the step's dominant cost.  Consumers must then pass
    self_slot0=True to masked_gather/masked_scatter_add (the registry
    records this on the lattice tuple; see lattice_self_free).

    {0, 1} are exact in bf16, so bf16 masks lose nothing on the one-hot
    side; pass dtype=jnp.float32 for exact-mode dots.
    """
    if drop_self_slot0:
        idx = idx[:, :, 1:]
    b, n, k = idx.shape
    core = core or MASKED_CORE
    _, (ex, ey, ez) = block_geometry(cells, window, core)
    p = edge_block_positions(idx, cells, window, core)    # (B, NB, ET)
    lane = jnp.arange(ex * ey * ez, dtype=jnp.int32)
    return jax.lax.stop_gradient((p[..., None] == lane).astype(dtype))


def block_positions(idx: jnp.ndarray, cells: int, window: int,
                    core=None, drop_self_slot0: bool = False) -> jnp.ndarray:
    """(B, N, K) lattice-kNN ids -> (B, NB, ET) int32 per-edge patch
    positions: the mask-free masked path (mask_dtype='index').

    This is the information the one-hot masks are a P-fold blowup of; the
    idx-dot kernels (ops/pallas/idx_kernels.py) synthesize the one-hot tile
    in VMEM per block, so NOTHING mask-shaped ever touches HBM — neither
    the once-per-step build nor the per-pass reads that are the masked
    path's dominant traffic.  Same drop_self_slot0 contract as block_masks.
    """
    if drop_self_slot0:
        idx = idx[:, :, 1:]
    return jax.lax.stop_gradient(
        edge_block_positions(idx, cells, window, core or MASKED_CORE))


def _mask_contract_gather(masks: jnp.ndarray, patches: jnp.ndarray):
    """(B, NB, ET, P) one-hot x (B, NB, P, C) -> (B, NB, ET, C) f32.

    bf16/f32 masks: one XLA batched einsum (the swept-optimal path).
    int8/int4 masks: the Pallas mask-dot kernel — converts the mask tile to
    bf16 in VMEM, cutting the dominant per-pass HBM traffic 2x/4x (XLA
    cannot: its convert materializes a bf16 copy; PERF.md round-3 table).
    ndim-3 int32 positions (block_positions): the idx-dot kernel — NO mask
    array at all, the one-hot is synthesized in VMEM per block."""
    if masks.ndim == 3:
        from nbody_tpu.ops.pallas.idx_kernels import idx_dot_gather
        return idx_dot_gather(masks, patches)
    if masks.dtype in (jnp.int8, jnp.int4):
        from nbody_tpu.ops.pallas.mask_kernels import mask_dot_gather
        return mask_dot_gather(masks, patches)
    return jnp.einsum("bnep,bnpc->bnec", masks, patches.astype(masks.dtype),
                      preferred_element_type=jnp.float32)


def _mask_contract_scatter(masks: jnp.ndarray, edges: jnp.ndarray,
                           p_size: Optional[int] = None):
    """Transposed twin: (B, NB, ET, P) x (B, NB, ET, C) -> (B, NB, P, C).

    p_size (= prod(dilated patch extents)) is only needed by the ndim-3
    positions path — the one-hot paths carry it in masks.shape[3]."""
    if masks.ndim == 3:
        from nbody_tpu.ops.pallas.idx_kernels import idx_dot_scatter
        return idx_dot_scatter(masks, edges, p_size)
    if masks.dtype in (jnp.int8, jnp.int4):
        from nbody_tpu.ops.pallas.mask_kernels import mask_dot_scatter
        return mask_dot_scatter(masks, edges)
    return jnp.einsum("bnep,bnec->bnpc", masks, edges.astype(masks.dtype),
                      preferred_element_type=jnp.float32)


def masked_gather(values: jnp.ndarray, masks: jnp.ndarray, cells: int,
                  window: int, core=None,
                  self_slot0: bool = False) -> jnp.ndarray:
    """values (B, N, C), masks from block_masks -> (B, N, K, C).

    One XLA batched matmul per call: (NB x) (ET, P) @ (P, C).
    self_slot0: masks were built with drop_self_slot0 — slot 0 of the
    output is the identity copy of `values` (zero mask traffic for it)."""
    b, n, c = values.shape
    core = core or MASKED_CORE
    bx, by, bz = core
    r = bx * by * bz
    k = masks.shape[2] // r
    patches = block_patches(values, cells, window, core)  # (B, NB, P, C)
    out = _mask_contract_gather(masks, patches)
    out = out.reshape(b, -1, r, k * c)
    out = blocks_to_cube(out, cells, core).reshape(b, n, k, c).astype(
        values.dtype)
    if self_slot0:
        out = jnp.concatenate([values[:, :, None, :], out], axis=2)
    return out


def masked_scatter_add(vals: jnp.ndarray, masks: jnp.ndarray, cells: int,
                       window: int, core=None,
                       self_slot0: bool = False) -> jnp.ndarray:
    """vals (B, N, K, C), masks from block_masks -> (B, N, C) sums by id.

    The transposed batched matmul of masked_gather, plus the overlap-add
    fold of per-block patch accumulations.  self_slot0: slot 0 targets the
    particle itself — added directly, outside the masks."""
    self_part = None
    if self_slot0:
        self_part = vals[:, :, 0, :]
        vals = vals[:, :, 1:, :]
    b, n, k, c = vals.shape
    core = core or MASKED_CORE
    bx, by, bz = core
    _, ext = block_geometry(cells, window, core)
    v_blocks = cube_to_blocks(vals.reshape(b, n, k * c), cells, core)
    v_blocks = v_blocks.reshape(b, -1, bx * by * bz * k, c)
    acc = _mask_contract_scatter(masks, v_blocks, ext[0] * ext[1] * ext[2])
    out = patches_fold(acc, cells, window, core).astype(vals.dtype)
    if self_part is not None:
        out = out + self_part
    return out


def masked_gather_blocks(values: jnp.ndarray, masks: jnp.ndarray, cells: int,
                         window: int, core=None,
                         self_slot0: bool = False) -> jnp.ndarray:
    """Cube node field (B, N, C) -> BLOCK-MAJOR edges (B, NB, R, K, C).

    Like masked_gather but skips the blocks_to_cube transpose of the big
    edge tensor: callers that keep edge activations block-major (the masked
    shiftinv network) avoid two full edge-tensor reorders per op."""
    b, n, c = values.shape
    core = core or MASKED_CORE
    bx, by, bz = core
    r = bx * by * bz
    k = masks.shape[2] // r
    patches = block_patches(values, cells, window, core)  # (B, NB, P, C)
    out = _mask_contract_gather(masks, patches)
    out = out.reshape(b, -1, r, k, c).astype(values.dtype)
    if self_slot0:
        selfv = cube_to_blocks(values, cells, core)       # (B, NB, R, C)
        out = jnp.concatenate([selfv[:, :, :, None, :], out], axis=3)
    return out


def masked_scatter_add_blocks(vals: jnp.ndarray, masks: jnp.ndarray,
                              cells: int, window: int, core=None,
                              self_slot0: bool = False) -> jnp.ndarray:
    """BLOCK-MAJOR edges (B, NB, R, K, C) -> cube node sums (B, N, C)."""
    self_part = None
    if self_slot0:
        self_part = vals[:, :, :, 0, :]                   # (B, NB, R, C)
        vals = vals[:, :, :, 1:, :]
    b, nb, r, k, c = vals.shape
    core = core or MASKED_CORE
    _, ext = block_geometry(cells, window, core)
    v = vals.reshape(b, nb, r * k, c)
    acc = _mask_contract_scatter(masks, v, ext[0] * ext[1] * ext[2])
    out = patches_fold(acc, cells, window, core).astype(vals.dtype)
    if self_part is not None:
        out = out + blocks_to_cube(self_part, cells, core)
    return out


def edges_cube_to_blocks(edges: jnp.ndarray, cells: int,
                         core=None) -> jnp.ndarray:
    """(B, N, K, C) -> (B, NB, R, K, C) block-major edge activations."""
    b, n, k, c = edges.shape
    core = core or MASKED_CORE
    bx, by, bz = core
    v = cube_to_blocks(edges.reshape(b, n, k * c), cells, core)
    return v.reshape(b, -1, bx * by * bz, k, c)


def nodes_blocks_to_cube(x: jnp.ndarray, cells: int, core=None) -> jnp.ndarray:
    """(B, NB, R, C) block-major node field -> (B, N, C)."""
    return blocks_to_cube(x, cells, core or MASKED_CORE)


def block_gather(values: jnp.ndarray, idx: jnp.ndarray, cells: int,
                 window: int, fast: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
    """values (B, N, C), idx (B, N, K) lattice-kNN ids -> (B, N, K, C)."""
    from nbody_tpu.ops.pallas.block_kernels import block_gather_pallas
    b, n, c = values.shape
    k = idx.shape[-1]
    patches = block_patches(values, cells, window)
    p = edge_block_positions(idx, cells, window)
    out = block_gather_pallas(p, patches, fast=fast, interpret=interpret)
    bx, by, bz = CORE
    out = out.reshape(b, -1, bx * by * bz, k * c)
    return blocks_to_cube(out, cells).reshape(b, n, k, c)


def block_scatter_add(vals: jnp.ndarray, idx: jnp.ndarray, cells: int,
                      window: int, fast: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """vals (B, N, K, C), idx (B, N, K) -> (B, N, C) summed by target id."""
    from nbody_tpu.ops.pallas.block_kernels import block_scatter_pallas
    b, n, k, c = vals.shape
    bx, by, bz = CORE
    p = edge_block_positions(idx, cells, window)
    v_blocks = cube_to_blocks(vals.reshape(b, n, k * c), cells)
    v_blocks = v_blocks.reshape(b, -1, bx * by * bz * k, c)
    acc = block_scatter_pallas(p, v_blocks, block_geometry(cells, window)[1],
                               fast=fast, interpret=interpret)
    return patches_fold(acc, cells, window)
