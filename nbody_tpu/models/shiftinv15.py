"""Shift-invariant graph network, full 15-operator equivariant basis.

Reference twins: shift_inv_15op_layer (graph.py:20-200),
network_func_15op_shift_inv_za (graph.py:202-215),
model_func_15op_shift_inv_za (graph.py:218-229).
Basis: the 15 linear equivariant operators on edge-valued functions of a
graph (openreview Syx72jC9tm), cited at reference graph.py:24.

The reference operates on a *symmetrized* adjacency whose nonzero count S
varies per sample (graph.py:28-37) — dynamic shapes, anathema to XLA — and
its adj-dict index builder does not exist anywhere in the repo (the 15-op
path was never runnable).  TPU-native rework, fully static:

  Block-structured symmetrized graph (2, N, K) edge slots per sample:
    block A: the directed kNN edges (n -> idx[n,k]);
    block B: the reversed edges (idx[n,k] -> n), masked where the reverse
             already exists in block A.  The masked union IS the
             symmetrized adjacency.

  In this layout most of the 15 operators are FREE reshapes/means
  (row pools over block A, diag extract/scatter via the guaranteed
  self-at-slot-0, global/diag pools), and the rest reduce to the banded
  MXU gather/scatter of ops/banded.py (XLA's native gather is pathologically
  slow on this TPU).  The transpose operator becomes one banded gather of
  K-wide rows plus a K-one-hot contraction.

`flat/` variants (build_sym_graph_flat, shift_inv_15op_layer_flat) keep the
original edge-list formulation as the reference oracle for tests.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from nbody_tpu.models.base import init_network_params
from nbody_tpu.ops.banded import neighbor_gather, neighbor_scatter_add
from nbody_tpu.physics.pbc import min_image_diff

# Masked-path transpose implementation (PERF.md round-5 ledger item 2 —
# the 15-op family's K-wide pass payload):
#   "gather"  — one K*C-wide row gather + a destination-side (K,K) one-hot
#               contraction: writes the (b, NB, ET, K*C) wide edge tensor,
#               re-reads it for the 14-slice contraction, and its VJP
#               updates 14 slices of the wide cotangent.
#   "scatter" — each mutual SOURCE edge (m, j) sends its value into the
#               destination-slot channel group rev_pos[m, j] of ONE fused
#               scatter (shared with the pool scatter: still 2 mask passes
#               per layer).  Collision-free, hence exact: a destination
#               (n, k') determines m = idx[n, k'], and m's slot pointing
#               back at n is unique — at most one contributor.  The wide
#               tensor is built once (K channel slices), never re-read for
#               a contraction, and the x_col/x_row gather shrinks from
#               K*C+2q wide to 2q wide.  Bit-identical to "gather" (each
#               from_a entry is one value through one-hot dots both ways).
#   "scan"    — lax.scan over the K source slots: K narrow cw-wide gather
#               passes, accumulated against the slot selector.  Same
#               one-hot FLOPs, but no K*C-wide intermediate tensor ever
#               exists — built for the round-5 ablation finding that the
#               wide ride costs ~269 ms in-step vs ~50 ms isolated.
# Swap with set_transpose_impl() BEFORE building/jitting a model (same
# trace-time caveats as ops.blocked.set_core).
import os as _os
TRANSPOSE_IMPL = _os.environ.get("NBODY15_TRANSPOSE", "gather")

# Profiling-only ablation hook (scripts/profile15_parts.py): a set of
# component names the masked-path GATHER-impl layer skips at trace time, so
# program deltas localize the step's cost per component.  MUST stay empty
# outside profiling — ablated programs compute a different function.
#   "transpose"  drop op 2 (the K*C-wide gather ride + slot contraction)
#   "slotsum"    keep the wide ride, drop the (K,K) slot contraction
#   "bcast"      drop ops 4/8/14 + 5/7/15 (the x_col/x_row gather rides)
#   "diag"       drop the fused diagonal write (ops 3/6/9/11/13 + diag bias)
#   "pools"      drop the fused scatter pass (h_r/h_c become zeros)
#   "maskmul"    drop the final block-B liveness mask multiply
ABLATE: frozenset = frozenset()


def set_ablate(names=()) -> None:
    """Set the profiling ablation set (trace-time; rebuild jits after)."""
    global ABLATE
    names = frozenset(names)
    known = {"transpose", "slotsum", "bcast", "diag", "pools", "maskmul"}
    assert names <= known, names - known
    ABLATE = names


def set_transpose_impl(impl: str):
    """Swap the masked-path transpose implementation
    ("gather"/"scatter"/"scan")."""
    assert impl in ("gather", "scatter", "scan"), impl
    global TRANSPOSE_IMPL
    TRANSPOSE_IMPL = impl


def init_shiftinv15_params(key: jax.Array, channels: Sequence[int],
                           dtype=jnp.float32):
    """Per layer: W (15, k_in, k_out), B (2, k_out): [diag bias, global bias]
    (reference graph.py:125-128, utils.py:179-180)."""
    return init_network_params(key, channels, num_weights=15, num_biases=2,
                               dtype=dtype)


# ---------------------------------------------------------------------------
# Block-structured symmetrized graph
# ---------------------------------------------------------------------------

class BlockSymGraph(NamedTuple):
    """Batched block-structured symmetrized kNN graph (leading batch dim)."""
    idx: jnp.ndarray         # (b, N, K) neighbor ids, self at slot 0
    rev_pos: jnp.ndarray     # (b, N, K) j with idx[c, j] == n (if it exists)
    mask_b: jnp.ndarray      # (b, N, K) 1 where the reversed edge is live
    deg: jnp.ndarray         # (b, N) symmetrized degree of each particle


def _lattice_offsets(idx: jnp.ndarray, cells: int) -> jnp.ndarray:
    """Per-edge lattice offsets site(idx) - site(row), wrapped per
    coordinate: (b, N, K, 3) int32, each in [-w, w] for lattice-kNN idx."""
    n = idx.shape[1]

    def coords(a):
        return jnp.stack([a // (cells * cells), (a // cells) % cells,
                          a % cells], axis=-1)

    c_n = coords(jnp.arange(n, dtype=jnp.int32))          # (N, 3)
    c_m = coords(idx)                                     # (b, N, K, 3)
    return jnp.mod(c_m - c_n[None, :, None, :] + cells // 2,
                   cells) - cells // 2


def build_block_sym_graph(idx: jnp.ndarray, band: Optional[int] = None,
                          lattice=None, masks=None) -> BlockSymGraph:
    """idx (b, N, K) with self at slot 0 -> BlockSymGraph.

    lattice=(cells, window): the fast path for lattice-kNN cubes — the
    reverse-edge search gathers each neighbor's OFFSET TRIPLETS (small
    ints <= 2w, exact in bf16) through the block kernels, instead of
    absolute ids (which exceed bf16's 256-integer range at 32^3 and would
    need the ~6x slower exact f32 kernel path).  Edge m -> n exists iff
    one of m's offsets equals the negated offset of n -> m (sites are
    unique within the window since 2w < cells).
    """
    b, n, k = idx.shape
    if lattice is not None and n == lattice[0] ** 3:
        cells, w = lattice[0], lattice[1]
        d = _lattice_offsets(idx, cells)                  # (b, N, K, 3)
        payload = (d + w).reshape(b, n, 3 * k).astype(jnp.float32)
        nbr = neighbor_gather(payload, idx, band, lattice, masks=masks)
        nbr = jnp.round(nbr).astype(jnp.int32).reshape(b, n, k, k, 3) - w
        hit = jnp.all(nbr == -d[:, :, :, None, :], axis=-1)   # (b, N, K, K)
    else:
        particles = jnp.arange(n, dtype=jnp.int32)
        # nbr_nbrs[b,n,k,j] = idx[b, idx[b,n,k], j], via the banded MXU
        # gather (rows of idx are K ints; gather them as a K-channel field).
        # exact=True is load-bearing: ids exceed 256 at 32^3, so the default
        # bf16 fast path would round them and corrupt the symmetrized graph.
        nbr_nbrs = neighbor_gather(idx.astype(jnp.float32), idx, band,
                                   exact=True)
        nbr_nbrs = jnp.round(nbr_nbrs).astype(jnp.int32)  # (b, N, K, K)
        hit = nbr_nbrs == particles[None, :, None, None]
    rev_exists = jnp.any(hit, axis=-1)
    rev_pos = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    mask_b = (~rev_exists).astype(jnp.float32)
    # symmetrized degree: K (block A) + live block-B edges pointing at n
    cnt_b = neighbor_scatter_add(mask_b[..., None], idx, band, lattice,
                                 masks=masks)[..., 0]
    deg = cnt_b + jnp.float32(k)
    return BlockSymGraph(idx=idx.astype(jnp.int32), rev_pos=rev_pos,
                         mask_b=mask_b, deg=deg)


def block_edge_features_za(pos: jnp.ndarray, graph: BlockSymGraph,
                           za_disp: jnp.ndarray, box: float,
                           band: Optional[int] = None,
                           lattice=None, masks=None) -> jnp.ndarray:
    """(b, N, 3) pos -> (b, 2, N, K, 3) block edge features.

    Block A: min-image relative positions with ZA displacement on the
    self-edge (reference graph.py:289-343); block B: negated relative
    positions (the reversed edge's feature), masked.
    """
    from nbody_tpu.ops.graph_features import neighbor_positions
    nbr = neighbor_positions(pos, graph.idx, box, band, lattice, masks)
    edges = min_image_diff(nbr, pos[:, :, None, :], box)
    ea = edges.at[:, :, 0, :].set(za_disp)
    eb = (-edges) * graph.mask_b[..., None]
    return jnp.stack([ea, eb], axis=1)


# ---------------------------------------------------------------------------
# The 15 operators in block form
# ---------------------------------------------------------------------------

def _row_pool(h: jnp.ndarray, g: BlockSymGraph, band, lattice=None,
              masks=None) -> jnp.ndarray:
    """Mean over edges grouped by ROW id -> (b, N, C).

    Block A rows are n (free sum over K); block B rows are idx (banded
    scatter of the masked values)."""
    sums = jnp.sum(h[:, 0], axis=2)
    sums += neighbor_scatter_add(h[:, 1] * g.mask_b[..., None], g.idx, band,
                                 lattice, masks=masks)
    return sums / g.deg[..., None]


def _bcast_col(x: jnp.ndarray, g: BlockSymGraph, band, lattice=None,
               masks=None) -> jnp.ndarray:
    """Node field (b, N, C) -> edge field by column id (b, 2, N, K, C)."""
    a = neighbor_gather(x, g.idx, band, lattice, masks=masks)
    b_ = jnp.broadcast_to(x[:, :, None, :], a.shape)
    return jnp.stack([a, b_], axis=1)


def _bcast_row(x: jnp.ndarray, g: BlockSymGraph, band, lattice=None,
               masks=None) -> jnp.ndarray:
    """Node field (b, N, C) -> edge field by row id (b, 2, N, K, C)."""
    b_ = neighbor_gather(x, g.idx, band, lattice, masks=masks)
    a = jnp.broadcast_to(x[:, :, None, :], b_.shape)
    return jnp.stack([a, b_], axis=1)


def _transpose(h: jnp.ndarray, g: BlockSymGraph, band, lattice=None,
               masks=None) -> jnp.ndarray:
    """Edge transpose: value at (c, r) for each slot (r, c).

    A-slot (n, k): the reverse edge is either A-slot (c, rev_pos) — or the
    masked B mirror (n, k).  B-slot transpose is its A mirror.

    from_a[n,k] = ha[idx[n,k], rev_pos[n,k]]: ONE K*C-channel-wide row
    gather followed by a (K, K) slot contraction against onehot(rev_pos).
    The gather and the contraction are both linear, so this is exactly the
    reverse-edge permutation composed with the neighbor selection — staged,
    because composing them into one selection array would need a P*K-wide
    one-hot (~59 GB at 32^3 b4); the staged form costs one neighbor-op
    pass (whose shared-mask traffic is channel-INDEPENDENT, ops/blocked)
    plus a (b,N,K,K*C) intermediate.  The contraction runs as K fused
    slice-multiplies on the flat 4-D layout: a reshaped 5-D (b,N,K,K,C)
    einsum would tile-pad its tiny minor dims ~2.3x (the round-2 OOM was
    this, in f32: 6.1 GB -> 14 GB), while the 4-D slices stay unpadded.

    On the banded/Pallas path (masks=None) kernel cost DOES scale with the
    gathered width, so wide rows only win up to K*C <= 256; beyond that a
    lax.scan over the K source slots (one C-wide gather each) keeps peak
    memory at one (b,N,K,C) slice per step."""
    bsz, _, n, k, c = h.shape
    ha = h[:, 0]
    sel = jax.nn.one_hot(g.rev_pos, k, dtype=h.dtype)          # (b, N, K, K)

    if masks is not None or k * c <= 256:
        rows_wide = neighbor_gather(ha.reshape(bsz, n, k * c), g.idx, band,
                                    lattice, masks=masks)      # (b, N, K, K*C)
        # [., n, k, j*C : (j+1)*C] = ha[idx[n,k], j, :]
        from_a = sum(rows_wide[..., j * c:(j + 1) * c] * sel[..., j, None]
                     for j in range(k))
    else:
        ha_by_slot = jnp.moveaxis(ha, 2, 0)                    # (K, b, N, C)
        sel_by_slot = jnp.moveaxis(sel, 3, 0)                  # (K, b, N, K)

        def body(acc, xs):
            ha_j, sel_j = xs
            gj = neighbor_gather(ha_j, g.idx, band, lattice, masks=masks)
            return acc + gj * sel_j[..., None], None

        from_a, _ = jax.lax.scan(
            body, jnp.zeros((bsz, n, k, c), h.dtype),
            (ha_by_slot, sel_by_slot))
    rev_exists = (1.0 - g.mask_b)[..., None]
    ta = from_a * rev_exists + h[:, 1] * g.mask_b[..., None]
    tb = ha * g.mask_b[..., None]
    return jnp.stack([ta, tb], axis=1)


def _at_dia(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Node field (b, N, C) scattered onto the diagonal (self) slots."""
    out = jnp.zeros(like.shape[:-1] + (x.shape[-1],), x.dtype)
    return out.at[:, 0, :, 0, :].set(x)


def shift_inv_15op_layer(h: jnp.ndarray, graph: BlockSymGraph,
                         layer_params: Dict[str, jnp.ndarray],
                         is_last: bool = False,
                         band: Optional[int] = None,
                         lattice=None, masks=None) -> jnp.ndarray:
    """One 15-op layer. h (b, 2, N, K, C) masked block edge features.

    Returns (b, 2, N, K, q), or (b, N, q) if is_last (pooled over rows,
    reference graph.py:197-198).
    """
    w = layer_params["W"]        # (15, C, q)
    bias = layer_params["B"]     # (2, q): [diag, global]
    dt = h.dtype
    g = graph

    def mm(x, wi):
        return jnp.einsum("...c,cq->...q", x, wi, preferred_element_type=dt)

    c_in = h.shape[-1]
    h_d = h[:, 0, :, 0, :]                       # (b, N, C) diagonal
    # both pools in ONE scatter (channel-concatenated): the col pool (mean
    # by column id) scatters block A + free-sums masked block B; the row
    # pool (mean by row id) free-sums block A + scatters masked block B —
    # fusing the two scatters halves the passes over the masks/band
    hb_m = h[:, 1] * g.mask_b[..., None]
    s2 = neighbor_scatter_add(jnp.concatenate([h[:, 0], hb_m], axis=-1),
                              g.idx, band, lattice, masks=masks)
    h_r = (s2[..., :c_in] + jnp.sum(hb_m, axis=2)) / g.deg[..., None]
    h_c = (jnp.sum(h[:, 0], axis=2) + s2[..., c_in:]) / g.deg[..., None]
    live = jnp.sum(g.deg, axis=-1)               # total live edges per sample
    h_a = (jnp.sum(h[:, 0], axis=(1, 2))
           + jnp.sum(h[:, 1] * g.mask_b[..., None], axis=(1, 2))) / live[:, None]
    h_p = jnp.mean(h_d, axis=1)                  # pool diagonal (b, C)

    n = h.shape[2]
    out = mm(h, w[0])                                            # 1 identity
    # ops 4, 8, 14 all end in the same col-broadcast (a gather) and ops
    # 5, 7, 15 in the same row-broadcast — gather and broadcast are linear,
    # so each group is ONE gather of the summed projected fields instead
    # of three (6 -> 2 mask/band passes per layer)
    x_col = mm(h_r, w[3]) + mm(h_c, w[7]) + mm(h_d, w[13])
    x_row = mm(h_r, w[4]) + mm(h_c, w[6]) + mm(h_d, w[14])
    if w.shape[-1] < w.shape[-2]:
        out += _transpose(mm(h, w[1]), g, band, lattice, masks)
    else:
        out += mm(_transpose(h, g, band, lattice, masks), w[1])
    out += _bcast_col(x_col, g, band, lattice, masks)            # 4, 8, 14
    out += _bcast_row(x_row, g, band, lattice, masks)            # 5, 7, 15
    out += _at_dia(mm(h_d, w[2]), h)                             # 3 diag->diag
    out += _at_dia(mm(h_r, w[5]), h)                             # 6 rows->diag
    out += _at_dia(mm(h_c, w[8]), h)                             # 9 cols->diag
    out += mm(h_a, w[9])[:, None, None, None, :]                 # 10 all->all
    out += _at_dia(jnp.broadcast_to(mm(h_a, w[10])[:, None, :],
                                    (h.shape[0], n, w.shape[-1])), h)  # 11
    out += mm(h_p, w[11])[:, None, None, None, :]                # 12 diag->all
    out += _at_dia(jnp.broadcast_to(mm(h_p, w[12])[:, None, :],
                                    (h.shape[0], n, w.shape[-1])), h)  # 13
    out += _at_dia(jnp.broadcast_to(bias[0], (h.shape[0], n, bias.shape[-1])), h)
    out += bias[1]

    mask = jnp.stack([jnp.ones_like(g.mask_b), g.mask_b], axis=1)[..., None]
    out = out * mask
    if is_last:
        return _row_pool(out, g, band, lattice, masks)
    return out


def _shift_inv_15op_layer_blocks(hB: jnp.ndarray, layer_params,
                                 masks, lattice, selB, mbB, deg, live,
                                 is_last: bool,
                                 transpose_impl: str = "gather") -> jnp.ndarray:
    """15-op layer on BLOCK-MAJOR edges hB (b, 2, NB, R, K, C) via the
    shared masks — the masked-path twin of shift_inv_15op_layer.

    Traffic design (the family's fast path):
      * exactly TWO mask passes forward — one fused scatter and one fused
        gather (all the rides are linear; shared-mask traffic is
        channel-independent) — the same count as a 4-op layer;
      * edge tensors stay block-major across the whole network; node
        fields, which are K times smaller, hop layouts instead;
      * the five diagonal contributions (ops 3, 6, 9, 11, 13 + diag bias)
        combine into ONE node field written to the diag slots — the cube
        layer materializes five full-size _at_dia tensors for them.

    transpose_impl (module docstring at TRANSPOSE_IMPL): "gather" rides the
    transpose's K*C-wide rows on the gather pass and contracts against
    selB at the destination; "scatter" rides the source-side slot-sorted
    values on the scatter pass (selB must then be the SOURCE selector,
    masked by rev_exists — the network precomputes it).
    """
    from nbody_tpu.ops.blocked import (blocks_to_cube, cube_to_blocks,
                                       lattice_core, lattice_self_free,
                                       masked_gather_blocks,
                                       masked_scatter_add_blocks)
    w = layer_params["W"]        # (15, C, q)
    bias = layer_params["B"]     # (2, q)
    dt = hB.dtype
    core = lattice_core(lattice)
    sf = lattice_self_free(lattice)
    cl, win = lattice[0], lattice[1]
    bsz, _, nb, r, k, c_in = hB.shape
    n = nb * r
    q = w.shape[-1]
    ab = ABLATE                  # profiling hook; empty in production
    assert not ab or transpose_impl == "gather", \
        "the ablation hook supports transpose_impl='gather' only"
    ride_t = True

    def mm(x, wi):
        return jnp.einsum("...c,cq->...q", x, wi, preferred_element_type=dt)

    def to_cube(xb):                     # (b, NB, R, C) -> (b, N, C)
        return blocks_to_cube(xb, cl, core)

    pre_w = q < c_in
    if pre_w:
        # ops 1+2 share the edge-level matmul operand: one fused einsum
        # against [W1|W2] streams the big edge tensor ONCE
        o12 = mm(hB, jnp.concatenate([w[0], w[1]], axis=1))
        out, hinB = o12[..., :q], o12[..., q:]
    else:
        out, hinB = mm(hB, w[0]), hB                    # 1 identity
    cw = hinB.shape[-1]

    hbm = hB[:, 1] * mbB[..., None]
    if transpose_impl == "scatter":
        # transpose as a collision-free scatter: source edge (m, j) places
        # hin_a[m, j] into destination-slot channel group rev_pos[m, j]
        # (selB here = onehot(rev_pos) * rev_exists, source-side).  Built
        # as K channel slices — a 6-D outer-product intermediate would
        # invite pathological tile layouts on its tiny minor dims
        # (CLAUDE.md platform fact 7).
        hin_a = hinB[:, 0]
        z = jnp.concatenate([hin_a * selB[..., kk, None] for kk in range(k)],
                            axis=-1)                    # (b, NB, R, K, K*cw)
        s2z = masked_scatter_add_blocks(
            jnp.concatenate([hB[:, 0], hbm, z], axis=-1), masks, cl, win,
            core=core, self_slot0=sf)                   # cube (b,N,2C+K*cw)
        s2 = s2z[..., :2 * c_in]
        from_aB = cube_to_blocks(s2z[..., 2 * c_in:], cl, core).reshape(
            bsz, nb, r, k, cw)
    else:
        # pools: both scatters fused (channel concat), block A sums free
        if "pools" in ab:
            s2 = jnp.zeros((bsz, n, 2 * c_in), dt)
        else:
            s2 = masked_scatter_add_blocks(
                jnp.concatenate([hB[:, 0], hbm], axis=-1), masks, cl, win,
                core=core, self_slot0=sf)               # cube (b, N, 2C)
    sum_a = to_cube(jnp.sum(hB[:, 0], axis=3))          # (b, N, C)
    sum_bm = to_cube(jnp.sum(hbm, axis=3))
    # pool divisions run against f32 deg/live (ADVICE r3: bf16 deg would
    # introduce a systematic divergence vs the cube path's f32 graph.deg);
    # results cast back to the edge dtype so the block path stays bf16
    h_r = ((s2[..., :c_in] + sum_bm) / deg[..., None]).astype(dt)
    h_c = ((sum_a + s2[..., c_in:]) / deg[..., None]).astype(dt)
    h_d = to_cube(hB[:, 0, :, :, 0, :])                 # diagonal (b, N, C)
    h_a = ((jnp.sum(sum_a, axis=1) + jnp.sum(sum_bm, axis=1))
           / live[:, None]).astype(dt)
    h_p = jnp.mean(h_d, axis=1)                         # (b, C)

    # fused gather: col-broadcast (4, 8, 14) + row-broadcast (5, 7, 15),
    # plus (gather impl only) the transpose's K*C-wide rows.  The
    # transpose is an edge permutation and commutes with the channel
    # matmul — apply W first when it shrinks.
    ride_b = "bcast" not in ab
    if ride_b:
        x_col = mm(h_r, w[3]) + mm(h_c, w[7]) + mm(h_d, w[13])
        x_row = mm(h_r, w[4]) + mm(h_c, w[6]) + mm(h_d, w[14])
    if transpose_impl == "scatter":
        payload = jnp.concatenate([x_col, x_row], axis=-1)
        ggB = masked_gather_blocks(payload, masks, cl, win, core=core,
                                   self_slot0=sf)       # (b, NB, R, K, 2q)
        taB = from_aB + hinB[:, 1] * mbB[..., None]
        g_colB = ggB[..., :q]
        g_rowB = ggB[..., q:]
    elif transpose_impl == "scan":
        # transpose as a lax.scan over the K source slots: iteration j
        # gathers ONE cw-wide payload (slot j's field) and accumulates it
        # into the destination slots selecting j.  Same one-hot FLOPs as
        # the wide ride (ET*P per output element is inherent to masked
        # selection), but no (b, NB, R, K, K*cw) intermediate exists — the
        # ablation sweep measured the wide ride at ~269 ms of the 526 ms
        # forward at (8,8,8) vs its ~50 ms isolated-chain cost, i.e. the
        # blow-up tensor's materialization/pressure, not its bytes, is
        # what in-step execution pays for (PERF.md round-5 decomposition).
        ha_cube = to_cube(hinB[:, 0].reshape(bsz, nb, r, k * cw))
        ha_by_slot = jnp.moveaxis(
            ha_cube.reshape(bsz, n, k, cw), 2, 0)       # (K, b, N, cw)
        sel_by_slot = jnp.moveaxis(selB, -1, 0)         # (K, b, NB, R, K)

        def body(acc, xs):
            ha_j, sel_j = xs
            gj = masked_gather_blocks(ha_j, masks, cl, win, core=core,
                                      self_slot0=sf)    # (b, NB, R, K, cw)
            return acc + gj * sel_j[..., None], None

        from_aB, _ = jax.lax.scan(
            body, jnp.zeros((bsz, nb, r, k, cw), dt),
            (ha_by_slot, sel_by_slot))
        taB = (from_aB * (1.0 - mbB)[..., None]
               + hinB[:, 1] * mbB[..., None])
        payload = jnp.concatenate([x_col, x_row], axis=-1)
        ggB = masked_gather_blocks(payload, masks, cl, win, core=core,
                                   self_slot0=sf)       # (b, NB, R, K, 2q)
        g_colB = ggB[..., :q]
        g_rowB = ggB[..., q:]
    else:
        ride_t = "transpose" not in ab
        parts = ([to_cube(hinB[:, 0].reshape(bsz, nb, r, k * cw))]
                 if ride_t else [])
        if ride_b:
            parts += [x_col, x_row]
        if parts:
            ggB = masked_gather_blocks(
                jnp.concatenate(parts, axis=-1) if len(parts) > 1
                else parts[0], masks, cl, win, core=core,
                self_slot0=sf)                          # (b, NB, R, K, W)
        off = k * cw if ride_t else 0
        if ride_t:
            rows_wideB = ggB[..., :off]
            if "slotsum" in ab:
                from_aB = rows_wideB[..., :cw]
            else:
                from_aB = sum(rows_wideB[..., j * cw:(j + 1) * cw]
                              * selB[..., j, None] for j in range(k))
            taB = (from_aB * (1.0 - mbB)[..., None]
                   + hinB[:, 1] * mbB[..., None])
        if ride_b:
            g_colB = ggB[..., off:off + q]
            g_rowB = ggB[..., off + q:]
    if transpose_impl == "scatter" or ride_t:
        tbB = hinB[:, 0] * mbB[..., None]
        tB = jnp.stack([taB, tbB], axis=1)
        if not pre_w:
            tB = mm(tB, w[1])
        out += tB                                       # 2 transpose
    if ride_b:
        x_colB = cube_to_blocks(x_col, cl, core)
        x_rowB = cube_to_blocks(x_row, cl, core)
        out += jnp.stack([g_colB + x_rowB[:, :, :, None, :],
                          x_colB[:, :, :, None, :] + g_rowB], axis=1)

    if "diag" not in ab:
        # all five diagonal contributions + diag bias as ONE node field
        diag = (mm(h_d, w[2]) + mm(h_r, w[5]) + mm(h_c, w[8])    # 3, 6, 9
                + (mm(h_a, w[10]) + mm(h_p, w[12]) + bias[0])[:, None, :])
        out = out.at[:, 0, :, :, 0, :].add(cube_to_blocks(diag, cl, core))
    out += (mm(h_a, w[9]) + mm(h_p, w[11]) + bias[1])[:, None, None, None,
                                                      None, :]  # 10, 12
    if "maskmul" not in ab:
        mask = jnp.stack([jnp.ones_like(mbB), mbB], axis=1)[..., None]
        out = out * mask
    if is_last:
        # row pool: block A free-sums + block B masked scatter -> (b, N, q)
        s = masked_scatter_add_blocks(out[:, 1] * mbB[..., None], masks,
                                      cl, win, core=core, self_slot0=sf)
        return ((to_cube(jnp.sum(out[:, 0], axis=3)) + s)
                / deg[..., None]).astype(dt)
    return out


def _shiftinv15_network_blocks(params, edges: jnp.ndarray,
                               graph: BlockSymGraph, activation,
                               remat: bool, lattice, masks) -> jnp.ndarray:
    """Masked-path network: block-major edge activations end to end."""
    import functools
    from nbody_tpu.ops.blocked import cube_to_blocks, lattice_core
    core = lattice_core(lattice)
    cl = lattice[0]
    bsz, _, n, k, c = edges.shape
    hB = cube_to_blocks(edges.reshape(bsz * 2, n, k * c), cl, core)
    nb, r = hB.shape[1], hB.shape[2]
    hB = hB.reshape(bsz, 2, nb, r, k, c)
    selB = cube_to_blocks(
        jax.nn.one_hot(graph.rev_pos, k, dtype=edges.dtype).reshape(
            bsz, n, k * k), cl, core).reshape(bsz, nb, r, k, k)
    mbB = cube_to_blocks(graph.mask_b.astype(edges.dtype)[..., None]
                         .reshape(bsz, n, k), cl, core)
    timpl = TRANSPOSE_IMPL
    if timpl == "scatter":
        # source-side selector: a non-mutual edge's rev_pos is a bogus
        # argmax(0) = 0 — masking by rev_exists keeps it from contaminating
        # the destination's self group (see the layer docstring)
        selB = selB * (1.0 - mbB)[..., None]
    # f32 regardless of compute dtype — see the pool divisions in the layer
    deg = graph.deg.astype(jnp.float32)
    live = jnp.sum(deg, axis=-1)
    num_layers = len(params)
    for i, layer_params in enumerate(params):
        is_last = i == num_layers - 1
        fn = functools.partial(_shift_inv_15op_layer_blocks, masks=masks,
                               lattice=lattice, selB=selB, mbB=mbB,
                               deg=deg, live=live, is_last=is_last,
                               transpose_impl=timpl)
        if remat:
            fn = jax.checkpoint(fn)
        hB = fn(hB, layer_params)
        if not is_last:
            hB = activation(hB)
    return hB


def shiftinv15_network(params: List[Dict[str, jnp.ndarray]], edges: jnp.ndarray,
                       graph: BlockSymGraph, activation=jax.nn.relu,
                       band: Optional[int] = None,
                       remat: bool = False,
                       lattice=None, masks=None) -> jnp.ndarray:
    """Layer stack (reference network_func_15op_shift_inv_za)."""
    import functools
    if masks is not None and lattice is not None:
        return _shiftinv15_network_blocks(params, edges, graph, activation,
                                          remat, lattice, masks)
    h = edges
    num_layers = len(params)
    for i, layer_params in enumerate(params):
        is_last = i == num_layers - 1
        fn = functools.partial(shift_inv_15op_layer, is_last=is_last,
                               band=band, lattice=lattice, masks=masks)
        if remat:
            fn = jax.checkpoint(fn)
        h = fn(h, graph, layer_params)
        if not is_last:
            h = activation(h)
    return h


def shiftinv15_model(params, pos: jnp.ndarray, za_disp: jnp.ndarray,
                     idx: jnp.ndarray, box: float,
                     activation=jax.nn.relu,
                     band: Optional[int] = None,
                     remat: bool = False,
                     lattice=None, masks=None) -> jnp.ndarray:
    """Full model: symmetrized graph + features + network.

    pos (b, N, 3), za_disp (b, N, 3), idx (b, N, K) with self at slot 0.
    lattice=(cells, window) routes every neighbor op through the 3D-block
    kernels and the offset-code reverse-edge search (the family fast path).
    """
    graph = build_block_sym_graph(idx, band, lattice, masks)
    feats = block_edge_features_za(pos, graph, za_disp, box, band, lattice,
                                   masks)
    return shiftinv15_network(params, feats.astype(pos.dtype), graph,
                              activation, band, remat, lattice, masks)


# ---------------------------------------------------------------------------
# Flat edge-list formulation — the validated reference oracle (kept for
# tests; operationally superseded by the block form above).
# ---------------------------------------------------------------------------

class SymGraph(NamedTuple):
    """Static-capacity symmetrized graph, flat edge list, per sample."""
    row: jnp.ndarray     # (E,) int32 row (particle) id of each edge slot
    col: jnp.ndarray     # (E,) int32 col (neighbor) id
    tra: jnp.ndarray     # (E,) int32 slot index of the transposed edge
    valid: jnp.ndarray   # (E,) float mask: 1 for live slots
    dia: jnp.ndarray     # (N,) int32 slot index of each particle's self-edge


def build_sym_graph(idx: jnp.ndarray) -> SymGraph:
    """idx (N, K) neighbor ids with idx[:, 0] == self -> SymGraph, E = 2NK."""
    n, k = idx.shape
    nk = n * k
    particles = jnp.arange(n, dtype=jnp.int32)
    row_a = jnp.repeat(particles, k)
    col_a = idx.reshape(-1).astype(jnp.int32)

    nbr_nbrs = idx[idx]                                   # (N, K, K)
    hit = nbr_nbrs == particles[:, None, None]
    rev_exists = jnp.any(hit, axis=2).reshape(-1)
    rev_pos = jnp.argmax(hit, axis=2).reshape(-1).astype(jnp.int32)

    slots_a = jnp.arange(nk, dtype=jnp.int32)
    tra_a = jnp.where(rev_exists, col_a * k + rev_pos, nk + slots_a)
    tra_b = slots_a
    valid = jnp.concatenate([jnp.ones(nk, jnp.float32),
                             (~rev_exists).astype(jnp.float32)])
    return SymGraph(
        row=jnp.concatenate([row_a, col_a]),
        col=jnp.concatenate([col_a, row_a]),
        tra=jnp.concatenate([tra_a, tra_b]),
        valid=valid,
        dia=particles * k)


def sym_edge_features_za(pos: jnp.ndarray, idx: jnp.ndarray, za_disp: jnp.ndarray,
                         box: float) -> jnp.ndarray:
    """(N, 3) pos -> (E, 3) flat edge features (oracle twin of
    block_edge_features_za)."""
    nbr = pos[idx]
    edges = min_image_diff(nbr, pos[:, None, :], box)
    edges_a = edges.at[:, 0, :].set(za_disp)
    edges_b = (-edges).at[:, 0, :].set(jnp.zeros_like(za_disp))
    return jnp.concatenate([edges_a.reshape(-1, 3), edges_b.reshape(-1, 3)])


def _seg_mean(h: jnp.ndarray, ids: jnp.ndarray, w: jnp.ndarray,
              num: int) -> jnp.ndarray:
    sums = jnp.zeros((num, h.shape[-1]), h.dtype).at[ids].add(h * w[:, None])
    cnt = jnp.zeros((num,), h.dtype).at[ids].add(w)
    return sums / jnp.maximum(cnt, 1.0)[:, None]


def _shift_inv_15op_flat_single(h: jnp.ndarray, g: SymGraph, w: jnp.ndarray,
                                b: jnp.ndarray, n: int,
                                is_last: bool) -> jnp.ndarray:
    dt = h.dtype
    e = h.shape[0]
    q = w.shape[-1]

    def mm(x, wi):
        return jnp.dot(x, wi, preferred_element_type=dt)

    def at_dia(vals):
        return jnp.zeros((e, q), dt).at[g.dia].set(vals)

    h_d = h[g.dia]
    h_r = _seg_mean(h, g.col, g.valid, n)
    h_c = _seg_mean(h, g.row, g.valid, n)
    h_a = jnp.sum(h * g.valid[:, None], 0) / jnp.maximum(jnp.sum(g.valid), 1.0)
    h_p = jnp.mean(h_d, axis=0)

    out = mm(h, w[0])
    out += mm(h[g.tra], w[1])
    out += at_dia(mm(h_d, w[2]))
    out += mm(h_r, w[3])[g.col]
    out += mm(h_r, w[4])[g.row]
    out += at_dia(mm(h_r, w[5]))
    out += mm(h_c, w[6])[g.row]
    out += mm(h_c, w[7])[g.col]
    out += at_dia(mm(h_c, w[8]))
    out += mm(h_a[None], w[9])[0][None, :]
    out += at_dia(jnp.broadcast_to(mm(h_a[None], w[10])[0], (n, q)))
    out += mm(h_p[None], w[11])[0][None, :]
    out += at_dia(jnp.broadcast_to(mm(h_p[None], w[12])[0], (n, q)))
    out += mm(h_d, w[13])[g.col]
    out += mm(h_d, w[14])[g.row]
    out += at_dia(jnp.broadcast_to(b[0], (n, q)))
    out += b[1]
    out = out * g.valid[:, None]
    if is_last:
        return _seg_mean(out, g.row, g.valid, n)
    return out


def shift_inv_15op_layer_flat(h: jnp.ndarray, graph: SymGraph,
                              layer_params: Dict[str, jnp.ndarray],
                              is_last: bool = False) -> jnp.ndarray:
    """Batched flat-layout layer (oracle). h (b, E, C), graph leaves (b, ...)."""
    n = graph.dia.shape[-1]
    fn = lambda hh, gg: _shift_inv_15op_flat_single(
        hh, gg, layer_params["W"], layer_params["B"], n, is_last)
    return jax.vmap(fn)(h, graph)
