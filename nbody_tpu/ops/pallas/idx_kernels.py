"""Pallas index-dot kernels: the shared-mask einsum with NO mask array.

The masked neighbor path's dominant HBM traffic is the one-hot mask array
(B, NB, ET, P): 4.23 GB/pass in bf16 at 32^3 b4 K14 core (4,8,8), still
~0.5 GB/pass at int4 (ops/pallas/mask_kernels.py), PLUS the once-per-step
materialization of the array itself.  But the one-hot is a pure P-fold
blowup of the per-edge patch positions (B, NB, ET) int32 — ~7 MB of actual
information at 32^3 b4 K14.

These kernels load ONLY the positions and synthesize the one-hot tile in
VMEM per block (a broadcasted-iota compare — VPU work that never touches
HBM), then run the same (ET, P) x (P, C) MXU dot as the swept einsum.
Mask HBM traffic per pass: ET*4 bytes per block instead of ET*P/2..2 —
a ~100-800x cut that removes the mask-read roofline entirely; what
remains is the irreducible activation traffic (patches in, edges out).

The one-hot is synthesized TRANSPOSED, (P, ET) with ET on lanes, so the
positions vector never needs a lane->sublane relayout:
  ohT[p, e] = (p == pos[e]);  gather = dot_general(ohT, patch, contract
  dim 0 x dim 0) -> (ET, C);  scatter = ohT @ edges -> (P, C).

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

from nbody_tpu.ops.pallas.mask_kernels import (_float0_zeros, _pick_group,
                                               _vmem_params)


import os

# gather-kernel one-hot synthesis orientation ("t" transposed / "nt" not):
# "t" synthesizes (P, ET) — positions stay lane-oriented, but the MXU dot
# contracts lhs dim 0, which Mosaic may realize as a per-block transpose of
# the ~MB one-hot tile; "nt" synthesizes (ET, P) directly — the positions
# vector pays a lane->sublane relayout (ET*4 bytes, trivial) and the dot is
# the standard (ET,P)x(P,C) orientation.  Measured on chip round 4:
# orientation is noise (233.8 vs 232.5 ms) — the serialized VPU synthesis,
# not the relayout, is the cost.  The env var / module global only sets the
# DEFAULT; the orientation is threaded through the call chain as an
# explicit, trace-visible parameter (ADVICE r4: an env read consulted at
# trace time silently ignores post-trace flips).
IDX_SYNTH = os.environ.get("NBODY_IDX_SYNTH", "t")


def _onehot_t(pos: jnp.ndarray, p_size: int) -> jnp.ndarray:
    """(ET,) int32 positions -> transposed one-hot (P, ET) bf16 in VMEM."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (p_size, pos.shape[0]), 0)
    return (lanes == pos[None, :]).astype(jnp.bfloat16)


def _onehot_nt(pos: jnp.ndarray, p_size: int) -> jnp.ndarray:
    """(ET,) int32 positions -> one-hot (ET, P) bf16 in VMEM."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], p_size), 1)
    return (lanes == pos[:, None]).astype(jnp.bfloat16)


def _idx_gather_kernel(p_ref, v_ref, o_ref, *, g: int, p_size: int,
                       synth: str):
    # p (1, 1, g, ET) int32, v (1, g, P, C) bf16 -> o (1, g, ET, C) f32
    for i in range(g):
        if synth == "nt":
            oh = _onehot_nt(p_ref[0, 0, i], p_size)
            o_ref[0, i] = jnp.dot(oh, v_ref[0, i],
                                  preferred_element_type=jnp.float32)
        else:
            oht = _onehot_t(p_ref[0, 0, i], p_size)
            o_ref[0, i] = jax.lax.dot_general(
                oht, v_ref[0, i], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _idx_scatter_kernel(p_ref, v_ref, o_ref, *, g: int, p_size: int):
    # p (1, 1, g, ET) int32, v (1, g, ET, C) bf16 -> o (1, g, P, C) f32
    for i in range(g):
        oht = _onehot_t(p_ref[0, 0, i], p_size)
        o_ref[0, i] = jnp.dot(oht, v_ref[0, i],
                              preferred_element_type=jnp.float32)


def _idx_dot_call(pos: jnp.ndarray, vals: jnp.ndarray, transpose: bool,
                  p_size: int, group=None,
                  interpret: bool | None = None,
                  synth: str = "t") -> jnp.ndarray:
    """pos (B, NB, ET) int32; vals (B, NB, P, C) [gather] or (B, NB, ET, C)
    [scatter=transpose]; returns f32 (B, NB, ET|P, C)."""
    b, nb, et = pos.shape
    c = vals.shape[-1]
    out_rows = p_size if transpose else et
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = _pick_group(nb, group)
    kernel = (_idx_scatter_kernel if transpose
              else functools.partial(_idx_gather_kernel, synth=synth))
    # Mosaic needs the last two block dims divisible by (8, 128) or equal
    # to the array dims; a (1, g, ET) block fails on the sublane dim for
    # g < 8, so stage the positions as (B, NB//g, g, ET) — the (1,1,g,ET)
    # block's trailing dims then EQUAL the array dims.
    pos4 = pos.reshape(b, nb // g, g, et)
    return pl.pallas_call(
        functools.partial(kernel, g=g, p_size=p_size),
        grid=(b, nb // g),
        in_specs=[
            pl.BlockSpec((1, 1, g, et), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, vals.shape[2], c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, out_rows, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, out_rows, c), jnp.float32),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(pos4, vals)


# The two directions are each other's transpose against the SAME positions
# array, so the VJPs are a mutually-referencing pair — forward AND backward
# of every neighbor op synthesize the one-hot in VMEM; the positions are
# int32 primals with float0 cotangents (zero-size).  p_size is static (it
# is not recoverable from the scatter operands), so the custom_vjp pair is
# built per p_size and cached.

@functools.lru_cache(maxsize=None)
def _idx_pair(p_size: int, synth: str = "t"):
    @jax.custom_vjp
    def gather(pos, patches):
        return _idx_dot_call(pos, patches.astype(jnp.bfloat16),
                             transpose=False, p_size=p_size, synth=synth)

    @jax.custom_vjp
    def scatter(pos, edges):
        return _idx_dot_call(pos, edges.astype(jnp.bfloat16),
                             transpose=True, p_size=p_size)

    def g_fwd(pos, patches):
        return gather(pos, patches), (pos, jnp.zeros((0,), patches.dtype))

    def g_bwd(res, ct):
        pos, pdt = res
        d = _idx_dot_call(pos, ct.astype(jnp.bfloat16), transpose=True,
                          p_size=p_size)
        return _float0_zeros(pos), d.astype(pdt.dtype)

    def s_fwd(pos, edges):
        return scatter(pos, edges), (pos, jnp.zeros((0,), edges.dtype))

    def s_bwd(res, ct):
        pos, edt = res
        d = _idx_dot_call(pos, ct.astype(jnp.bfloat16), transpose=False,
                          p_size=p_size, synth=synth)
        return _float0_zeros(pos), d.astype(edt.dtype)

    gather.defvjp(g_fwd, g_bwd)
    scatter.defvjp(s_fwd, s_bwd)
    return gather, scatter


def idx_dot_gather(pos: jnp.ndarray, patches: jnp.ndarray,
                   synth: str | None = None) -> jnp.ndarray:
    """(B, NB, ET) int32 patch positions x (B, NB, P, C) -> (B, NB, ET, C)
    f32 — the masked gather with the one-hot synthesized in VMEM.

    synth: one-hot synthesis orientation ("t"/"nt"), trace-visible; None
    falls back to the module default (IDX_SYNTH / NBODY_IDX_SYNTH)."""
    return _idx_pair(patches.shape[2], synth or IDX_SYNTH)[0](pos, patches)


def idx_dot_scatter(pos: jnp.ndarray, edges: jnp.ndarray,
                    p_size: int, synth: str | None = None) -> jnp.ndarray:
    """(B, NB, ET) int32 x (B, NB, ET, C) -> (B, NB, P, C) f32 per-block
    accumulations (caller overlap-adds via blocked.patches_fold).  synth
    picks the BACKWARD (gather) kernel's synthesis orientation."""
    return _idx_pair(p_size, synth or IDX_SYNTH)[1](pos, edges)
