"""Fused layer-boundary kernel: one mask read for gather AND next scatter.

PERF.md round-5 ledger item 1.  The masked train step is AT the HBM
mask-read roofline (measured round 4: 171 ms ~= 34 passes x 5.0 ms, each
pass streaming the (B, NB, ET, P) one-hot).  Within a layer the two mask
reads cannot fuse (op 2 runs scatter -> cross-block fold -> degree divide
-> gather, a global dependency), but at every LAYER BOUNDARY the pair

    layer i's op-2 gather   :  e   = M @ patch_in + A
    per-edge chain          :  e'  = act(e);  h1 = e' @ W1;  hw = e' @ W2
    layer i+1's op-2 scatter:  s   = M^T @ hw

is strictly per-edge between the two dots — A (= h1+h3+h4+bias of layer i
at edge level) is a precomputed input, the fold consuming `s` runs after.
One Pallas kernel per block therefore streams the mask tile ONCE and
issues both MXU dots plus the small weight dots on the VMEM-resident
edge tile, halving the dominant traffic at every boundary
(~30 passes -> ~18, roofline 171 -> ~110 ms predicted).

This module is the kernel + its exactness contract only; it is NOT wired
into the model path yet.  Round 4 measured that Mosaic serializes in-VMEM
VPU work against the dot (the idx/int8 stall, PERF.md) — whether it can
pipeline a mask stream against MXU-only extra work is exactly the round-5
measurement this kernel exists for.

Replaces (jointly with ops/blocked.py) the hot pool-over-neighbors ops of
the reference's shift-inv layers (reference graph.py:367-391).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.pallas.mask_kernels import _pick_group, _vmem_params


def _fused_kernel(m_ref, p_ref, a_ref, w1_ref, w2_ref,
                  act_ref, h1_ref, s_ref, *, g: int, act):
    # m (1, g, ET, P), p (1, g, P, C), a (1, g, ET, C),
    # w1/w2 (C, q)  ->  act (1, g, ET, C), h1 (1, g, ET, q) f32,
    #                   s (1, g, P, q) f32
    for i in range(g):
        m = m_ref[0, i]                                    # ONE mask read
        # patches cast to the mask dtype INSIDE VMEM — the same operand
        # dtype pairing as boundary_reference's gather einsum, so the
        # exactness contract holds for bf16 masks x f32 patches too
        # (ADVICE r4)
        e = jnp.dot(m, p_ref[0, i].astype(m.dtype),
                    preferred_element_type=jnp.float32)
        e = act(e + a_ref[0, i].astype(jnp.float32))
        act_ref[0, i] = e.astype(act_ref.dtype)
        eb = e.astype(w1_ref.dtype)
        h1_ref[0, i] = jnp.dot(eb, w1_ref[...],
                               preferred_element_type=jnp.float32)
        hw = jnp.dot(eb, w2_ref[...],
                     preferred_element_type=jnp.float32).astype(m.dtype)
        s_ref[0, i] = jnp.dot(m.T, hw,
                              preferred_element_type=jnp.float32)


def fused_boundary_dot(masks: jnp.ndarray, patches: jnp.ndarray,
                       a_edge: jnp.ndarray, w1: jnp.ndarray,
                       w2: jnp.ndarray, act=jax.nn.relu, group=None,
                       interpret: bool | None = None):
    """One-mask-read fused boundary op.

    masks   (B, NB, ET, P) bf16/f32 one-hot (ops.blocked.block_masks)
    patches (B, NB, P, C)  pooled-rows patches for layer i's gather
    a_edge  (B, NB, ET, C) precomputed per-edge h1+h3+h4+bias of layer i
    w1, w2  (C, q)         layer i+1's op-1 / op-2 weights

    Returns (act_out, h1_out, scat_out):
      act_out  (B, NB, ET, C) = act(M @ patches + a_edge)   [h_{i+1} edges]
      h1_out   (B, NB, ET, q) f32 = act_out @ w1
      scat_out (B, NB, P, q)  f32 = M^T @ (act_out @ w2)    [pre-fold]
    """
    b, nb, et, p = masks.shape
    c = patches.shape[-1]
    q = w1.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    g = _pick_group(nb, group)
    blk = lambda *shape: pl.BlockSpec(
        (1, g) + shape, lambda bi, i: (bi, i, 0, 0),
        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((c, q), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_kernel, g=g, act=act),
        grid=(b, nb // g),
        in_specs=[blk(et, p), blk(p, c), blk(et, c), wspec, wspec],
        out_specs=[blk(et, c), blk(et, q), blk(p, q)],
        out_shape=[
            jax.ShapeDtypeStruct((b, nb, et, c), patches.dtype),
            jax.ShapeDtypeStruct((b, nb, et, q), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, p, q), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(masks, patches, a_edge, w1, w2)


def boundary_reference(masks, patches, a_edge, w1, w2, act=jax.nn.relu):
    """The unfused composition the kernel must match: the two shared-mask
    einsums (ops/blocked._mask_contract_*) around the per-edge chain —
    THREE mask reads' worth of traffic (gather, plus the scatter pair's
    read) versus the kernel's one."""
    e = jnp.einsum("bnep,bnpc->bnec", masks, patches.astype(masks.dtype),
                   preferred_element_type=jnp.float32)
    e = act(e + a_edge.astype(jnp.float32))
    eb = e.astype(w1.dtype)
    h1 = jnp.einsum("bnec,cq->bneq", eb, w1,
                    preferred_element_type=jnp.float32)
    hw = jnp.einsum("bnec,cq->bneq", eb, w2,
                    preferred_element_type=jnp.float32).astype(masks.dtype)
    s = jnp.einsum("bnep,bneq->bnpq", masks, hw,
                   preferred_element_type=jnp.float32)
    return e.astype(patches.dtype), h1, s
