"""Attention + residual set network.

Reference twins: set_transform / attn_layer / res_layer / net_fwd
(experiment.py:83-157).

Architecture: a stack of channel-gate attention layers with batch-norm and
leaky-relu, plus tanh residual projections from the 6-channel input to each
hidden width; the residual stream R is merged only into the final layer's
input (H + R), exactly as the reference executes (SURVEY.md §3.3 note).

The "attention" is a (k, k) channel gate: softmax(xf^T . xg) applied to xh —
channel mixing, not token attention.  With `batch_coupled_gate=True`
(reference semantics) the gram matrix is computed over all b*N rows jointly
(reference reshapes to (B*N, k), experiment.py:122-128); with False the gate
is computed per sample — the cleaner variant for data-parallel sharding,
since the coupled gate needs a cross-batch psum.

Batch norm: the reference called tf.layers.batch_normalization with the
default training=False and never updated moving statistics, so it reduced to
a learnable affine (gamma, beta) around frozen (0, 1) stats.  Here: proper
batch statistics over (batch, particles) during training (a deliberate,
documented fix), and the reference's frozen (0, 1) stats in eval mode so
predictions stay deterministic and batch-independent.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from nbody_tpu import config as C
from nbody_tpu.models.base import glorot_normal

ATTN_BIAS_INIT = 1e-6   # reference experiment.py:54


def init_attn_params(key: jax.Array, channels: Sequence[int], dtype=jnp.float32):
    """Per layer: Wf, Wg, Wh (k_in, k_out), R (6, k_out), B (k_out),
    gamma/beta (k_out) for batch norm (hidden layers only)."""
    kdims = list(zip(channels[:-1], channels[1:]))
    in_ch = channels[0]
    params = []
    keys = jax.random.split(key, len(kdims) * 4).reshape(len(kdims), 4, -1)
    for i, (ki, ko) in enumerate(kdims):
        kf, kg, kh, kr = keys[i]
        params.append({
            "Wf": glorot_normal(kf, (ki, ko), dtype),
            "Wg": glorot_normal(kg, (ki, ko), dtype),
            "Wh": glorot_normal(kh, (ki, ko), dtype),
            "R": glorot_normal(kr, (in_ch, ko), dtype),
            "B": jnp.full((ko,), ATTN_BIAS_INIT, dtype),
            "gamma": jnp.ones((ko,), dtype),
            "beta": jnp.zeros((ko,), dtype),
        })
    return params


def set_transform(x_in: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean-centered matmul (reference experiment.py:83-89)."""
    x = x_in - jnp.mean(x_in, axis=1, keepdims=True)
    out = jnp.einsum("bnk,kq->bnq", x, w, preferred_element_type=x.dtype)
    return out if b is None else out + b


def attn_layer(x_in: jnp.ndarray, p: Dict[str, jnp.ndarray],
               batch_coupled_gate: bool = True) -> jnp.ndarray:
    """Channel-gate attention (reference experiment.py:108-132)."""
    xf = set_transform(x_in, p["Wf"])
    xg = set_transform(x_in, p["Wg"])
    xh = set_transform(x_in, p["Wh"])
    if batch_coupled_gate:
        k = xf.shape[-1]
        xfr = xf.reshape(-1, k)
        xgr = xg.reshape(-1, k)
        gate = jax.nn.softmax(
            jnp.einsum("ck,cq->kq", xfr, xgr, preferred_element_type=xf.dtype),
            axis=-1)
        out = jnp.einsum("bnk,kq->bnq", xh, gate, preferred_element_type=xf.dtype)
    else:
        gate = jax.nn.softmax(
            jnp.einsum("bnk,bnq->bkq", xf, xg, preferred_element_type=xf.dtype),
            axis=-1)
        out = jnp.einsum("bnk,bkq->bnq", xh, gate, preferred_element_type=xf.dtype)
    return out + p["B"]


def batch_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               eps: float = 1e-3, train_mode: bool = True) -> jnp.ndarray:
    """Batch statistics over (b, N); eps matches TF's default 1e-3.

    train_mode=False freezes the statistics at (0, 1) — exactly the
    reference's eval behavior (tf.layers.batch_normalization with
    training=False and never-updated moving averages), which keeps eval
    predictions deterministic and independent of batch composition."""
    if train_mode:
        mu = jnp.mean(x, axis=(0, 1), keepdims=True)
        var = jnp.var(x, axis=(0, 1), keepdims=True)
    else:
        mu = jnp.zeros((), x.dtype)
        var = jnp.ones((), x.dtype)
    return gamma * (x - mu) * jax.lax.rsqrt(var + eps) + beta


def attn_network(params: List[Dict[str, jnp.ndarray]], x_in: jnp.ndarray,
                 batch_coupled_gate: bool = True,
                 train_mode: bool = True) -> jnp.ndarray:
    """[attn -> batch_norm -> leaky_relu] stack with tanh input-residual
    merged into the final layer (reference net_fwd, experiment.py:139-157).

    train_mode selects batch-norm statistics (batch stats vs the frozen
    (0, 1) the reference used at eval)."""
    num_layers = len(params)
    h = batch_norm(jax.nn.leaky_relu(
        attn_layer(x_in, params[0], batch_coupled_gate)),
        params[0]["gamma"], params[0]["beta"], train_mode=train_mode)
    r = jnp.tanh(set_transform(x_in, params[0]["R"]))
    for i in range(1, num_layers - 1):
        h = batch_norm(jax.nn.leaky_relu(
            attn_layer(h, params[i], batch_coupled_gate)),
            params[i]["gamma"], params[i]["beta"], train_mode=train_mode)
        r = jnp.tanh(set_transform(x_in, params[i]["R"]))
    return attn_layer(h + r, params[num_layers - 1], batch_coupled_gate)
