"""Permutation-equivariant set network (DeepSets-style).

Reference twins: set_layer (nn.py:10-28), network_func_set (nn.py:31-67),
model_func_set (nn.py:70-97).

Layer math: h_out = (h - mean_N(h)) @ W + B — mean-centering over the
particle axis makes the layer permutation-equivariant and translation-
invariant in feature space.  On TPU the (b*N, k) x (k, q) contraction maps
straight onto the MXU; XLA fuses the mean-subtract and bias add.

The particle-axis mean is the only cross-particle coupling, so under
particle-axis sharding it is the single collective (a mean psum); plain
jnp.mean lets GSPMD insert it automatically.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from nbody_tpu.models.base import init_network_params


def init_set_params(key: jax.Array, channels: Sequence[int], dtype=jnp.float32):
    return init_network_params(key, channels, num_weights=1, num_biases=1,
                               dtype=dtype)


def set_layer(h_in: jnp.ndarray, layer_params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(b, N, k) -> (b, N, q): W.(X - X_mu) + B (reference nn.py:10-28)."""
    w = layer_params["W"][0]
    b = layer_params["B"][0]
    h = h_in - jnp.mean(h_in, axis=1, keepdims=True)
    return jnp.einsum("bnk,kq->bnq", h, w,
                      preferred_element_type=h.dtype) + b


def set_network(params: List[Dict[str, jnp.ndarray]], x_in: jnp.ndarray,
                activation=jax.nn.relu) -> jnp.ndarray:
    """Layer stack: activation on all layers except the last
    (reference network_func_set, nn.py:31-67)."""
    h = x_in
    for i, layer_params in enumerate(params):
        h = set_layer(h, layer_params)
        if i < len(params) - 1:
            h = activation(h)
    return h
