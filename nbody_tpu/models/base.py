"""Parameter store: seeded pytree params replacing tf.get_variable.

The reference keeps per-layer weights W{i}_{j} / biases B{i}_{j} in a TF1
variable scope (reference utils.py:292-386).  Here a model's parameters are a
plain pytree: a list of per-layer dicts {"W": (n_w, k_in, k_out), "B": ...},
initialized from a jax.random key — functional, shardable, checkpointable.

Initialization matches the reference's distributions:
  * weights ~ glorot normal (reference utils.py:178, 357)
  * biases  = 1e-8 (reference utils.py:334)
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nbody_tpu import config as C


def glorot_normal(key: jax.Array, shape: Tuple[int, ...],
                  dtype=jnp.float32) -> jnp.ndarray:
    """Glorot/Xavier normal over the trailing (fan_in, fan_out) dims."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = jnp.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def init_layer_params(key: jax.Array, k_in: int, k_out: int,
                      num_weights: int = 1, num_biases: int = 1,
                      dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """One layer: W stacked (num_weights, k_in, k_out), B (num_biases, k_out)."""
    w_key, _ = jax.random.split(key)
    w = glorot_normal(w_key, (num_weights, k_in, k_out), dtype)
    b = jnp.full((num_biases, k_out), C.BIAS_INIT, dtype)
    return {"W": w, "B": b}


def init_network_params(key: jax.Array, channels: Sequence[int],
                        num_weights: int = 1, num_biases: int = 1,
                        dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    """Per-layer params for a channel stack (reference utils.py:370-379)."""
    kdims = list(zip(channels[:-1], channels[1:]))
    keys = jax.random.split(key, len(kdims))
    return [init_layer_params(k, ki, ko, num_weights, num_biases, dtype)
            for k, (ki, ko) in zip(keys, kdims)]


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
