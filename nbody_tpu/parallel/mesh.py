"""Device mesh construction.

The reference is single-process single-device (SURVEY.md §2.3); all
parallelism here is designed fresh for the TPU ICI mesh:

  axis "data"     — data parallelism over the batch of cubes (and the
                    ensemble axis for multi-seed sweeps);
  axis "particle" — spatial parallelism over the particle axis N
                    (the reference's "sequence" axis, 32^3..64^3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PARTICLE_AXIS = "particle"


def make_mesh(data: int = 1, particle: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, particle) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * particle
    if need > len(devices):
        raise ValueError(f"mesh {data}x{particle} needs {need} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(data, particle)
    return Mesh(dev_array, (DATA_AXIS, PARTICLE_AXIS))


def default_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """All devices on the data axis — the safe default for batch training."""
    devices = list(devices if devices is not None else jax.devices())
    return make_mesh(data=len(devices), particle=1, devices=devices)
