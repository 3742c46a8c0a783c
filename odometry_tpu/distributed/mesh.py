"""Device-mesh helpers for multi-chip runs."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def sequence_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over devices for multi-sequence data parallelism."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("seq",))


def grid_mesh(seq: int, model: int) -> Mesh:
    """2-D mesh: sequences x intra-frame model parallelism (BA shards)."""
    devs = np.array(jax.devices()[: seq * model]).reshape(seq, model)
    return Mesh(devs, ("seq", "model"))
