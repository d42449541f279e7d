"""Device mesh helpers for multi-chip execution (ICI within a slice).

The reference is single-process rayon (SURVEY.md §2.3); distribution here is
new design: `jax.sharding.Mesh` + shard_map with XLA collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "dev"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))
