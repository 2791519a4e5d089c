"""Device mesh construction.

One data axis ("d") covers intra-slice parallelism; multi-slice (DCN)
meshes add an outer axis later. The analog of velox's per-task driver
count (velox/exec/Task.h:207 maxDrivers) is the mesh size: each device is
one "driver" executing the same SPMD program on its shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(n: Optional[int] = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n is not None:
        assert n <= len(devs), f"need {n} devices, have {len(devs)}"
        devs = devs[:n]
    return Mesh(np.asarray(devs), (axis,))
