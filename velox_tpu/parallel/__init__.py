"""Distributed execution over jax.sharding.Mesh.

The TPU replacement for velox's exchange stack (PartitionedOutput /
OutputBufferManager / ExchangeSource, SURVEY.md §2.7 & D.5): inside a pod
slice there is no paged ack protocol — a hash shuffle is one
``jax.lax.all_to_all`` under ``shard_map``, fully SPMD, overlappable with
compute by XLA. Host-side fragment scheduling (the DCN path) layers on top.
"""

from velox_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
from velox_tpu.parallel.shuffle import hash_repartition  # noqa: F401
from velox_tpu.parallel.aggregate import (  # noqa: F401
    make_distributed_aggregate,
)
