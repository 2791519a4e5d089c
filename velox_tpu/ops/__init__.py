"""Device compute primitives (the kernel layer).

The analog of velox/exec's kernel internals (HashTable probe loops,
PrefixSort, VectorHasher) re-designed as pure, jittable JAX functions over
fixed-capacity arrays:

* ``sortkey``   — order-preserving int64 key encoding (PrefixSortEncoder
                  analog, velox/exec/prefixsort/PrefixSortEncoder.h:28).
* ``sort``      — multi-key lexicographic sort / top-N over batches.
* ``groupby``   — group-id assignment: sort-based generic mode + direct
                  value-id "kArray" mode (velox/exec/HashTable.h:146 modes).
* ``join``      — sorted-build equi-join index + vectorized probe
                  (replaces velox/exec/HashTable.h joinProbe with
                  searchsorted over a sorted key column).
* ``hash``      — 64-bit mixing hashes for partitioning (VectorHasher /
                  HashPartitionFunction analog).
"""

from velox_tpu.ops.sortkey import encode_sort_key  # noqa: F401
from velox_tpu.ops.sort import sort_indices, top_n_indices  # noqa: F401
from velox_tpu.ops.groupby import (  # noqa: F401
    group_ids_sorted, group_ids_array,
)
from velox_tpu.ops.join import (  # noqa: F401
    build_join_index, probe_join_index, expand_matches,
)
from velox_tpu.ops.hash import hash_i64, combine_hash, partition_ids  # noqa: F401
