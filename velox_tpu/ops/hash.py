"""64-bit mixing hashes for partitioning and shuffle.

Analog of velox's VectorHasher + HashPartitionFunction
(velox/exec/VectorHasher.h, exec/HashPartitionFunction.h:30). The engine
never hashes for *lookup* (joins/group-by use sorted indices — see
join.py/groupby.py); hashing exists purely to scatter rows across
partitions/devices, so the only requirement is good avalanche — splitmix64's
finalizer provides it in 3 multiply-xor rounds of pure VPU work.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB
_GOLDEN = 0x9E3779B97F4A7C15


def _u64(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int64)
    if jnp.issubdtype(x.dtype, jnp.floating):
        # normalize -0.0/+0.0 and NaNs so equal SQL values hash equal
        x = jnp.where(x == 0, jnp.zeros((), x.dtype), x)
        x = jnp.where(jnp.isnan(x), jnp.full((), jnp.nan, x.dtype), x)
        width = jnp.int32 if x.dtype == jnp.float32 else jnp.int64
        x = jax.lax.bitcast_convert_type(x, width)
    return x.astype(jnp.uint64)


def hash_i64(x: jax.Array) -> jax.Array:
    """splitmix64 finalizer; uint64 out."""
    z = _u64(x)
    z = (z ^ (z >> 30)) * jnp.uint64(_M1)
    z = (z ^ (z >> 27)) * jnp.uint64(_M2)
    return z ^ (z >> 31)


def combine_hash(h: jax.Array, h2: jax.Array) -> jax.Array:
    """Order-dependent combine (boost::hash_combine shape)."""
    return h ^ (h2 + jnp.uint64(_GOLDEN) + (h << 6) + (h >> 2))


def hash_columns(
    cols: Sequence[Tuple[jax.Array, Optional[jax.Array]]]
) -> jax.Array:
    """Row hash over several (values, valid) columns; nulls hash as 0."""
    out = None
    for values, valid in cols:
        if valid is not None:
            values = jnp.where(valid, values, jnp.zeros((), values.dtype))
        h = hash_i64(values)
        if valid is not None:
            h = jnp.where(valid, h, jnp.uint64(0))
        out = h if out is None else combine_hash(out, h)
    assert out is not None
    return out


def partition_ids(row_hash: jax.Array, num_partitions: int) -> jax.Array:
    """hash -> partition in [0, num_partitions) (int32)."""
    return (row_hash % jnp.uint64(num_partitions)).astype(jnp.int32)


def hive_hash_columns(
    cols: Sequence[Tuple[jax.Array, Optional[jax.Array]]]
) -> jax.Array:
    """Hive-compatible bucket hash (velox/connectors/hive/HivePartition
    Function.h): integer columns hash to their own value (Java
    hashCode), combined with the 31x + h rule; nulls contribute 0.
    Output rows land in the same buckets Hive-written tables use."""
    out = None
    for values, valid in cols:
        v = values.astype(jnp.int32) if values.dtype == jnp.bool_ \
            else values
        if jnp.issubdtype(v.dtype, jnp.integer):
            if jnp.dtype(v.dtype).itemsize > 4:
                v64 = v.astype(jnp.int64)
                h = ((v64 >> 32) ^ v64).astype(jnp.int32)
            else:
                h = v.astype(jnp.int32)
        else:
            # doubles: Java Double.hashCode over raw bits
            bits = jax.lax.bitcast_convert_type(
                v.astype(jnp.float32), jnp.int32)
            h = bits
        if valid is not None:
            h = jnp.where(valid, h, jnp.int32(0))
        out = h if out is None else out * jnp.int32(31) + h
    assert out is not None
    return out


def hive_bucket_ids(cols, num_buckets: int) -> jax.Array:
    """(hash & Integer.MAX_VALUE) % buckets — Hive's bucket function."""
    h = hive_hash_columns(cols)
    return (h & jnp.int32(0x7FFFFFFF)) % jnp.int32(num_buckets)
