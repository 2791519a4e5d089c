"""Order-preserving sort-key encoding.

Behavioral analog of velox's PrefixSortEncoder
(velox/exec/prefixsort/PrefixSortEncoder.h:28-220): every orderable scalar
lane maps to an int64 whose *signed integer order* equals the SQL order of
the values (ints pass through, floats get the sign-flip trick, dictionary
codes of sorted dictionaries are already ranks). Descending order is bitwise
NOT (monotone inversion, no overflow). Nulls are handled as a *separate*
preceding key operand (0/1) rather than a sentinel value, so no real value
can ever collide with the null rank — this is where the TPU design is
simpler than the reference's null-byte prefix.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

_LOW63 = 0x7FFFFFFFFFFFFFFF
_LOW31 = 0x7FFFFFFF


def _float_to_sortable_int(values: jax.Array) -> jax.Array:
    """Map float lanes to int64 with matching total order.

    NaNs are canonicalized to +NaN first so they sort as the largest value
    (Presto ORDER BY semantics: NaN is greater than any other double,
    velox/type/FloatingPointUtil.h behavioral analog).
    """
    if values.dtype == jnp.float32:
        canon = jnp.where(jnp.isnan(values), jnp.float32(jnp.nan), values)
        i = jax.lax.bitcast_convert_type(canon, jnp.int32)
        k = i ^ jnp.where(i < 0, jnp.int32(_LOW31), jnp.int32(0))
        return k.astype(jnp.int64)
    canon = jnp.where(jnp.isnan(values), jnp.float64(jnp.nan), values)
    i = jax.lax.bitcast_convert_type(canon, jnp.int64)
    return i ^ jnp.where(i < 0, jnp.int64(_LOW63), jnp.int64(0))


def encode_sort_key(
    values: jax.Array,
    valid: Optional[jax.Array],
    *,
    descending: bool = False,
    nulls_first: bool = False,
) -> List[jax.Array]:
    """Encode one column into 1-2 integer key operands (null rank, value
    key), compared lexicographically by ``jax.lax.sort``.

    32-bit-or-narrower lanes stay int32 (TPUs emulate 64-bit integers —
    sorting in the native width is the narrow-lane rule applied to keys);
    only genuinely 64-bit lanes produce int64 operands.
    """
    dt = values.dtype

    if dt == jnp.float32:
        canon = jnp.where(jnp.isnan(values), jnp.float32(jnp.nan), values)
        i = jax.lax.bitcast_convert_type(canon, jnp.int32)
        key = i ^ jnp.where(i < 0, jnp.int32(_LOW31), jnp.int32(0))
    elif jnp.issubdtype(dt, jnp.floating):
        key = _float_to_sortable_int(values)
    elif dt == jnp.bool_:
        key = values.astype(jnp.int32)
    elif jnp.dtype(dt).itemsize <= 4:
        key = values.astype(jnp.int32)
    else:
        key = values.astype(jnp.int64)

    if descending:
        key = ~key

    if valid is None:
        return [key]

    # null rank sorts before (nulls_first) or after (nulls_last) all values
    null_rank = jnp.where(
        valid,
        jnp.int32(1 if nulls_first else 0),
        jnp.int32(0 if nulls_first else 1),
    )
    return [null_rank, key]
