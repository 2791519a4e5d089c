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


def _f64_sortable_words(values: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """float64 -> (hi, lo) uint32 words whose unsigned LEX order equals the
    float total order.

    Never bitcasts to a 64-bit integer: the tunneled TPU backend's
    X64-rewrite pass cannot handle ``bitcast-convert s64`` (and 64-bit
    lanes are emulated anyway), so the f64 pattern is split into two
    native 32-bit words — the narrow-lane rule applied to float keys.
    NaNs canonicalize to +NaN first (Presto: NaN sorts greatest,
    velox/type/FloatingPointUtil.h analog).
    """
    canon = jnp.where(jnp.isnan(values), jnp.float64(jnp.nan), values)
    w = jax.lax.bitcast_convert_type(canon, jnp.uint32)  # (..., 2) LE
    lo, hi = w[..., 0], w[..., 1]
    neg = (hi >> 31) == 1
    hi2 = jnp.where(neg, ~hi, hi | jnp.uint32(0x80000000))
    lo2 = jnp.where(neg, ~lo, lo)
    return hi2, lo2


def _float_to_sortable_int(values: jax.Array) -> jax.Array:
    """Map float lanes to int64 with matching total order (NaN greatest).

    The f64 form is assembled from the 32-bit words of
    :func:`_f64_sortable_words` with shifts (wrap-around int64 arithmetic
    reproduces the bit pattern) — no 64-bit bitcast.
    """
    if values.dtype == jnp.float32:
        canon = jnp.where(jnp.isnan(values), jnp.float32(jnp.nan), values)
        i = jax.lax.bitcast_convert_type(canon, jnp.int32)
        k = i ^ jnp.where(i < 0, jnp.int32(_LOW31), jnp.int32(0))
        return k.astype(jnp.int64)
    hi2, lo2 = _f64_sortable_words(values)
    u = (hi2.astype(jnp.int64) << 32) | lo2.astype(jnp.int64)
    return u ^ jnp.int64(-2**63)  # unsigned order -> signed order


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
        keys = [i ^ jnp.where(i < 0, jnp.int32(_LOW31), jnp.int32(0))]
    elif jnp.issubdtype(dt, jnp.floating):
        # float64: two native 32-bit operands, no 64-bit lanes in the sort
        keys = list(_f64_sortable_words(values))
    elif dt == jnp.bool_:
        keys = [values.astype(jnp.int32)]
    elif jnp.dtype(dt).itemsize <= 4:
        keys = [values.astype(jnp.int32)]
    else:
        keys = [values.astype(jnp.int64)]

    if descending:
        keys = [~k for k in keys]

    if valid is None:
        return keys

    # null rank sorts before (nulls_first) or after (nulls_last) all values
    null_rank = jnp.where(
        valid,
        jnp.int32(1 if nulls_first else 0),
        jnp.int32(0 if nulls_first else 1),
    )
    return [null_rank] + keys
