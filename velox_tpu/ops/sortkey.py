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

_LOW31 = 0x7FFFFFFF


#: binary-search shifts: 512+512 reaches any |exponent| <= 1024, the rest
#: cover the remainder; total reach 1535 > 1074 (min denormal exponent)
_EXP_SHIFTS = (512, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)


def _f64_sortable_words(
    values: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """float64 -> three int32 words whose signed LEX order equals the
    float total order (NaN greatest; -0.0 == +0.0).

    Built from pure f64 multiply/compare/floor — the tunneled TPU
    backend's compiler crashes on ANY f64 bitcast (u32 or s64) and hangs
    on f64 transcendentals, so the exponent comes from an exact
    power-of-two binary search (22 elementwise steps) and the 52 mantissa
    bits split exactly into 26+26-bit integers. Zero falls out naturally
    (exponent searches to the floor), infinities and NaN get sentinel
    exponent classes. The narrow-lane rule applied to float keys: the
    sort itself only ever sees native 32-bit lanes.
    """
    nan = jnp.isnan(values)
    neg = values < 0            # False for NaN and for -0.0 (== +0.0)
    a = jnp.abs(jnp.where(nan, jnp.float64(0.0), values))
    inf = jnp.isinf(values)
    a = jnp.where(inf, jnp.float64(0.0), a)

    e = jnp.zeros(values.shape, jnp.int32)
    for s in _EXP_SHIFTS:                      # shrink |x| >= 2
        big = a >= jnp.float64(2.0) ** s
        a = jnp.where(big, a * jnp.float64(2.0) ** (-s), a)
        e = e + jnp.where(big, jnp.int32(s), jnp.int32(0))
    for s in _EXP_SHIFTS:                      # grow |x| < 1
        small = jnp.logical_and(a * jnp.float64(2.0) ** s < 2.0, a < 1.0)
        a = jnp.where(small, a * jnp.float64(2.0) ** s, a)
        e = e - jnp.where(small, jnp.int32(s), jnp.int32(0))
    # a in [1, 2) for finite nonzero; a == 0 for zero (e bottomed out).
    # XLA flushes f64 denormals to zero (FTZ), so |x| < 2^-1022 lands in
    # the zero class too — denormals compare equal to 0, a documented
    # platform deviation from exact IEEE total order.
    frac = jnp.maximum(a - 1.0, 0.0)            # 52 explicit bits
    scaled = frac * jnp.float64(1 << 26)
    mhi = jnp.floor(scaled).astype(jnp.int32)
    mlo = jnp.floor((scaled - mhi) * jnp.float64(1 << 26)).astype(
        jnp.int32)

    e = jnp.where(inf, jnp.int32(50_000), e)
    e = jnp.where(nan, jnp.int32(60_000), e)
    mhi = jnp.where(jnp.logical_or(inf, nan), jnp.int32(0), mhi)
    mlo = jnp.where(jnp.logical_or(inf, nan), jnp.int32(0), mlo)

    w1 = jnp.where(neg, jnp.int32(-100_000) - e, jnp.int32(100_000) + e)
    flip = jnp.int32((1 << 26) - 1)
    w2 = jnp.where(neg, flip - mhi, mhi)
    w3 = jnp.where(neg, flip - mlo, mlo)
    return w1, w2, w3


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
