"""Default scalar function package (Presto semantics subset).

Covers the function surface TPC-H needs plus the common core: arithmetic,
comparisons, boolean special-form kernels, date part extraction, IN-lists.
Reference semantics: velox/functions/prestosql (Arithmetic.h,
Comparisons.cpp, DateTimeFunctions.h). Notable Presto rules implemented:

* integer division truncates toward zero; modulus sign follows the dividend
* division/modulus by zero yields NULL here (Presto throws; the engine has no
  row-level exceptions, so errors surface as nulls — TRY semantics are the
  default, velox/expression/TryExpr.h analog)
* AND/OR use Kleene three-valued logic (velox/expression/ConjunctExpr.h)
* IF with a NULL condition takes the else branch

Date math uses Howard Hinnant's civil-from-days algorithm in pure integer
lanes (no table lookups — VPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import (
    BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER, REAL, TIMESTAMP, DataType,
)
from velox_tpu.types.types import DecimalType, TypeKind, common_numeric_type
from velox_tpu.functions.registry import ScalarFunction, register_function


# ------------------------------------------------------------------ helpers

def _all_valid(values):
    return jnp.ones(values.shape, dtype=jnp.bool_)


def _arith_type(args):
    if len(args) != 2:
        raise TypeError("binary arithmetic takes 2 args")
    a, b = args
    if isinstance(a, DecimalType) or isinstance(b, DecimalType):
        raise TypeError("decimal arithmetic resolved by compiler")
    return common_numeric_type(a, b)


def _compare_type(args):
    return BOOLEAN


def _same_type(args):
    return args[0]


def _trunc_div(a, b):
    """Truncate-toward-zero integer division (Presto int division)."""
    if jnp.issubdtype(a.dtype, jnp.integer):
        q = jnp.abs(a) // jnp.maximum(jnp.abs(b), 1)
        return jnp.where((a < 0) ^ (b < 0), -q, q)
    return a / b


# -------------------------------------------------------------- arithmetic

def _div_impl(pairs0, pairs1):
    (a, va), (b, vb) = pairs0, pairs1
    zero = b == 0 if jnp.issubdtype(b.dtype, jnp.integer) else None
    if zero is not None:
        safe_b = jnp.where(zero, 1, b)
        vals = _trunc_div(a, safe_b)
        valid = jnp.logical_and(
            va if va is not None else _all_valid(a),
            vb if vb is not None else _all_valid(b),
        )
        valid = jnp.logical_and(valid, jnp.logical_not(zero))
        return vals, valid
    vals = a / b
    valid = None
    if va is not None or vb is not None:
        valid = jnp.logical_and(
            va if va is not None else _all_valid(a),
            vb if vb is not None else _all_valid(b),
        )
    return vals, valid


def _mod_impl(pairs0, pairs1):
    (a, va), (b, vb) = pairs0, pairs1
    if jnp.issubdtype(a.dtype, jnp.integer):
        zero = b == 0
        safe_b = jnp.where(zero, 1, b)
        vals = a - _trunc_div(a, safe_b) * safe_b
        valid = jnp.logical_and(
            va if va is not None else _all_valid(a),
            vb if vb is not None else _all_valid(b),
        )
        valid = jnp.logical_and(valid, jnp.logical_not(zero))
        return vals, valid
    # float fmod: sign follows dividend
    vals = jnp.fmod(a, b)
    valid = None
    if va is not None or vb is not None:
        valid = jnp.logical_and(
            va if va is not None else _all_valid(a),
            vb if vb is not None else _all_valid(b),
        )
    return vals, valid


register_function(ScalarFunction("plus", _arith_type, lambda a, b: a + b))
register_function(ScalarFunction("minus", _arith_type, lambda a, b: a - b))
register_function(ScalarFunction("multiply", _arith_type, lambda a, b: a * b))
register_function(ScalarFunction(
    "divide", _arith_type, _div_impl, default_nulls=False))
register_function(ScalarFunction(
    "mod", _arith_type, _mod_impl, default_nulls=False))
register_function(ScalarFunction("negate", lambda a: a[0], lambda a: -a))
register_function(ScalarFunction("abs", lambda a: a[0], lambda a: jnp.abs(a)))
def _round_impl(a, d=None):
    # Presto rounds half AWAY FROM ZERO (velox/functions/prestosql/
    # Arithmetic.h RoundFunction), not numpy's half-to-even
    if not jnp.issubdtype(a.dtype, jnp.floating):
        return a
    if d is None:
        return jnp.sign(a) * jnp.floor(jnp.abs(a) + 0.5)
    scale = jnp.power(10.0, d).astype(a.dtype)
    return jnp.sign(a) * jnp.floor(jnp.abs(a) * scale + 0.5) / scale


register_function(ScalarFunction(
    "round", lambda a: a[0], _round_impl))
register_function(ScalarFunction("sqrt", lambda a: DOUBLE, lambda a: jnp.sqrt(a)))
register_function(ScalarFunction("exp", lambda a: DOUBLE, lambda a: jnp.exp(a)))
register_function(ScalarFunction("ln", lambda a: DOUBLE, lambda a: jnp.log(a)))
register_function(ScalarFunction(
    "power", lambda a: DOUBLE, lambda a, b: jnp.power(a, b)))
register_function(ScalarFunction(
    "floor", lambda a: a[0], lambda a: jnp.floor(a)))
register_function(ScalarFunction(
    "ceil", lambda a: a[0], lambda a: jnp.ceil(a)))
def _variadic(op):
    def impl(a, *rest):
        for b in rest:
            a = op(a, b)
        return a
    return impl


register_function(ScalarFunction(
    "greatest", lambda a: a[0], _variadic(jnp.maximum)))
register_function(ScalarFunction(
    "least", lambda a: a[0], _variadic(jnp.minimum)))

# ------------------------------------------------------------- comparisons

register_function(ScalarFunction(
    "eq", _compare_type, lambda a, b: a == b, dictionary_safe=True))
register_function(ScalarFunction(
    "neq", _compare_type, lambda a, b: a != b, dictionary_safe=True))
register_function(ScalarFunction("lt", _compare_type, lambda a, b: a < b))
register_function(ScalarFunction("lte", _compare_type, lambda a, b: a <= b))
register_function(ScalarFunction("gt", _compare_type, lambda a, b: a > b))
register_function(ScalarFunction("gte", _compare_type, lambda a, b: a >= b))
register_function(ScalarFunction(
    "between", _compare_type,
    lambda x, lo, hi: jnp.logical_and(x >= lo, x <= hi)))


def _in_impl(x, *consts):
    m = x == consts[0]
    for c in consts[1:]:
        m = jnp.logical_or(m, x == c)
    return m


register_function(ScalarFunction(
    "in", _compare_type, _in_impl, dictionary_safe=True))


def _like_unbound(*a):  # pragma: no cover
    raise RuntimeError(
        "LIKE must be bound against a dictionary column (bind_strings) "
        "before device evaluation")


# LIKE resolves to BOOLEAN; the compiler's bind phase rewrites it into a
# host-evaluated dictionary lookup table (see expr/compiler.py bind_strings).
register_function(ScalarFunction("like", _compare_type, _like_unbound))

# ------------------------------------------------- boolean (special forms)


def _kleene_and(*pairs):
    vals, valid = pairs[0]
    if valid is None:
        valid = _all_valid(vals)
    vals = jnp.logical_and(vals, valid)  # canonicalize: null lanes -> False
    false = jnp.logical_and(valid, jnp.logical_not(vals))
    for v2, va2 in pairs[1:]:
        if va2 is None:
            va2 = _all_valid(v2)
        f2 = jnp.logical_and(va2, jnp.logical_not(v2))
        false = jnp.logical_or(false, f2)
        vals = jnp.logical_and(vals, jnp.logical_and(v2, va2))
        valid = jnp.logical_or(false, jnp.logical_and(valid, va2))
    return vals, valid


def _kleene_or(*pairs):
    vals, valid = pairs[0]
    if valid is None:
        valid = _all_valid(vals)
    vals = jnp.logical_and(vals, valid)
    true = vals
    for v2, va2 in pairs[1:]:
        if va2 is None:
            va2 = _all_valid(v2)
        t2 = jnp.logical_and(va2, v2)
        true = jnp.logical_or(true, t2)
        vals = jnp.logical_or(vals, t2)
        valid = jnp.logical_or(true, jnp.logical_and(valid, va2))
    return vals, valid


def _not_impl(pair):
    vals, valid = pair
    return jnp.logical_not(vals), valid


def _is_null_impl(pair):
    vals, valid = pair
    if valid is None:
        return jnp.zeros(vals.shape, dtype=jnp.bool_), None
    return jnp.logical_not(valid), None


def _is_not_null_impl(pair):
    vals, valid = pair
    if valid is None:
        return jnp.ones(vals.shape, dtype=jnp.bool_), None
    return valid, None


def _coalesce_impl(*pairs):
    vals, valid = pairs[0]
    if valid is None:
        return vals, None
    for v2, va2 in pairs[1:]:
        vals = jnp.where(valid, vals, v2)
        if va2 is None:
            return vals, None
        valid = jnp.logical_or(valid, va2)
    return vals, valid


def _if_impl(cond_pair, then_pair, *else_pair):
    cv, cvalid = cond_pair
    taken = cv if cvalid is None else jnp.logical_and(cv, cvalid)
    tv, tvalid = then_pair
    if else_pair:
        ev, evalid = else_pair[0]
    else:
        ev, evalid = jnp.zeros_like(tv), jnp.zeros(tv.shape, dtype=jnp.bool_)
    vals = jnp.where(taken, tv, ev)
    if tvalid is None and evalid is None:
        return vals, None
    tvalid = tvalid if tvalid is not None else _all_valid(tv)
    evalid = evalid if evalid is not None else _all_valid(ev)
    return vals, jnp.where(taken, tvalid, evalid)


def _switch_impl(*pairs):
    """switch(c1, v1, c2, v2, ..., [else]) — first true condition wins."""
    n = len(pairs)
    has_else = n % 2 == 1
    npairs = n // 2
    ev, evalid = (pairs[-1] if has_else
                  else (jnp.zeros_like(pairs[1][0]),
                        jnp.zeros(pairs[1][0].shape, dtype=jnp.bool_)))
    vals, valid = ev, (evalid if evalid is not None else _all_valid(ev))
    # fold back-to-front so the first condition has priority
    for i in reversed(range(npairs)):
        cv, cvalid = pairs[2 * i]
        tv, tvalid = pairs[2 * i + 1]
        taken = cv if cvalid is None else jnp.logical_and(cv, cvalid)
        vals = jnp.where(taken, tv, vals)
        tvalid = tvalid if tvalid is not None else _all_valid(tv)
        valid = jnp.where(taken, tvalid, valid)
    return vals, valid


register_function(ScalarFunction(
    "and", lambda a: BOOLEAN, _kleene_and, default_nulls=False,
    dictionary_safe=True))
register_function(ScalarFunction(
    "or", lambda a: BOOLEAN, _kleene_or, default_nulls=False,
    dictionary_safe=True))
register_function(ScalarFunction(
    "not", lambda a: BOOLEAN, _not_impl, default_nulls=False))
register_function(ScalarFunction(
    "is_null", lambda a: BOOLEAN, _is_null_impl, default_nulls=False,
    dictionary_safe=True))
register_function(ScalarFunction(
    "is_not_null", lambda a: BOOLEAN, _is_not_null_impl, default_nulls=False,
    dictionary_safe=True))
register_function(ScalarFunction(
    "coalesce", lambda a: a[0], _coalesce_impl, default_nulls=False))
register_function(ScalarFunction(
    "if", lambda a: a[1], _if_impl, default_nulls=False))
register_function(ScalarFunction(
    "switch", lambda a: a[1], _switch_impl, default_nulls=False))

# -------------------------------------------------------------- date parts
# Howard Hinnant civil-from-days; all ops stay in int32 lanes.


def _civil_from_days(days):
    z = days.astype(jnp.int32) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(
        doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524)
        - jnp.floor_divide(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4)
                 - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y, m, d


register_function(ScalarFunction(
    "year", lambda a: BIGINT,
    lambda a: _civil_from_days(a)[0].astype(jnp.int64)))
register_function(ScalarFunction(
    "month", lambda a: BIGINT,
    lambda a: _civil_from_days(a)[1].astype(jnp.int64)))
register_function(ScalarFunction(
    "day", lambda a: BIGINT,
    lambda a: _civil_from_days(a)[2].astype(jnp.int64)))
register_function(ScalarFunction(
    "quarter", lambda a: BIGINT,
    lambda a: (jnp.floor_divide(_civil_from_days(a)[1] - 1, 3) + 1
               ).astype(jnp.int64)))


# ----------------------------------------------- math breadth (Presto)
# velox/functions/prestosql/Arithmetic.h — pure VPU transcendentals.

for _n, _f in [
    ("sin", jnp.sin), ("cos", jnp.cos), ("tan", jnp.tan),
    ("asin", jnp.arcsin), ("acos", jnp.arccos), ("atan", jnp.arctan),
    ("sinh", jnp.sinh), ("cosh", jnp.cosh), ("tanh", jnp.tanh),
    ("cbrt", jnp.cbrt), ("log2", jnp.log2), ("log10", jnp.log10),
    ("degrees", jnp.degrees), ("radians", jnp.radians),
]:
    register_function(ScalarFunction(
        _n, lambda a: DOUBLE,
        (lambda f: lambda a: f(a.astype(jnp.float64)))(_f)))

register_function(ScalarFunction(
    "atan2", lambda a: DOUBLE,
    lambda y, x: jnp.arctan2(y.astype(jnp.float64),
                             x.astype(jnp.float64))))
register_function(ScalarFunction(
    "sign", lambda a: a[0], lambda a: jnp.sign(a)))
register_function(ScalarFunction(
    "truncate", lambda a: a[0],
    lambda a, *n: (
        jnp.trunc(a) if not n and jnp.issubdtype(a.dtype, jnp.floating)
        else a if not n
        else jnp.trunc(a * jnp.power(10.0, n[0]))
        / jnp.power(10.0, n[0]))))
register_function(ScalarFunction(
    "is_nan", lambda a: BOOLEAN, lambda a: jnp.isnan(a)))
register_function(ScalarFunction(
    "is_finite", lambda a: BOOLEAN, lambda a: jnp.isfinite(a)))
register_function(ScalarFunction(
    "is_infinite", lambda a: BOOLEAN, lambda a: jnp.isinf(a)))
register_function(ScalarFunction(
    "pi", lambda a: DOUBLE, lambda: jnp.float64(np.pi)))
register_function(ScalarFunction(
    "e", lambda a: DOUBLE, lambda: jnp.float64(np.e)))
register_function(ScalarFunction(
    "nan", lambda a: DOUBLE, lambda: jnp.float64(np.nan)))
register_function(ScalarFunction(
    "infinity", lambda a: DOUBLE, lambda: jnp.float64(np.inf)))

# ------------------------------------------------- bitwise (Presto)
# velox/functions/prestosql/Bitwise.h

register_function(ScalarFunction(
    "bitwise_and", _arith_type, lambda a, b: jnp.bitwise_and(a, b)))
register_function(ScalarFunction(
    "bitwise_or", _arith_type, lambda a, b: jnp.bitwise_or(a, b)))
register_function(ScalarFunction(
    "bitwise_xor", _arith_type, lambda a, b: jnp.bitwise_xor(a, b)))
register_function(ScalarFunction(
    "bitwise_not", lambda a: a[0], lambda a: jnp.bitwise_not(a)))
register_function(ScalarFunction(
    "bitwise_left_shift", _arith_type,
    lambda a, b: jnp.left_shift(a, b.astype(a.dtype))))
register_function(ScalarFunction(
    "bitwise_right_shift", _arith_type,
    lambda a, b: jax.lax.shift_right_logical(a, b.astype(a.dtype))))
register_function(ScalarFunction(
    "bitwise_arithmetic_shift_right", _arith_type,
    lambda a, b: jnp.right_shift(a, b.astype(a.dtype))))
register_function(ScalarFunction(
    "bit_count", lambda a: BIGINT,
    lambda a, *rest: jax.lax.population_count(
        a.astype(jnp.uint64)).astype(jnp.int64)))

# ------------------------------------------- conditional breadth


def _nullif_impl(pa_, pb_):
    (a, va), (b, vb) = pa_, pb_
    both = None
    if va is not None and vb is not None:
        both = jnp.logical_and(va, vb)
    elif va is not None:
        both = va
    elif vb is not None:
        both = vb
    equal = a == b
    if both is not None:
        equal = jnp.logical_and(equal, both)
    valid = jnp.logical_not(equal)
    if va is not None:
        valid = jnp.logical_and(valid, va)
    return a, valid


register_function(ScalarFunction(
    "nullif", lambda a: a[0], _nullif_impl, default_nulls=False))

# ------------------------------------- date part breadth (Presto)
# velox/functions/prestosql/DateTimeFunctions.h — all in int32 lanes,
# Howard Hinnant civil<->days both directions, no lookup tables.


def _days_from_civil(y, m, d):
    y = y - (m <= 2)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    doy = (jnp.floor_divide(
        153 * (m + jnp.where(m > 2, -3, 9)) + 2, 5) + d - 1)
    doe = (yoe * 365 + jnp.floor_divide(yoe, 4)
           - jnp.floor_divide(yoe, 100) + doy)
    return era * 146097 + doe - 719468


def _iso_dow(days):
    """ISO day of week, Monday=1..Sunday=7 (1970-01-01 was a Thursday)."""
    return jnp.mod(days.astype(jnp.int32) + 3, 7) + 1


def _doy(days):
    days = days.astype(jnp.int32)
    y, _, _ = _civil_from_days(days)
    ones = jnp.ones_like(y)
    return days - _days_from_civil(y, ones, ones) + 1


def _iso_weeks_in_year(y):
    def p(y):
        return jnp.mod(y + jnp.floor_divide(y, 4)
                       - jnp.floor_divide(y, 100)
                       + jnp.floor_divide(y, 400), 7)
    return 52 + jnp.logical_or(p(y) == 4, p(y - 1) == 3).astype(y.dtype)


def _iso_week(days):
    days = days.astype(jnp.int32)
    y, _, _ = _civil_from_days(days)
    w0 = jnp.floor_divide(_doy(days) - _iso_dow(days) + 10, 7)
    # both remaps act on the RAW w0: a w0==0 date belongs to the
    # previous ISO year's last week (52 or 53) and must NOT then be
    # clamped against THIS year's week count
    return jnp.where(w0 == 0, _iso_weeks_in_year(y - 1),
                     jnp.where(w0 > _iso_weeks_in_year(y), 1, w0))


def _last_day_of_month_days(days):
    y, m, _ = _civil_from_days(days.astype(jnp.int32))
    ny = jnp.where(m == 12, y + 1, y)
    nm = jnp.where(m == 12, 1, m + 1)
    return _days_from_civil(ny, nm, jnp.ones_like(nm)) - 1


register_function(ScalarFunction(
    "day_of_week", lambda a: BIGINT,
    lambda a: _iso_dow(a).astype(jnp.int64)))
register_function(ScalarFunction(
    "dow", lambda a: BIGINT, lambda a: _iso_dow(a).astype(jnp.int64)))
register_function(ScalarFunction(
    "day_of_year", lambda a: BIGINT,
    lambda a: _doy(a).astype(jnp.int64)))
register_function(ScalarFunction(
    "doy", lambda a: BIGINT, lambda a: _doy(a).astype(jnp.int64)))
register_function(ScalarFunction(
    "day_of_month", lambda a: BIGINT,
    lambda a: _civil_from_days(a)[2].astype(jnp.int64)))
register_function(ScalarFunction(
    "week", lambda a: BIGINT, lambda a: _iso_week(a).astype(jnp.int64)))
register_function(ScalarFunction(
    "week_of_year", lambda a: BIGINT,
    lambda a: _iso_week(a).astype(jnp.int64)))
register_function(ScalarFunction(
    "last_day_of_month", lambda a: DATE,
    lambda a: _last_day_of_month_days(a).astype(jnp.int32)))

# timestamp lanes are int64 microseconds since epoch (arrow ingest,
# velox_tpu/vector/arrow_bridge.py)
_US_DAY = 86_400_000_000
_US_HOUR = 3_600_000_000
_US_MIN = 60_000_000


def _ts_part(div, mod):
    def impl(ts):
        return jnp.floor_divide(jnp.mod(ts, mod), div).astype(jnp.int64)
    return impl


register_function(ScalarFunction(
    "hour", lambda a: BIGINT, _ts_part(_US_HOUR, _US_DAY)))
register_function(ScalarFunction(
    "minute", lambda a: BIGINT, _ts_part(_US_MIN, _US_HOUR)))
register_function(ScalarFunction(
    "second", lambda a: BIGINT, _ts_part(1_000_000, _US_MIN)))
register_function(ScalarFunction(
    "millisecond", lambda a: BIGINT, _ts_part(1_000, 1_000_000)))
register_function(ScalarFunction(
    "to_unixtime", lambda a: DOUBLE,
    lambda a: a.astype(jnp.float64) / 1e6))
register_function(ScalarFunction(
    "from_unixtime", lambda a: TIMESTAMP,
    lambda a: (a.astype(jnp.float64) * 1e6).astype(jnp.int64)))


# ----------------------------------------------- array functions (Presto)
# velox/functions/prestosql/ArrayFunctions.h + Cardinality. Surface
# functions resolve types only — the compiler rewrites every call into an
# internal __array_* form over the array column's derived lanes
# (start/len/elements, velox_tpu/expr/compiler.py bind_array_funcs), so
# segment reductions run as prefix-sum gathers that stay correct for
# arbitrary (gathered, overlapping) offsets.


def _array_elem_type(args):
    from velox_tpu.types.types import ArrayType, MapType

    if isinstance(args[0], MapType):
        return args[0].value      # element_at(map, key) -> value type
    if not isinstance(args[0], ArrayType):
        raise TypeError(f"expected ARRAY argument, got {args[0]}")
    return args[0].element


def _array_sum_type(args):
    t = _array_elem_type(args)
    if t.kind in (TypeKind.REAL, TypeKind.DOUBLE):
        return DOUBLE
    return BIGINT


def _unbound_array(*a):  # pragma: no cover
    raise RuntimeError("array function must be bound by the compiler")


for _n, _rt in [
    ("cardinality", lambda a: BIGINT),
    ("array_sum", _array_sum_type),
    ("array_average", lambda a: DOUBLE),
    ("contains", lambda a: BOOLEAN),
    ("element_at", _array_elem_type),
    ("array_position", lambda a: BIGINT),
    ("array_min", _array_elem_type),
    ("array_max", _array_elem_type),
    ("array_sort", lambda a: a[0]),
    ("array_distinct", lambda a: a[0]),
]:
    register_function(ScalarFunction(_n, _rt, _unbound_array))


def _prefix(vals):
    return jnp.concatenate(
        [jnp.zeros((1,), vals.dtype), jnp.cumsum(vals)])


def _seg_range(ps, st, ln):
    """Per-row prefix difference over [start, start+len)."""
    hi = jnp.take(ps, (st + ln).astype(jnp.int32), mode="clip")
    lo = jnp.take(ps, st.astype(jnp.int32), mode="clip")
    return hi - lo


def _array_sum_impl(stp, lnp, evp):
    (st, _), (ln, lv), (ev, evalid) = stp, lnp, evp
    wide = (jnp.float64 if jnp.issubdtype(ev.dtype, jnp.floating)
            else jnp.int64)
    contrib = ev.astype(wide)
    if evalid is not None:
        contrib = jnp.where(evalid, contrib, 0)
    return _seg_range(_prefix(contrib), st, ln), lv


def _array_avg_impl(stp, lnp, evp):
    (st, _), (ln, lv), (ev, evalid) = stp, lnp, evp
    contrib = ev.astype(jnp.float64)
    ones = jnp.ones(ev.shape, jnp.int32)
    if evalid is not None:
        contrib = jnp.where(evalid, contrib, 0.0)
        ones = jnp.where(evalid, ones, 0)
    s = _seg_range(_prefix(contrib), st, ln)
    c = _seg_range(_prefix(ones), st, ln)
    valid = c > 0
    if lv is not None:
        valid = jnp.logical_and(valid, lv)
    return s / jnp.maximum(c, 1).astype(jnp.float64), valid


def _array_contains_impl(stp, lnp, evp, litp):
    (st, _), (ln, lv), (ev, evalid), (v, _) = stp, lnp, evp, litp
    hits = (ev == v.astype(ev.dtype)).astype(jnp.int32)
    if evalid is not None:
        hits = jnp.where(evalid, hits, 0)
    found = _seg_range(_prefix(hits), st, ln) > 0
    valid = lv
    if evalid is not None:
        # Presto: not-found in an array containing nulls -> NULL
        nulls = _seg_range(
            _prefix(jnp.logical_not(evalid).astype(jnp.int32)), st, ln)
        sure = jnp.logical_or(found, nulls == 0)
        valid = sure if valid is None else jnp.logical_and(valid, sure)
    return found, valid


def _array_element_at_impl(stp, lnp, evp, idxp):
    (st, _), (ln, lv), (ev, evalid), (idx, iv) = stp, lnp, evp, idxp
    idx = idx.astype(jnp.int32)
    # Presto 1-based; negative counts from the end
    i0 = jnp.where(idx < 0, ln + idx, idx - 1)
    inb = jnp.logical_and(i0 >= 0, i0 < ln)
    pos = jnp.clip(st + jnp.clip(i0, 0), 0, ev.shape[0] - 1)
    vals = jnp.take(ev, pos)
    valid = inb
    if lv is not None:
        valid = jnp.logical_and(valid, lv)
    if iv is not None:
        valid = jnp.logical_and(valid, iv)
    if evalid is not None:
        valid = jnp.logical_and(valid, jnp.take(evalid, pos))
    return vals, valid


register_function(ScalarFunction(
    "__array_sum", lambda a: BIGINT, _array_sum_impl,
    default_nulls=False))
register_function(ScalarFunction(
    "__array_avg", lambda a: DOUBLE, _array_avg_impl,
    default_nulls=False))
register_function(ScalarFunction(
    "__array_contains", lambda a: BOOLEAN, _array_contains_impl,
    default_nulls=False))
register_function(ScalarFunction(
    "__array_element_at", lambda a: a[2], _array_element_at_impl,
    default_nulls=False))


def _range_tables(v, op, ident):
    """Sparse table over the flat element lane: tables[j][i] = reduce of
    v[i : i + 2**j] (idempotent ops; two overlapping windows answer any
    range — the segment-tree role for per-row array reductions)."""
    n = v.shape[0]
    tables = [v]
    t = v
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [t[k:], jnp.full((min(k, n),), ident, t.dtype)])[:n]
        t = op(t, shifted)
        tables.append(t)
        k <<= 1
    return tables


def _range_reduce(tables, starts, lengths, op, ident):
    n = tables[0].shape[0]
    out = jnp.full(starts.shape, ident, tables[0].dtype)
    for j, tab in enumerate(tables):
        w = 1 << j
        a = jnp.take(tab, jnp.clip(starts, 0, n - 1), mode="clip")
        b = jnp.take(tab, jnp.clip(starts + lengths - w, 0, n - 1),
                     mode="clip")
        cand = op(a, b)
        use = jnp.logical_and(lengths >= w, lengths < 2 * w)
        out = jnp.where(use, cand, out)
    return out


def _make_array_minmax(is_min):
    def impl(stp, lnp, evp):
        (st, _), (ln, lv), (ev, evalid) = stp, lnp, evp
        if jnp.issubdtype(ev.dtype, jnp.floating):
            big = jnp.finfo(ev.dtype).max
            ident = big if is_min else -big
        else:
            info = jnp.iinfo(ev.dtype)
            ident = info.max if is_min else info.min
        op = jnp.minimum if is_min else jnp.maximum
        v = ev if evalid is None else jnp.where(evalid, ev, ident)
        tables = _range_tables(v, op, ident)
        # count non-null elements per row for validity
        ones = (jnp.ones(ev.shape, jnp.int32) if evalid is None
                else evalid.astype(jnp.int32))
        cnt = _seg_range(_prefix(ones), st, ln)
        out = _range_reduce(tables, st, ln, op, ident)
        valid = cnt > 0
        if lv is not None:
            valid = jnp.logical_and(valid, lv)
        return out, valid

    return impl


register_function(ScalarFunction(
    "__array_min", lambda a: a[2], _make_array_minmax(True),
    default_nulls=False))
register_function(ScalarFunction(
    "__array_max", lambda a: a[2], _make_array_minmax(False),
    default_nulls=False))


def _match_counts(stp, lnp, predp):
    (st, _), (ln, lv), (pv, pvalid) = stp, lnp, predp
    valid = (jnp.ones(pv.shape, jnp.bool_) if pvalid is None else pvalid)
    t = jnp.logical_and(pv, valid).astype(jnp.int32)
    f = jnp.logical_and(~pv, valid).astype(jnp.int32)
    n = (~valid).astype(jnp.int32)
    nt = _seg_range(_prefix(t), st, ln)
    nf = _seg_range(_prefix(f), st, ln)
    nn = _seg_range(_prefix(n), st, ln)
    return nt, nf, nn, lv


def _any_match_impl(stp, lnp, predp):
    nt, nf, nn, lv = _match_counts(stp, lnp, predp)
    sure = jnp.logical_or(nt > 0, nn == 0)
    valid = sure if lv is None else jnp.logical_and(lv, sure)
    return nt > 0, valid


def _all_match_impl(stp, lnp, predp):
    nt, nf, nn, lv = _match_counts(stp, lnp, predp)
    sure = jnp.logical_or(nf > 0, nn == 0)
    valid = sure if lv is None else jnp.logical_and(lv, sure)
    return nf == 0, valid


def _none_match_impl(stp, lnp, predp):
    nt, nf, nn, lv = _match_counts(stp, lnp, predp)
    sure = jnp.logical_or(nt > 0, nn == 0)
    valid = sure if lv is None else jnp.logical_and(lv, sure)
    return nt == 0, valid


for _n, _impl in [("__array_any_match", _any_match_impl),
                  ("__array_all_match", _all_match_impl),
                  ("__array_none_match", _none_match_impl)]:
    register_function(ScalarFunction(
        _n, lambda a: BOOLEAN, _impl, default_nulls=False))


def _capture_impl(stp, lnp, evp, colp):
    """Lambda capture: gather an outer-row column to element capacity by
    owning row (velox/expression/LambdaExpr.cpp capture semantics; the
    element lanes contract assumes canonical ascending offsets —
    exec/collect_agg.element_owners)."""
    from velox_tpu.exec.collect_agg import element_owners

    (st, _), (ln, _), (ev, _), (cv, cvalid) = stp, lnp, evp, colp
    owner, within = element_owners(st, ln, ev.shape[0])
    vals = jnp.take(cv, owner, mode="clip")
    valid = within
    if cvalid is not None:
        valid = jnp.logical_and(
            valid, jnp.take(cvalid, owner, mode="clip"))
    return vals, valid


register_function(ScalarFunction(
    "__capture", lambda a: a[3], _capture_impl, default_nulls=False))



def _map_element_at_impl(stp, lnp, kvp, vvp, litp):
    """MAP subscript: keys are unique per map, so the single hit is
    recoverable with one prefix-sum difference — no search
    (velox/functions/prestosql/MapSubscript.h analog)."""
    (st, _), (ln, lv), (kv, kvalid), (vv, vvalid), (lit, _) = (
        stp, lnp, kvp, vvp, litp)
    hit = kv == lit.astype(kv.dtype)
    if kvalid is not None:
        hit = jnp.logical_and(hit, kvalid)
    h32 = hit.astype(jnp.int32)
    found = _seg_range(_prefix(h32), st, ln) > 0
    wide = (jnp.float64 if jnp.issubdtype(vv.dtype, jnp.floating)
            else jnp.int64)
    # shift codes/values by +1 under the hit so 0 is recoverable
    contrib = jnp.where(hit, vv.astype(wide) + 1, 0)
    got = _seg_range(_prefix(contrib), st, ln) - 1
    vals = got.astype(vv.dtype)
    valid = found
    if lv is not None:
        valid = jnp.logical_and(valid, lv)
    if vvalid is not None:
        vok = _seg_range(
            _prefix(jnp.logical_and(hit, vvalid).astype(jnp.int32)),
            st, ln) > 0
        valid = jnp.logical_and(valid, vok)
    return vals, valid


register_function(ScalarFunction(
    "__map_element_at", lambda a: a[3], _map_element_at_impl,
    default_nulls=False))


# -------------------------------------- unit-literal datetime functions
# velox/functions/prestosql/DateTimeFunctions.h date_trunc/date_add/
# date_diff; DATE lanes are int32 days, TIMESTAMP lanes int64 us.
# All civil math is Hinnant days<->civil in pure int lanes.

def _ymd(days):
    return _civil_from_days(days.astype(jnp.int32))


def _trunc_month_days(days):
    y, m, _ = _ymd(days)
    return _days_from_civil(y, m, jnp.ones_like(m))


def _trunc_quarter_days(days):
    y, m, _ = _ymd(days)
    qm = ((m - 1) // 3) * 3 + 1
    return _days_from_civil(y, qm, jnp.ones_like(m))


def _trunc_year_days(days):
    y, _, _ = _ymd(days)
    one = jnp.ones_like(y)
    return _days_from_civil(y, one, one)


def _trunc_week_days(days):
    return days.astype(jnp.int32) - (_iso_dow(days) - 1)


def _is_ts(a):
    return a.dtype == jnp.int64


def _trunc(day_fn, us_quantum):
    def impl(a):
        if _is_ts(a):
            if us_quantum is not None:
                return a - jnp.mod(a, us_quantum)
            d = jnp.floor_divide(a, _US_DAY).astype(jnp.int32)
            return day_fn(d).astype(jnp.int64) * _US_DAY
        return day_fn(a).astype(a.dtype)
    return impl


register_function(ScalarFunction(
    "__date_trunc_day", lambda a: a[0],
    lambda a: (a - jnp.mod(a, _US_DAY)) if _is_ts(a) else a))
register_function(ScalarFunction(
    "__date_trunc_hour", lambda a: a[0],
    lambda a: a - jnp.mod(a, _US_HOUR)))
register_function(ScalarFunction(
    "__date_trunc_minute", lambda a: a[0],
    lambda a: a - jnp.mod(a, _US_MIN)))
register_function(ScalarFunction(
    "__date_trunc_second", lambda a: a[0],
    lambda a: a - jnp.mod(a, 1_000_000)))
for _u, _fn, _q in [("week", _trunc_week_days, None),
                    ("month", _trunc_month_days, None),
                    ("quarter", _trunc_quarter_days, None),
                    ("year", _trunc_year_days, None)]:
    register_function(ScalarFunction(
        f"__date_trunc_{_u}", lambda a: a[0], _trunc(_fn, _q)))


def _days_in_month(y, m):
    ny = jnp.where(m == 12, y + 1, y)
    nm = jnp.where(m == 12, 1, m + 1)
    return (_days_from_civil(ny, nm, jnp.ones_like(m))
            - _days_from_civil(y, m, jnp.ones_like(m)))


def _add_months_days(days, n):
    y, m, dd = _ymd(days)
    n = n.astype(jnp.int32)
    m0 = m - 1 + n
    y2 = y + jnp.floor_divide(m0, 12)
    m2 = jnp.mod(m0, 12) + 1
    dd2 = jnp.minimum(dd, _days_in_month(y2, m2))  # Presto clamps
    return _days_from_civil(y2, m2, dd2)


def _date_add(unit):
    day_units = {"day": 1, "week": 7}

    def impl(n, x):
        if unit in day_units:
            k = day_units[unit]
            if _is_ts(x):
                return x + n.astype(jnp.int64) * (k * _US_DAY)
            return (x + n.astype(x.dtype) * k).astype(x.dtype)
        if unit in ("month", "quarter", "year"):
            mult = {"month": 1, "quarter": 3, "year": 12}[unit]
            if _is_ts(x):
                d = jnp.floor_divide(x, _US_DAY).astype(jnp.int32)
                tod = jnp.mod(x, _US_DAY)
                return (_add_months_days(d, n * mult).astype(jnp.int64)
                        * _US_DAY + tod)
            return _add_months_days(x, n * mult).astype(x.dtype)
        q = {"hour": _US_HOUR, "minute": _US_MIN,
             "second": 1_000_000, "millisecond": 1_000}[unit]
        return x + n.astype(jnp.int64) * q
    return impl


for _u in ("day", "week", "month", "quarter", "year", "hour", "minute",
           "second", "millisecond"):
    register_function(ScalarFunction(
        f"__date_add_{_u}", lambda a: a[1], _date_add(_u)))


def _date_diff(unit):
    def impl(a, b):
        if unit in ("day", "week"):
            if _is_ts(a):
                d = (jnp.floor_divide(b, _US_DAY)
                     - jnp.floor_divide(a, _US_DAY))
            else:
                d = (b - a).astype(jnp.int64)
            return (d // 7 if unit == "week" else d).astype(jnp.int64)
        if unit in ("month", "quarter", "year"):
            da = (jnp.floor_divide(a, _US_DAY).astype(jnp.int32)
                  if _is_ts(a) else a)
            db = (jnp.floor_divide(b, _US_DAY).astype(jnp.int32)
                  if _is_ts(b) else b)
            ya, ma, dda = _ymd(da)
            yb, mb, ddb = _ymd(db)
            months = (yb - ya) * 12 + (mb - ma)
            months = months - (ddb < dda)   # partial month doesn't count
            div = {"month": 1, "quarter": 3, "year": 12}[unit]
            return (months // div).astype(jnp.int64)
        q = {"hour": _US_HOUR, "minute": _US_MIN,
             "second": 1_000_000, "millisecond": 1_000}[unit]
        return ((b - a) // q).astype(jnp.int64)
    return impl


for _u in ("day", "week", "month", "quarter", "year", "hour", "minute",
           "second", "millisecond"):
    register_function(ScalarFunction(
        f"__date_diff_{_u}", lambda a: BIGINT, _date_diff(_u)))



def _array_position_impl(stp, lnp, evp, litp):
    """First 1-based index of the value (0 = absent). Duplicate-safe and
    correct for arbitrary gathered offsets: the k-th global hit is read
    from the compacted hit-position list, where k = hits before the
    row's range (velox ArrayPosition analog)."""
    (st, _), (ln, lv), (ev, evalid), (v, _) = stp, lnp, evp, litp
    hit = ev == v.astype(ev.dtype)
    if evalid is not None:
        hit = jnp.logical_and(hit, evalid)
    E = ev.shape[0]
    c = _prefix(hit.astype(jnp.int32))               # (E+1,)
    hp = jnp.nonzero(hit, size=E, fill_value=E)[0].astype(jnp.int32)
    before = jnp.take(c, st.astype(jnp.int32), mode="clip")
    first = jnp.take(hp, before, mode="clip")        # first hit >= start
    inb = first < st + ln
    pos = jnp.where(inb, (first - st + 1).astype(jnp.int64), 0)
    valid = lv
    return pos, valid


register_function(ScalarFunction(
    "__array_position", lambda a: BIGINT, _array_position_impl,
    default_nulls=False))


def _data_size_resolve(types):
    """Fixed-width per-row serialized size; strings resolve earlier to
    octet_length + 4 (expr/compiler.py data_size_for_stats)."""
    return BIGINT


def _data_size_impl(v):
    import jax.numpy as jnp

    return jnp.full(v.shape, np.dtype(v.dtype).itemsize, jnp.int64)


register_function(ScalarFunction(
    "data_size_for_stats", _data_size_resolve, _data_size_impl))


# ---------------------------------------------- probability functions
# velox/functions/prestosql/Probability*.h (registration/
# ProbabilityTrigonometricFunctionsRegistration.cpp). Transcendental
# internals run in float32 — f64 transcendentals are software-emulated
# (and some hang the compiler) on the tunneled TPU backend
# (BASELINE.md round-1 notes); results widen back to f64. Documented
# precision deviation: ~1e-7 relative vs the reference's long doubles.

def _f32(x):
    return x.astype(jnp.float32)


def _prob2(fn):
    def impl(a, b):
        return fn(_f32(a), _f32(b)).astype(jnp.float64)
    return impl


def _prob3(fn):
    def impl(a, b, c):
        return fn(_f32(a), _f32(b), _f32(c)).astype(jnp.float64)
    return impl


def _register_prob(name, nargs, fn):
    impl = _prob2(fn) if nargs == 2 else _prob3(fn)
    register_function(ScalarFunction(
        name, lambda a: DOUBLE, impl))


import jax.scipy.special as _special

_register_prob("normal_cdf", 3,
               lambda m, sd, x: _special.ndtr((x - m) / sd))
_register_prob("inverse_normal_cdf", 3,
               lambda m, sd, p: m + sd * _special.ndtri(p))
_register_prob("beta_cdf", 3,
               lambda a, b, x: _special.betainc(a, b, x))
def _cauchy_cdf(m, s, x):
    # tail-stable form: 0.5 + atan((x-m)/s)/pi cancels catastrophically
    # for x << m; use atan(s/(m-x))/pi there (atan complement identity)
    d = x - m
    lo = jnp.arctan2(s, -d) / jnp.pi          # exact for d < 0
    hi = 1.0 - jnp.arctan2(s, d) / jnp.pi     # exact for d > 0
    return jnp.where(d < 0, lo, hi)


_register_prob("cauchy_cdf", 3, _cauchy_cdf)
_register_prob("chi_squared_cdf", 2,
               lambda k, x: _special.gammainc(k * 0.5, x * 0.5))
_register_prob("gamma_cdf", 3,
               lambda shape, scale, x: _special.gammainc(
                   shape, x / scale))
_register_prob("laplace_cdf", 3,
               lambda m, s, x: jnp.where(
                   x < m, 0.5 * jnp.exp((x - m) / s),
                   1.0 - 0.5 * jnp.exp(-(x - m) / s)))
_register_prob("poisson_cdf", 2,
               lambda lam, k: _special.gammaincc(
                   jnp.floor(k) + 1.0, lam))
_register_prob("weibull_cdf", 3,
               lambda a, b, x: -jnp.expm1(-jnp.power(
                   jnp.maximum(x, 0.0) / b, a)))
_register_prob("f_cdf", 3,
               lambda d1, d2, x: _special.betainc(
                   d1 * 0.5, d2 * 0.5,
                   d1 * x / (d1 * x + d2)))
_register_prob("binomial_cdf", 3,
               lambda n, p, k: jnp.where(
                   k >= n, 1.0,
                   jnp.where(k < 0, 0.0, _special.betainc(
                       jnp.maximum(n - jnp.floor(k), 1.0),
                       jnp.floor(k) + 1.0, 1.0 - p))))


def _wilson(lo: bool):
    def impl(s, n, z):
        s32, n32, z32 = _f32(s), _f32(n), _f32(z)
        p = s32 / n32
        z2 = z32 * z32
        denom = 1.0 + z2 / n32
        center = p + z2 / (2.0 * n32)
        spread = z32 * jnp.sqrt(
            p * (1.0 - p) / n32 + z2 / (4.0 * n32 * n32))
        v = (center - spread if lo else center + spread) / denom
        return v.astype(jnp.float64)
    return impl


register_function(ScalarFunction(
    "wilson_interval_lower", lambda a: DOUBLE, _wilson(True)))
register_function(ScalarFunction(
    "wilson_interval_upper", lambda a: DOUBLE, _wilson(False)))


def _width_bucket_impl(x, lo, hi, n):
    # velox/functions/prestosql/WidthBucketArray.h scalar form
    below = x < jnp.minimum(lo, hi)
    above = x >= jnp.maximum(lo, hi)
    asc = lo < hi
    frac = (x - lo) / (hi - lo)
    b = jnp.floor(frac * n.astype(frac.dtype)).astype(jnp.int64) + 1
    b = jnp.clip(b, 1, n)
    out = jnp.where(
        asc,
        jnp.where(below, 0, jnp.where(above, n + 1, b)),
        jnp.where(x > jnp.maximum(lo, hi), 0,
                  jnp.where(x <= jnp.minimum(lo, hi), n + 1, b)))
    return out.astype(jnp.int64)


register_function(ScalarFunction(
    "width_bucket", lambda a: BIGINT, _width_bucket_impl))

register_function(ScalarFunction(
    "ceiling", lambda a: a[0], lambda a: jnp.ceil(a)))
register_function(ScalarFunction(
    "pow", lambda a: DOUBLE, lambda a, b: jnp.power(a, b)))


# -------------------------------------------- session timezone support
# velox/core/QueryConfig.h:103 adjust_timestamp_to_session_timezone +
# velox/type/tz/. A zone becomes two captured device arrays
# (transition instants, utc offsets, utils/tz.py); adjustment is one
# searchsorted + gather. The compiler wraps TIMESTAMP args of part
# functions with __tz_adjust when the session zone is not UTC
# (expr/compiler.py resolve_types).

def _ts_days_impl(ts):
    return jnp.floor_divide(ts, _US_DAY).astype(jnp.int32)


register_function(ScalarFunction(
    "__ts_days", lambda a: DATE, _ts_days_impl))


def _tz_adjust_impl(ts, trans, offs):
    idx = jnp.searchsorted(trans, ts, side="right") - 1
    idx = jnp.clip(idx, 0, offs.shape[0] - 1)
    return ts + jnp.take(offs, idx, mode="clip")


register_function(ScalarFunction(
    "__tz_adjust", lambda a: TIMESTAMP, _tz_adjust_impl))


def _tz_unadjust_impl(ts, trans, offs):
    """Inverse adjustment (wall clock -> instant): the offset at the
    wall-clock value approximates the offset at the instant (exact
    except within an hour of a DST flip — velox's tz conversion has the
    same ambiguity window and also picks one side)."""
    idx = jnp.searchsorted(trans, ts, side="right") - 1
    idx = jnp.clip(idx, 0, offs.shape[0] - 1)
    return ts - jnp.take(offs, idx, mode="clip")


register_function(ScalarFunction(
    "__tz_unadjust", lambda a: TIMESTAMP, _tz_unadjust_impl))


def _tz_offset_part(div):
    def impl(ts, trans, offs):
        idx = jnp.clip(
            jnp.searchsorted(trans, ts, side="right") - 1,
            0, offs.shape[0] - 1)
        off_s = jnp.take(offs, idx, mode="clip") // 1_000_000
        sign = jnp.where(off_s < 0, -1, 1)
        mag = jnp.abs(off_s)
        # truncate toward zero: -05:30 -> hour -5, minute -30 (Presto)
        part = mag // 3600 if div == 3600 else (mag % 3600) // 60
        return (sign * part).astype(jnp.int64)
    return impl


register_function(ScalarFunction(
    "__timezone_hour", lambda a: BIGINT, _tz_offset_part(3600)))
register_function(ScalarFunction(
    "__timezone_minute", lambda a: BIGINT, _tz_offset_part(60)))


# ------------------------------------------- dynamic-filter internals
# velox/exec/HashProbe.cpp:419-444 value-set + bloom pushdown forms.

def _in_table_impl(v, table):
    """Membership of v in a sorted host-constant value table.

    searchsorted's log2(n) DEPENDENT gather rounds made a pushed-down
    117-value dynamic filter ~1s/batch at 8.4M rows on the tunneled
    v5e — ~2s of TPC-H Q18's steady wall. The table is a bind-time
    literal, so build a dense membership BITMASK over its span at
    trace time: the filter becomes one clip + one gather. Huge spans
    fall back to a fused compare chain (small sets) or searchsorted."""
    import numpy as _np

    try:
        tb = _np.asarray(table)
        lo, hi = int(tb[0]), int(tb[-1])
    except Exception:          # traced (non-constant) table
        tb = None
    if tb is not None:
        span = hi - lo + 1
        if span <= (1 << 26):
            mask = _np.zeros((span,), _np.bool_)
            mask[tb.astype(_np.int64) - lo] = True
            vv = v.astype(jnp.int64) - lo
            inb = jnp.logical_and(vv >= 0, vv < span)
            hit = jnp.take(jnp.asarray(mask),
                           jnp.clip(vv, 0, span - 1).astype(jnp.int32),
                           mode="clip")
            return jnp.logical_and(inb, hit)
        if tb.size <= 512:     # fused elementwise OR-chain
            m = v == int(tb[0])
            for c in tb[1:]:
                m = jnp.logical_or(m, v == int(c))
            return m
    idx = jnp.searchsorted(table, v.astype(table.dtype))
    inb = idx < table.shape[0]
    hit = jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1),
                   mode="clip") == v.astype(table.dtype)
    return jnp.logical_and(inb, hit)


register_function(ScalarFunction(
    "__in_table", lambda a: BOOLEAN, _in_table_impl))


def _bloom_contains_impl(v, words):
    from velox_tpu.ops.bloom import bloom_contains_device

    return bloom_contains_device(v, words)


register_function(ScalarFunction(
    "__bloom_contains", lambda a: BOOLEAN, _bloom_contains_impl))


# --------------------------------------- datetime / bitwise additions

def _yow_impl(days):
    """ISO week-numbering year (velox DateTimeFunctions.h yearOfWeek):
    the year that owns the date's ISO week."""
    days = days.astype(jnp.int32)
    y, _, _ = _civil_from_days(days)
    w0 = jnp.floor_divide(_doy(days) - _iso_dow(days) + 10, 7)
    yo = jnp.where(w0 == 0, y - 1,
                   jnp.where(w0 > _iso_weeks_in_year(y), y + 1, y))
    return yo.astype(jnp.int64)


register_function(ScalarFunction(
    "year_of_week", lambda a: BIGINT, _yow_impl))
register_function(ScalarFunction("yow", lambda a: BIGINT, _yow_impl))


def _logical_shr_impl(x, shift, bits):
    # velox bitwise_logical_shift_right(x, shift, bits): zero-fill
    # within a `bits`-wide window
    mask = jnp.where(bits >= 64, jnp.int64(-1),
                     (jnp.int64(1) << bits) - 1)
    ux = x.astype(jnp.uint64) & mask.astype(jnp.uint64)
    return (ux >> shift.astype(jnp.uint64)).astype(jnp.int64)


register_function(ScalarFunction(
    "bitwise_logical_shift_right", lambda a: BIGINT,
    _logical_shr_impl))


def _shl_bits_impl(x, shift, bits):
    # velox bitwise_shift_left(x, shift, bits)
    mask = jnp.where(bits >= 64, jnp.int64(-1),
                     (jnp.int64(1) << bits) - 1)
    return ((x << shift) & mask).astype(jnp.int64)


register_function(ScalarFunction(
    "bitwise_shift_left", lambda a: BIGINT, _shl_bits_impl))


def _from_unixtime_tz(a, *off):
    ts = (a.astype(jnp.float64) * 1e6).astype(jnp.int64)
    if off:  # from_unixtime(t, hours, minutes): fixed-offset shift
        h = off[0].astype(jnp.int64)
        m = off[1].astype(jnp.int64) if len(off) > 1 else 0
        ts = ts + (h * 3600 + jnp.sign(h) * m * 60) * 1_000_000
    return ts


register_function(ScalarFunction(
    "from_unixtime", lambda a: TIMESTAMP, _from_unixtime_tz))


def _cosine_similarity_unbound(*a):  # pragma: no cover
    raise RuntimeError("cosine_similarity requires MAP inputs")


# ------------------------------- inverse probability functions
# velox/functions/prestosql/Probability*.h inverse_*_cdf family
# (registration/ProbabilityTrigonometricFunctionsRegistration.cpp).
# Continuous inverses with no closed form run a fixed-iteration
# bracketing bisection on the forward CDF — compiler-friendly
# (lax.fori_loop, static trip counts, no data-dependent control flow):
# 48 doublings bracket the quantile, 64 bisections pin it to f32
# precision. Discrete inverses (binomial/poisson) bisect the integer
# lattice for the smallest k with cdf(k) >= p.

def _bisect_inv(cdf, p, lo, hi, iters=64):
    def body(_, st):
        lo_, hi_ = st
        mid = 0.5 * (lo_ + hi_)
        below = cdf(mid) < p
        return (jnp.where(below, mid, lo_), jnp.where(below, hi_, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def _grow_hi(cdf, p, hi0, iters=48):
    def body(_, hi):
        return jnp.where(cdf(hi) < p, hi * 2.0, hi)

    return jax.lax.fori_loop(0, iters, body, hi0)


def _t_cdf_f32(df, x):
    ib = _special.betainc(df * 0.5, jnp.float32(0.5),
                          df / (df + x * x))
    return jnp.where(x > 0, 1.0 - 0.5 * ib, 0.5 * ib)


_register_prob("t_cdf", 2, _t_cdf_f32)


def _inv_beta(a, b, p):
    return _bisect_inv(lambda x: _special.betainc(a, b, x), p,
                       jnp.zeros_like(p), jnp.ones_like(p))


def _inv_chi2(df, p):
    def cdf(x):
        return _special.gammainc(df * 0.5, x * 0.5)

    hi = _grow_hi(cdf, p, jnp.ones_like(p))
    return _bisect_inv(cdf, p, jnp.zeros_like(p), hi)


def _inv_f(d1, d2, p):
    def cdf(x):
        return _special.betainc(d1 * 0.5, d2 * 0.5,
                                d1 * x / (d1 * x + d2))

    hi = _grow_hi(cdf, p, jnp.ones_like(p))
    return _bisect_inv(cdf, p, jnp.zeros_like(p), hi)


def _inv_gamma(shape, scale, p):
    def cdf(x):
        return _special.gammainc(shape, x / scale)

    hi = _grow_hi(cdf, p, jnp.ones_like(p))
    return _bisect_inv(cdf, p, jnp.zeros_like(p), hi)


def _inv_t(df, p):
    def cdf(x):
        return _t_cdf_f32(df, x)

    def need_wider(hi):
        return jnp.logical_or(cdf(hi) < p, cdf(-hi) > p)

    def body(_, hi):
        return jnp.where(need_wider(hi), hi * 2.0, hi)

    hi = jax.lax.fori_loop(0, 48, body, jnp.ones_like(p))
    return _bisect_inv(cdf, p, -hi, hi)


_register_prob("inverse_beta_cdf", 3, _inv_beta)
_register_prob("inverse_chi_squared_cdf", 2, _inv_chi2)
_register_prob("inverse_f_cdf", 3, _inv_f)
_register_prob("inverse_gamma_cdf", 3, _inv_gamma)
_register_prob("inverse_t_cdf", 2, _inv_t)
_register_prob("inverse_cauchy_cdf", 3,
               lambda m, s, p: m + s * jnp.tan(
                   jnp.pi * (p - 0.5)))
_register_prob("inverse_laplace_cdf", 3,
               lambda m, s, p: m - s * jnp.sign(p - 0.5)
               * jnp.log1p(-2.0 * jnp.abs(p - 0.5)))
_register_prob("inverse_weibull_cdf", 3,
               lambda a, b, p: b * jnp.power(
                   -jnp.log1p(-p), 1.0 / a))


def _int_bisect(cdf, p, hi):
    """Smallest integer k in [0, hi] with cdf(k) >= p (f32 lattice)."""
    lo = jnp.full_like(hi, -1.0)

    def body(_, st):
        lo_, hi_ = st
        mid = jnp.floor(0.5 * (lo_ + hi_))
        # keep invariant cdf(lo) < p <= cdf(hi); mid==lo stalls -> +1
        mid = jnp.minimum(jnp.where(mid <= lo_, lo_ + 1.0, mid), hi_)
        below = cdf(mid) < p
        return (jnp.where(below, mid, lo_),
                jnp.where(below, hi_, mid))

    _, hi = jax.lax.fori_loop(0, 48, body, (lo, hi))
    return hi


def _inv_binomial(n, ps, p):
    def cdf(k):
        return jnp.where(
            k >= n, 1.0, jnp.where(k < 0, 0.0, _special.betainc(
                jnp.maximum(n - jnp.floor(k), 1.0),
                jnp.floor(k) + 1.0, 1.0 - ps)))

    return _int_bisect(cdf, p, n)


def _inv_poisson(lam, p):
    def cdf(k):
        return jnp.where(k < 0, 0.0,
                         _special.gammaincc(jnp.floor(k) + 1.0, lam))

    hi = _grow_hi(cdf, p, jnp.maximum(lam, 1.0), iters=40)
    return _int_bisect(cdf, p, hi)


register_function(ScalarFunction(
    "inverse_binomial_cdf", lambda a: BIGINT,
    lambda n, ps, p: _inv_binomial(
        _f32(n), _f32(ps), _f32(p)).astype(jnp.int64)))
register_function(ScalarFunction(
    "inverse_poisson_cdf", lambda a: BIGINT,
    lambda lam, p: _inv_poisson(
        _f32(lam), _f32(p)).astype(jnp.int64)))


# --------------------------------------- math breadth (round 3)
# velox/functions/prestosql/Arithmetic.h clamp/pmod;
# MathematicalOperatorsRegistration.cpp.

register_function(ScalarFunction(
    "clamp", lambda a: a[0],
    lambda v, lo, hi: jnp.clip(
        v, lo.astype(v.dtype), hi.astype(v.dtype))))
# Presto pmod keeps the divisor's sign — exactly Python/jnp.mod
register_function(ScalarFunction(
    "pmod", _arith_type, lambda a, b: jnp.mod(a, b)))


# ------------------------------------ device hash internals
# velox/functions/prestosql/IntegerFunctions.h xxhash64_internal /
# combine_hash_internal (checksum building blocks). True XXH64 of the
# 8-byte little-endian value, computed as pure uint64 lane arithmetic
# on device (x64 mode) — no host round-trip.

_XXP1 = np.uint64(0x9E3779B185EBCA87)
_XXP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXP3 = np.uint64(0x165667B19E3779F9)
_XXP4 = np.uint64(0x85EBCA77C2B2AE63)
_XXP5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x, r):
    return (x << np.uint64(r)) | (
        jax.lax.shift_right_logical(x, np.uint64(64 - r)))


def _xxhash64_u64(x):
    """XXH64(little-endian 8 bytes of x, seed=0) on uint64 lanes."""
    h = _XXP5 + np.uint64(8)
    k1 = x * _XXP2
    k1 = _rotl64(k1, 31) * _XXP1
    h = h ^ k1
    h = _rotl64(h, 27) * _XXP1 + _XXP4
    h = h ^ jax.lax.shift_right_logical(h, np.uint64(33))
    h = h * _XXP2
    h = h ^ jax.lax.shift_right_logical(h, np.uint64(29))
    h = h * _XXP3
    h = h ^ jax.lax.shift_right_logical(h, np.uint64(32))
    return h


def _xxhash64_internal_impl(x):
    if jnp.issubdtype(x.dtype, jnp.floating):
        # normalize -0.0 (velox double hashing canonicalizes)
        x = jnp.where(x == 0, jnp.zeros_like(x), x)
        bits = jax.lax.bitcast_convert_type(
            x.astype(jnp.float64), jnp.int64)
    else:
        bits = x.astype(jnp.int64)
    return _xxhash64_u64(
        bits.astype(jnp.uint64)).astype(jnp.int64)


register_function(ScalarFunction(
    "xxhash64_internal", lambda a: BIGINT, _xxhash64_internal_impl))
register_function(ScalarFunction(
    "combine_hash_internal", lambda a: BIGINT,
    lambda a, b: (a.astype(jnp.int64) * jnp.int64(31)
                  + b.astype(jnp.int64))))


# --------------------------------------------- random functions
# velox/functions/prestosql/Rand.h: rand()/random() -> DOUBLE in
# [0,1); rand(n)/random(n) -> uniform integer [0, n). Evaluated as a
# special form in expr/compiler.py _eval_node_inner (needs the row
# capacity); registered here for type resolution and so the fuzzer
# sees them. deterministic=False: CSE must not merge two calls.

def _rand_unbound(*a):  # pragma: no cover
    raise RuntimeError("rand is evaluated as a special form")


for _rn in ("rand", "random", "secure_rand", "secure_random"):
    register_function(ScalarFunction(
        _rn, lambda a: (a[0] if a else DOUBLE), _rand_unbound,
        deterministic=False))


# ------------------------------- array search functions (round 3)
# velox/functions/prestosql/FindFirst.cpp, ArrayMinMaxBy.
# First-hit positions come from a min range-reduce over the flat
# position lane (the segment-tree tables above) — no per-row loops.

def _first_hit_pos(st, ln, hit):
    ecap = hit.shape[0]
    p = jnp.arange(ecap, dtype=jnp.int32)
    cand = jnp.where(hit, p, jnp.int32(ecap))
    tables = _range_tables(cand, jnp.minimum, jnp.int32(ecap))
    return _range_reduce(tables, st, ln, jnp.minimum, jnp.int32(ecap))


def _find_first_impl(stp, lnp, predp, evp):
    (st, _), (ln, lv), (pv, pvalid), (ev, evalid) = (
        stp, lnp, predp, evp)
    hit = pv if pvalid is None else jnp.logical_and(pv, pvalid)
    fpos = _first_hit_pos(st, ln, hit)
    found = fpos < hit.shape[0]
    vals = jnp.take(ev, fpos, mode="clip")
    valid = found
    if evalid is not None:
        valid = jnp.logical_and(
            valid, jnp.take(evalid, fpos, mode="clip"))
    if lv is not None:
        valid = jnp.logical_and(valid, lv)
    return vals, valid


def _find_first_index_impl(stp, lnp, predp):
    (st, _), (ln, lv), (pv, pvalid) = stp, lnp, predp
    hit = pv if pvalid is None else jnp.logical_and(pv, pvalid)
    fpos = _first_hit_pos(st, ln, hit)
    found = fpos < hit.shape[0]
    vals = (fpos - st + 1).astype(jnp.int64)
    valid = found if lv is None else jnp.logical_and(found, lv)
    return vals, valid


register_function(ScalarFunction(
    "__array_find_first", lambda a: a[3], _find_first_impl,
    default_nulls=False))
register_function(ScalarFunction(
    "__array_find_first_index", lambda a: BIGINT,
    _find_first_index_impl, default_nulls=False))


def _make_extremal_by(is_min):
    def impl(stp, lnp, keyp, evp):
        (st, _), (ln, lv), (kv, kvalid), (ev, evalid) = (
            stp, lnp, keyp, evp)
        k = kv.astype(jnp.float64)
        ident = jnp.inf if is_min else -jnp.inf
        op = jnp.minimum if is_min else jnp.maximum
        kk = k if kvalid is None else jnp.where(kvalid, k, ident)
        tables = _range_tables(kk, op, jnp.float64(ident))
        rowext = _range_reduce(tables, st, ln, op, jnp.float64(ident))
        # first element whose key equals the row extremum
        ecap = kk.shape[0]
        from velox_tpu.exec.collect_agg import element_owners

        owner, within = element_owners(st, ln, ecap)
        eq_ext = jnp.logical_and(
            within, kk == jnp.take(rowext, owner, mode="clip"))
        if kvalid is not None:
            eq_ext = jnp.logical_and(eq_ext, kvalid)
        fpos = _first_hit_pos(st, ln, eq_ext)
        found = fpos < ecap
        vals = jnp.take(ev, fpos, mode="clip")
        valid = found
        if evalid is not None:
            valid = jnp.logical_and(
                valid, jnp.take(evalid, fpos, mode="clip"))
        if lv is not None:
            valid = jnp.logical_and(valid, lv)
        return vals, valid

    return impl


register_function(ScalarFunction(
    "__array_min_by", lambda a: a[3], _make_extremal_by(True),
    default_nulls=False))
register_function(ScalarFunction(
    "__array_max_by", lambda a: a[3], _make_extremal_by(False),
    default_nulls=False))


# --------------------------------------- round-5 math/bitwise breadth

register_function(ScalarFunction(
    "atan2", lambda a: DOUBLE, lambda a, b: jnp.arctan2(a, b)))
register_function(ScalarFunction(
    "bitwise_right_shift_arithmetic", lambda a: a[0],
    lambda a, b: jnp.right_shift(a, b)))


def _great_circle_distance(lat1, lon1, lat2, lon2):
    """great_circle_distance(lat1, lon1, lat2, lon2) -> km (haversine,
    Presto's earth radius 6371.01 — velox/functions/prestosql/
    GreatCircleDistance.h semantics without the geometry stack)."""
    r = 6371.01
    p1, p2 = jnp.radians(lat1), jnp.radians(lat2)
    dp = p2 - p1
    dl = jnp.radians(lon2 - lon1)
    h = (jnp.sin(dp / 2.0) ** 2
         + jnp.cos(p1) * jnp.cos(p2) * jnp.sin(dl / 2.0) ** 2)
    return 2.0 * r * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))


register_function(ScalarFunction(
    "great_circle_distance", lambda a: DOUBLE, _great_circle_distance))


def _distinct_from_impl(pa_, pb_):
    """IS DISTINCT FROM: null-safe inequality — NULLs compare EQUAL to
    each other and DISTINCT from every value; never returns NULL
    (velox/functions/prestosql/Comparisons.cpp distinct_from)."""
    (a, va), (b, vb) = pa_, pb_
    av = va if va is not None else _all_valid(a)
    bv = vb if vb is not None else _all_valid(b)
    neq = a != b
    vals = jnp.where(av & bv, neq, av != bv)
    return vals, None


register_function(ScalarFunction(
    "distinct_from", lambda a: BOOLEAN, _distinct_from_impl,
    default_nulls=False))
