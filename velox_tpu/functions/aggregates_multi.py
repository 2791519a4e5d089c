"""Multi-argument, bitwise, and sketch aggregates.

Second tranche of the prestosql aggregate package (VERDICT r1 item 5):
min_by/max_by (velox/functions/prestosql/aggregates/MinMaxByAggregates.cpp),
covariance/correlation/regression (CovarianceAggregates.cpp), bitwise
aggregates (BitwiseAggregates.cpp), approx_distinct
(HyperLogLogAggregate.h + common/hyperloglog/DenseHll.h), product, entropy
(EntropyAggregates.cpp).

TPU-first designs, same scatter-reduce ABI as functions/aggregates.py:

* min_by/max_by: two-phase scatter — scatter-min/max the comparison lane,
  then elect one witness row per group (scatter-min of row index among
  rows equal to the group optimum) and gather its payload. No packed
  (cmp, payload) word, so f64 comparison values never need a bitcast
  (the backend crashes on f64 bitcasts).
* bitwise_{and,or,xor}_agg: unpack values into a (rows, bits) 0/1 matrix
  and scatter-add per-bit counts — and = count == group_count,
  or = count > 0, xor = count odd. Bit counts ride the same int32
  scatter machinery as sums; no per-bit scatter loops.
* approx_distinct: fixed-size HyperLogLog — m=1024 registers (standard
  error ~3.25%, within Presto's default 2.3% ballpark) stored as one
  (groups * m) int32 lane, built with a single scatter-max of rank(hash).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, BOOLEAN, DOUBLE
from velox_tpu.functions.aggregates import (
    AccLane, AggregateFunction, _masked, _minmax_identity_for,
    register_aggregate,
)


# ------------------------------------------------------------ min_by/max_by

def _cmp_lane_dtype(t) -> np.dtype:
    """Comparison-lane dtype for a (value, comparison) type pair."""
    assert isinstance(t, tuple) and len(t) == 2, \
        "min_by/max_by take (value, comparison)"
    return t[1].dtype


def _val_lane_dtype(t) -> np.dtype:
    return t[0].dtype


def _make_minmax_by(name: str, is_min: bool):
    def _elect(accs, gids, c, m, vv, vvd):
        """Scatter the comparison optimum, then elect one witness row per
        group and gather its payload (two-phase argmin — no packed
        (cmp, payload) word, so f64 comparisons need no bitcast)."""
        best, pay, pvalid, cnt = accs
        best2 = (best.at[gids].min(c, mode="drop") if is_min
                 else best.at[gids].max(c, mode="drop"))
        cap = gids.shape[0]
        ng = best2.shape[0]
        gbest = jnp.take(best2, jnp.minimum(gids, ng - 1), mode="clip")
        is_best = jnp.logical_and(m, c == gbest)
        rows = jnp.arange(cap, dtype=jnp.int32)
        winner = (jnp.full((ng,), cap, jnp.int32)
                  .at[jnp.where(is_best, gids, ng)]
                  .min(rows, mode="drop"))
        won = winner < cap
        wsafe = jnp.minimum(winner, cap - 1)
        new_pay = jnp.where(
            won, jnp.take(vv.astype(pay.dtype), wsafe, mode="clip"), pay)
        wvalid = (jnp.take(vvd, wsafe, mode="clip")
                  if vvd is not None else jnp.ones((ng,), jnp.bool_))
        new_pvalid = jnp.where(won, wvalid, pvalid)
        cnt2 = cnt.at[gids].add(m.astype(cnt.dtype), mode="drop")
        return (best2, new_pay, new_pvalid, cnt2)

    def accumulate(accs, gids, values, mask):
        (vv, vvd), (cv, cvd) = values
        m = mask
        if cvd is not None:  # null comparison values are ignored
            m = jnp.logical_and(m, cvd)
        ident = _minmax_identity_for(accs[0].dtype, is_min)
        c = _masked(cv.astype(accs[0].dtype), m, ident)
        return _elect(accs, gids, c, m, vv, vvd)

    def combine(accs, gids, lanes, mask):
        pbest, ppay, ppvalid, pcnt = lanes
        m = jnp.logical_and(mask, pcnt > 0)
        ident = _minmax_identity_for(accs[0].dtype, is_min)
        c = _masked(pbest, m, ident)
        return _elect(accs, gids, c, m, ppay, ppvalid)

    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: t[0],
        lanes=(
            AccLane("best", _cmp_lane_dtype,
                    lambda t: _minmax_identity_for(
                        np.dtype(_cmp_lane_dtype(t)), is_min)),
            AccLane("payload", _val_lane_dtype, lambda t: 0),
            AccLane("pvalid", lambda t: np.dtype(np.bool_),
                    lambda t: False),
            AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0),
        ),
        accumulate=accumulate,
        combine=combine,
        extract=lambda accs, gm: (
            accs[1], jnp.logical_and(
                jnp.logical_and(gm, accs[3] > 0), accs[2])),
        lane_types=lambda t: (t[1], t[0], BOOLEAN, BIGINT),
        final_type=lambda lanes: lanes[1],
        input_type_from_lanes=lambda lts: (lts[1], lts[0]),
    ))


_make_minmax_by("min_by", True)
_make_minmax_by("max_by", False)


# ------------------------------------------- covariance / correlation

def _covar_lanes():
    return (
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
        AccLane("sx", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("sy", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("sxx", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("syy", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("sxy", lambda t: np.dtype(np.float64), lambda t: 0.0),
    )


def _covar_acc(accs, gids, values, mask):
    n, sx, sy, sxx, syy, sxy = accs
    # presto arg order: covar(y, x) / corr(y, x) — both args non-null
    (yv, yvd), (xv, xvd) = values
    m = mask
    if yvd is not None:
        m = jnp.logical_and(m, yvd)
    if xvd is not None:
        m = jnp.logical_and(m, xvd)
    x = _masked(xv.astype(jnp.float64), m, 0.0)
    y = _masked(yv.astype(jnp.float64), m, 0.0)
    n = n.at[gids].add(m.astype(n.dtype), mode="drop")
    sx = sx.at[gids].add(x, mode="drop")
    sy = sy.at[gids].add(y, mode="drop")
    sxx = sxx.at[gids].add(x * x, mode="drop")
    syy = syy.at[gids].add(y * y, mode="drop")
    sxy = sxy.at[gids].add(x * y, mode="drop")
    return (n, sx, sy, sxx, syy, sxy)


def _covar_combine(accs, gids, lanes, mask):
    out = []
    for a, p in zip(accs, lanes):
        z = 0 if a.dtype == jnp.int64 else 0.0
        out.append(a.at[gids].add(_masked(p, mask, z), mode="drop"))
    return tuple(out)


def _covar_stats(accs):
    n, sx, sy, sxx, syy, sxy = accs
    nf = jnp.maximum(n.astype(jnp.float64), 1.0)
    cxy = sxy - sx * sy / nf
    cxx = jnp.maximum(sxx - sx * sx / nf, 0.0)
    cyy = jnp.maximum(syy - sy * sy / nf, 0.0)
    return n, nf, cxy, cxx, cyy, sx, sy


def _make_covar(name: str, extract):
    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: DOUBLE,
        lanes=_covar_lanes(),
        accumulate=_covar_acc,
        combine=_covar_combine,
        extract=extract,
        lane_types=lambda t: (
            BIGINT, DOUBLE, DOUBLE, DOUBLE, DOUBLE, DOUBLE),
        final_type=lambda lanes: DOUBLE,
    ))


def _covar_samp_extract(accs, gm):
    n, nf, cxy, _, _, _, _ = _covar_stats(accs)
    return (cxy / jnp.maximum(nf - 1.0, 1.0),
            jnp.logical_and(gm, n >= 2))


def _covar_pop_extract(accs, gm):
    n, nf, cxy, _, _, _, _ = _covar_stats(accs)
    return cxy / nf, jnp.logical_and(gm, n >= 1)


def _corr_extract(accs, gm):
    n, nf, cxy, cxx, cyy, _, _ = _covar_stats(accs)
    denom = jnp.sqrt(cxx * cyy)
    ok = jnp.logical_and(n >= 2, denom > 0)
    return (jnp.where(ok, cxy / jnp.maximum(denom, 1e-300), jnp.nan),
            jnp.logical_and(gm, ok))


def _regr_slope_extract(accs, gm):
    n, nf, cxy, cxx, _, _, _ = _covar_stats(accs)
    ok = jnp.logical_and(n >= 2, cxx > 0)
    return (jnp.where(ok, cxy / jnp.maximum(cxx, 1e-300), jnp.nan),
            jnp.logical_and(gm, ok))


def _regr_intercept_extract(accs, gm):
    n, nf, cxy, cxx, _, sx, sy = _covar_stats(accs)
    ok = jnp.logical_and(n >= 2, cxx > 0)
    slope = cxy / jnp.maximum(cxx, 1e-300)
    return (jnp.where(ok, (sy - slope * sx) / nf, jnp.nan),
            jnp.logical_and(gm, ok))


_make_covar("covar_samp", _covar_samp_extract)
_make_covar("covar_pop", _covar_pop_extract)
_make_covar("corr", _corr_extract)
_make_covar("regr_slope", _regr_slope_extract)
_make_covar("regr_intercept", _regr_intercept_extract)


# ----------------------------------------------------- bitwise aggregates

_BITS = 64


def _bit_counts(accs, gids, v64, m):
    """Scatter-add per-bit set counts: one (rows, 64) 0/1 matrix."""
    cnts, n = accs
    bits = jnp.arange(_BITS, dtype=jnp.int64)
    mat = ((v64[:, None] >> bits[None, :]) & 1).astype(jnp.int32)
    mat = jnp.where(m[:, None], mat, 0)
    cnts = cnts.at[gids].add(mat, mode="drop")
    n = n.at[gids].add(m.astype(n.dtype), mode="drop")
    return cnts, n


def _make_bitwise(name: str, kind: str):
    def accumulate(accs, gids, values, mask):
        return _bit_counts(accs, gids, values.astype(jnp.int64), mask)

    def combine(accs, gids, lanes, mask):
        cnts, n = accs
        pcnts, pn = lanes
        cnts = cnts.at[gids].add(
            jnp.where(mask[:, None], pcnts, 0), mode="drop")
        n = n.at[gids].add(_masked(pn, mask, 0), mode="drop")
        return cnts, n

    def extract(accs, gm):
        cnts, n = accs
        if kind == "and":
            bit = (cnts == n[:, None]).astype(jnp.int64)
        elif kind == "or":
            bit = (cnts > 0).astype(jnp.int64)
        else:  # xor
            bit = (cnts & 1).astype(jnp.int64)
        bits = jnp.arange(_BITS, dtype=jnp.int64)
        out = jnp.sum(bit << bits[None, :], axis=1)
        return out, jnp.logical_and(gm, n > 0)

    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: BIGINT,
        lanes=(
            AccLane("bitcnt", lambda t: np.dtype(np.int32), lambda t: 0,
                    width=_BITS),
            AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
        ),
        accumulate=accumulate,
        combine=combine,
        extract=extract,
        lane_types=lambda t: (BIGINT, BIGINT),
        final_type=lambda lanes: BIGINT,
    ))


for _n, _k in (("bitwise_and_agg", "and"), ("bitwise_or_agg", "or"),
               ("bitwise_xor_agg", "xor")):
    _make_bitwise(_n, _k)


# -------------------------------------------------------- approx_distinct

_HLL_M = 1024          # registers; standard error 1.04/sqrt(m) ~= 3.25%
_HLL_LOG2M = 10


def _hll_acc(accs, gids, values, mask):
    (regs, n) = accs
    from velox_tpu.ops.hash import hash_i64

    if jnp.issubdtype(values.dtype, jnp.floating):
        v = (values * (1 << 20)).astype(jnp.int64)
    else:
        v = values.astype(jnp.int64)
    h = hash_i64(v).astype(jnp.int64)
    bucket = (h & (_HLL_M - 1)).astype(jnp.int32)
    rest = (h >> _HLL_LOG2M) & ((1 << 53) - 1)
    # rank = 54 - floor(log2(rest)); floor(log2) read off the f32
    # exponent bits (f32 bitcasts are fine on this backend; f64
    # log2/bitcast are not — see ops/sortkey.py). The f32 round-to-
    # nearest can bump values just below a power of two up one
    # exponent (~2^-24 of inputs, one-rank error) — sketch-grade.
    restf = jnp.maximum(rest, 1).astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(restf, jnp.int32) >> 23) & 0xFF
    rank = jnp.clip(jnp.int32(54) - (e - 127), 1, 54)
    ng = regs.shape[0]
    slot = jnp.where(mask, gids.astype(jnp.int32), ng)
    regs = regs.at[slot, bucket].max(rank, mode="drop")
    n = n.at[gids].add(mask.astype(n.dtype), mode="drop")
    return (regs, n)


def _hll_combine(accs, gids, lanes, mask):
    regs, n = accs
    pregs, pn = lanes
    ng = regs.shape[0]
    slot = jnp.where(mask, gids.astype(jnp.int32), ng)
    regs = regs.at[slot].max(pregs, mode="drop")
    n = n.at[gids].add(_masked(pn, mask, 0), mode="drop")
    return regs, n


#: host-built tables — no f64 transcendentals ever reach the compiler
_POW2_NEG = np.ldexp(1.0, -np.arange(64)).astype(np.float64)
_LC_TABLE = np.concatenate([  # m * ln(m / z) for z = 0..m (z=0 unused)
    [0.0], _HLL_M * np.log(_HLL_M / np.arange(1, _HLL_M + 1.0))])


def _hll_extract(accs, gm):
    regs, n = accs
    m = float(_HLL_M)
    inv = jnp.take(jnp.asarray(_POW2_NEG),
                   jnp.clip(regs, 0, 63), mode="clip")
    est = (0.7213 / (1 + 1.079 / m)) * m * m / jnp.sum(inv, axis=1)
    zeros = jnp.sum((regs == 0).astype(jnp.int32), axis=1)
    # linear counting for the small range (table-driven ln)
    lc = jnp.take(jnp.asarray(_LC_TABLE), zeros, mode="clip")
    est = jnp.where(
        jnp.logical_and(est <= 2.5 * m, zeros > 0), lc, est)
    out = jnp.round(est).astype(jnp.int64)
    return jnp.minimum(out, jnp.maximum(n, 0)), gm


register_aggregate(AggregateFunction(
    name="approx_distinct",
    resolve_type=lambda t: BIGINT,
    lanes=(
        AccLane("regs", lambda t: np.dtype(np.int32), lambda t: 0,
                width=_HLL_M),
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
    ),
    accumulate=_hll_acc,
    combine=_hll_combine,
    extract=_hll_extract,
    lane_types=lambda t: (BIGINT, BIGINT),
    final_type=lambda lanes: BIGINT,
))

# ------------------------------------------------------------ product etc.

register_aggregate(AggregateFunction(
    name="product",
    resolve_type=lambda t: DOUBLE,
    lanes=(
        AccLane("p", lambda t: np.dtype(np.float64), lambda t: 1.0),
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
    ),
    accumulate=lambda accs, gids, values, mask: (
        accs[0].at[gids].multiply(
            _masked(values.astype(jnp.float64), mask, 1.0), mode="drop"),
        accs[1].at[gids].add(mask.astype(accs[1].dtype), mode="drop"),
    ),
    combine=lambda accs, gids, lanes, mask: (
        accs[0].at[gids].multiply(
            _masked(lanes[0], mask, 1.0), mode="drop"),
        accs[1].at[gids].add(_masked(lanes[1], mask, 0), mode="drop"),
    ),
    extract=lambda accs, gm: (
        accs[0], jnp.logical_and(gm, accs[1] > 0)),
    lane_types=lambda t: (DOUBLE, BIGINT),
    final_type=lambda lanes: DOUBLE,
))


def _entropy_acc(accs, gids, values, mask):
    # entropy(c): c are per-row counts; H = log2(S) - sum(c*log2(c))/S
    n, s, slog = accs
    c = _masked(values.astype(jnp.float64), mask, 0.0)
    pos = c > 0
    n = n.at[gids].add(mask.astype(n.dtype), mode="drop")
    s = s.at[gids].add(c, mode="drop")
    # f32 log2 (f64 transcendentals hang the axon compiler; counts are
    # exactly representable in f32 far beyond realistic magnitudes)
    lg = jnp.log2(jnp.maximum(c, 1e-30).astype(jnp.float32)).astype(
        jnp.float64)
    slog = slog.at[gids].add(jnp.where(pos, c * lg, 0.0), mode="drop")
    return (n, s, slog)


register_aggregate(AggregateFunction(
    name="entropy",
    resolve_type=lambda t: DOUBLE,
    lanes=(
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
        AccLane("s", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("slog", lambda t: np.dtype(np.float64), lambda t: 0.0),
    ),
    accumulate=_entropy_acc,
    combine=lambda accs, gids, lanes, mask: (
        accs[0].at[gids].add(_masked(lanes[0], mask, 0), mode="drop"),
        accs[1].at[gids].add(_masked(lanes[1], mask, 0.0), mode="drop"),
        accs[2].at[gids].add(_masked(lanes[2], mask, 0.0), mode="drop"),
    ),
    extract=lambda accs, gm: (
        jnp.where(accs[1] > 0,
                  jnp.log2(jnp.maximum(accs[1], 1e-30).astype(
                      jnp.float32)).astype(jnp.float64)
                  - accs[2] / jnp.maximum(accs[1], 1e-300), 0.0),
        jnp.logical_and(gm, accs[0] > 0)),
    lane_types=lambda t: (BIGINT, DOUBLE, DOUBLE),
    final_type=lambda lanes: DOUBLE,
))
