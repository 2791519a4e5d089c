"""Aggregate functions as masked segment reductions.

Analog of velox/exec/Aggregate.h:47 (addRawInput :179,
addIntermediateResults :227, extractValues) re-designed TPU-first: an
accumulator is a struct-of-arrays — one device array of shape (num_groups,)
per accumulator lane — and accumulation is a single scatter-reduce
(``array.at[group_ids].add/min/max``) over the whole batch, which XLA lowers
to an efficient sorted-segment reduction on TPU. There is no per-row
accumulator object and no RowContainer.

Each function also serves as its own "companion" (velox/exec/
AggregateCompanionAdapter.h:24): partial aggregation produces the raw
accumulator lanes as columns; final aggregation consumes them via
``combine``. So partial/final planning needs no extra registration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, BOOLEAN, DOUBLE, DataType, REAL
from velox_tpu.types.types import DecimalType, TypeKind


@dataclass(frozen=True)
class AccLane:
    """One accumulator lane: a named device array with an identity value.

    ``width > 1`` makes the lane a (groups, width) matrix (HLL registers,
    per-bit counters). Matrix lanes cannot be emitted as partial-step
    columns, so wide-lane aggregates are SINGLE/FINAL-in-memory only.
    """

    name: str
    dtype_of: Callable[[Optional[DataType]], np.dtype]
    init_of: Callable[[Optional[DataType]], object]
    width: int = 1
    #: associative reduction this lane is ("add" | "min" | "max"): enables
    #: the clustered segment-scan path (no scatters) when every lane of
    #: the function declares one AND lane_contribs is provided
    scan_op: Optional[str] = None


@dataclass(frozen=True)
class AggregateFunction:
    name: str
    #: input type (or None for count(*)) -> result type
    resolve_type: Callable[[Optional[DataType]], DataType]
    #: accumulator lanes
    lanes: Tuple[AccLane, ...]
    #: accumulate(accs, gids, values, mask) -> new accs
    #: values is None for count(*); mask already includes input validity
    accumulate: Callable
    #: combine(accs, gids, partial_lane_arrays, mask) -> new accs
    combine: Callable
    #: extract(accs, group_mask) -> (values, valid) of result type
    extract: Callable
    #: intermediate (partial) output types, parallel to lanes
    lane_types: Callable[[Optional[DataType]], Tuple[DataType, ...]]
    #: result type from lane types (standalone FINAL planning where the raw
    #: input type is unavailable); default: first lane's type
    final_type: Optional[Callable[[Tuple[DataType, ...]], DataType]] = None
    #: reconstruct the raw input type (possibly a tuple for multi-arg
    #: aggregates) from lane types, for FINAL-step accumulator sizing;
    #: default: first lane's type stands in
    input_type_from_lanes: Optional[Callable] = None
    #: collect-style aggregate kind ("array" | "map" | "map_union" |
    #: "percentile"): needs every input row at finish, so the operator
    #: buffers raw input and runs one global grouping (SINGLE step only).
    #: The lanes/accumulate/combine fields are unused for these.
    collect_kind: Optional[str] = None
    #: per-row lane contributions for the clustered segment-scan path:
    #: (values, mask, arg_type) -> tuple of per-row arrays (one per lane,
    #: in lane dtype; masked rows must carry the lane identity). With
    #: every lane's scan_op set, StreamingAggregation accumulates via
    #: segmented scans + one boundary gather instead of scatters — the
    #: TPU answer to 64-bit scatter pathologies (int64 scatter-add is
    #: ~7x an int32 one on the axon backend; scans are ~35ms at 8M rows).
    lane_contribs: Optional[Callable] = None

    @property
    def scannable(self) -> bool:
        return (self.lane_contribs is not None
                and all(l.scan_op is not None for l in self.lanes))

    def resolve_final_type(self, lane_types: Tuple[DataType, ...]) -> DataType:
        if self.final_type is not None:
            return self.final_type(lane_types)
        return lane_types[0]

    def resolve_input_type(self, lane_types: Tuple[DataType, ...]):
        if self.input_type_from_lanes is not None:
            return self.input_type_from_lanes(lane_types)
        return lane_types[0]


aggregate_registry: Dict[str, AggregateFunction] = {}


def register_aggregate(fn: AggregateFunction) -> None:
    aggregate_registry[fn.name] = fn


def lookup_aggregate(name: str) -> AggregateFunction:
    try:
        return aggregate_registry[name]
    except KeyError:
        raise KeyError(
            f"no aggregate {name!r}; registered: {sorted(aggregate_registry)}"
        )


# ------------------------------------------------------------------ helpers

def _masked(values, mask, identity):
    return jnp.where(mask, values, jnp.asarray(identity, dtype=values.dtype))


_CHUNK_BITS = 16  # rows per overflow-safe chunk in narrow accumulation


def _narrow_sum_applicable(acc, values) -> bool:
    """Use the 32-bit digit-split path? (TPU narrow mode; int64 scatters
    compile pathologically on some TPU backends — accumulate int32 digit
    lanes chunked so nothing overflows, then combine small i64.)"""
    from velox_tpu.utils.config import config

    if values is None:
        return False
    if not config.narrow_lanes or acc.dtype != jnp.int64:
        return False
    if not jnp.issubdtype(values.dtype, jnp.integer):
        return False
    if jnp.dtype(values.dtype).itemsize > 4:
        return False
    n_groups = acc.shape[0]
    chunks = (values.shape[0] + (1 << _CHUNK_BITS) - 1) >> _CHUNK_BITS
    return n_groups * chunks <= (1 << 22)


def _narrow_segment_sum(gids, contrib_i32, n_groups: int) -> jnp.ndarray:
    """Exact int64 per-group sums of int32 contributions without any
    64-bit scatter/reduce over the data: 3x14-bit digit lanes scattered
    into (groups x chunks) int32 cells (each cell sums <= 2^16 rows of
    <= 2^14 => < 2^30, no overflow), then a tiny i64 combine."""
    n = contrib_i32.shape[0]
    chunks = (n + (1 << _CHUNK_BITS) - 1) >> _CHUNK_BITS

    if n_groups == 1:
        # keyless: pure chunked reductions, no scatters at all
        masked = jnp.where(gids < 1, contrib_i32.astype(jnp.int32), 0)
        pad = chunks * (1 << _CHUNK_BITS) - n
        if pad:
            masked = jnp.concatenate(
                [masked, jnp.zeros((pad,), jnp.int32)])
        pos = jnp.where(masked >= 0, masked, 0)
        neg = jnp.where(masked < 0, -masked, 0)

        def digit_total(v):
            out = jnp.zeros((), jnp.int64)
            for shift in (0, 14, 28):
                d = (v >> shift) & 0x3FFF if shift < 28 else (v >> 28)
                per_chunk = jnp.sum(
                    d.reshape(chunks, 1 << _CHUNK_BITS), axis=1)
                out = out + (jnp.sum(per_chunk.astype(jnp.int64)) << shift)
            return out

        return (digit_total(pos) - digit_total(neg))[None]

    from velox_tpu.ops.pallas_agg import grouped_sum_i32, pallas_available

    if 2 <= n_groups <= 128 and pallas_available():
        # MXU one-hot matmul kernel: no scatters at all (interpret mode
        # on CPU is far slower than the chunked scatter below — only
        # compile it on a real TPU)
        return grouped_sum_i32(
            gids.astype(jnp.int32), contrib_i32.astype(jnp.int32),
            n_groups, interpret=False)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    cell = gids.astype(jnp.int32) * chunks + (rows >> _CHUNK_BITS)
    # out-of-range gids (sentinel) stay out of range after scaling
    cell = jnp.where(gids < n_groups, cell, n_groups * chunks)

    def digit_sums(v):
        out64 = jnp.zeros((n_groups,), jnp.int64)
        for shift in (0, 14, 28):
            digit = (v >> shift) & 0x3FFF if shift < 28 else (v >> 28)
            part = (
                jnp.zeros((n_groups * chunks,), jnp.int32)
                .at[cell].add(digit, mode="drop")
                .reshape(n_groups, chunks))
            out64 = out64 + (
                jnp.sum(part.astype(jnp.int64), axis=1) << shift)
        return out64

    v = contrib_i32.astype(jnp.int32)
    pos = jnp.where(v >= 0, v, 0)
    neg = jnp.where(v < 0, -v, 0)
    return digit_sums(pos) - digit_sums(neg)


def _narrow_segment_count(gids, mask, n_groups: int) -> jnp.ndarray:
    """Exact int64 per-group counts via chunked int32 scatter."""
    n = mask.shape[0]
    chunks = (n + (1 << _CHUNK_BITS) - 1) >> _CHUNK_BITS
    if n_groups == 1:
        m = jnp.logical_and(gids < 1, mask).astype(jnp.int32)
        pad = chunks * (1 << _CHUNK_BITS) - n
        if pad:
            m = jnp.concatenate([m, jnp.zeros((pad,), jnp.int32)])
        per_chunk = jnp.sum(m.reshape(chunks, 1 << _CHUNK_BITS), axis=1)
        return jnp.sum(per_chunk.astype(jnp.int64))[None]
    from velox_tpu.ops.pallas_agg import grouped_sum_i32, pallas_available

    if 2 <= n_groups <= 128 and pallas_available():
        return grouped_sum_i32(
            gids.astype(jnp.int32), mask.astype(jnp.int32), n_groups,
            interpret=False)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    cell = gids.astype(jnp.int32) * chunks + (rows >> _CHUNK_BITS)
    cell = jnp.where(gids < n_groups, cell, n_groups * chunks)
    part = (
        jnp.zeros((n_groups * chunks,), jnp.int32)
        .at[cell].add(mask.astype(jnp.int32), mode="drop")
        .reshape(n_groups, chunks))
    return jnp.sum(part.astype(jnp.int64), axis=1)


def _sum_result_type(t: Optional[DataType]) -> DataType:
    assert t is not None
    if isinstance(t, DecimalType):
        # Presto: sum(decimal(p,s)) -> decimal(38,s); we keep int64 lane
        return DecimalType(TypeKind.DECIMAL, 18, t.scale)
    if t.is_integer:
        return BIGINT
    if t.kind == TypeKind.REAL:
        return REAL
    return DOUBLE


def _sum_lane_dtype(t: Optional[DataType]) -> np.dtype:
    return _sum_result_type(t).dtype


# ---------------------------------------------------------------------- sum

def _sum_acc(accs, gids, values, mask):
    (s, cnt) = accs
    if _narrow_sum_applicable(s, values):
        vm = jnp.where(mask, values, jnp.zeros((), values.dtype))
        s = s + _narrow_segment_sum(gids, vm, s.shape[0])
        cnt = cnt + _narrow_segment_count(gids, mask, cnt.shape[0])
        return (s, cnt)
    v = _masked(values.astype(s.dtype), mask, 0)
    s = s.at[gids].add(v, mode="drop")
    cnt = cnt.at[gids].add(mask.astype(cnt.dtype), mode="drop")
    return (s, cnt)


def _sum_combine(accs, gids, lanes, mask):
    (s, cnt) = accs
    ps, pcnt = lanes
    s = s.at[gids].add(_masked(ps, mask, 0), mode="drop")
    cnt = cnt.at[gids].add(_masked(pcnt, mask, 0), mode="drop")
    return (s, cnt)


def _sum_extract(accs, group_mask):
    (s, cnt) = accs
    return s, jnp.logical_and(group_mask, cnt > 0)


register_aggregate(AggregateFunction(
    name="sum",
    resolve_type=_sum_result_type,
    lanes=(
        AccLane("sum", _sum_lane_dtype, lambda t: 0, scan_op="add"),
        AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0,
                scan_op="add"),
    ),
    accumulate=_sum_acc,
    combine=_sum_combine,
    extract=_sum_extract,
    lane_types=lambda t: (_sum_result_type(t), BIGINT),
    lane_contribs=lambda values, mask, at: (
        _masked(values.astype(_sum_lane_dtype(at)), mask, 0),
        mask.astype(jnp.int64)),
))


# -------------------------------------------------------------------- count

def _count_acc(accs, gids, values, mask):
    (cnt,) = accs
    from velox_tpu.utils.config import config

    if config.narrow_lanes and cnt.shape[0] * (
            (mask.shape[0] + (1 << _CHUNK_BITS) - 1)
            >> _CHUNK_BITS) <= (1 << 22):
        return (cnt + _narrow_segment_count(gids, mask, cnt.shape[0]),)
    return (cnt.at[gids].add(mask.astype(cnt.dtype), mode="drop"),)


def _count_combine(accs, gids, lanes, mask):
    (cnt,) = accs
    (pcnt,) = lanes
    return (cnt.at[gids].add(_masked(pcnt, mask, 0), mode="drop"),)


register_aggregate(AggregateFunction(
    name="count",
    resolve_type=lambda t: BIGINT,
    lanes=(AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0,
                   scan_op="add"),),
    accumulate=_count_acc,
    combine=_count_combine,
    extract=lambda accs, gm: (accs[0], gm),
    lane_types=lambda t: (BIGINT,),
    lane_contribs=lambda values, mask, at: (mask.astype(jnp.int64),),
))

register_aggregate(AggregateFunction(
    name="count_if",
    resolve_type=lambda t: BIGINT,
    lanes=(AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0,
                   scan_op="add"),),
    accumulate=lambda accs, gids, values, mask: (
        accs[0].at[gids].add(
            jnp.logical_and(mask, values).astype(accs[0].dtype),
            mode="drop"),),
    combine=_count_combine,
    extract=lambda accs, gm: (accs[0], gm),
    lane_types=lambda t: (BIGINT,),
    lane_contribs=lambda values, mask, at: (
        jnp.logical_and(mask, values).astype(jnp.int64),),
))


# ------------------------------------------------------------------ min/max

def _minmax_identity(t: DataType, is_min: bool):
    dt = t.dtype
    if np.issubdtype(dt, np.floating):
        return np.inf if is_min else -np.inf
    if dt == np.dtype(np.bool_):
        return True if is_min else False
    info = np.iinfo(dt)
    return info.max if is_min else info.min


def _make_minmax(name: str, is_min: bool):
    def acc_fn(accs, gids, values, mask):
        (m, cnt) = accs
        ident = _minmax_identity_for(m.dtype, is_min)
        v = _masked(values.astype(m.dtype), mask, ident)
        m = (m.at[gids].min(v, mode="drop") if is_min
             else m.at[gids].max(v, mode="drop"))
        cnt = cnt.at[gids].add(mask.astype(cnt.dtype), mode="drop")
        return (m, cnt)

    def combine_fn(accs, gids, lanes, mask):
        (m, cnt) = accs
        pm, pcnt = lanes
        ident = _minmax_identity_for(m.dtype, is_min)
        v = _masked(pm, mask, ident)
        m = (m.at[gids].min(v, mode="drop") if is_min
             else m.at[gids].max(v, mode="drop"))
        cnt = cnt.at[gids].add(_masked(pcnt, mask, 0), mode="drop")
        return (m, cnt)

    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: t,
        lanes=(
            AccLane(name, lambda t: t.dtype,
                    lambda t: _minmax_identity(t, is_min),
                    scan_op="min" if is_min else "max"),
            AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0,
                    scan_op="add"),
        ),
        accumulate=acc_fn,
        combine=combine_fn,
        extract=lambda accs, gm: (
            accs[0], jnp.logical_and(gm, accs[1] > 0)),
        lane_types=lambda t: (t, BIGINT),
        lane_contribs=lambda values, mask, at: (
            _masked(values.astype(np.dtype(at.dtype)), mask,
                    _minmax_identity_for(jnp.dtype(at.dtype), is_min)),
            mask.astype(jnp.int64)),
    ))


def _minmax_identity_for(dt, is_min: bool):
    if jnp.issubdtype(dt, jnp.floating):
        return jnp.inf if is_min else -jnp.inf
    if dt == jnp.bool_:
        return True if is_min else False
    info = jnp.iinfo(dt)
    return info.max if is_min else info.min


_make_minmax("min", True)
_make_minmax("max", False)


# ---------------------------------------------------------------------- avg

def _avg_result_type(t):
    if isinstance(t, DecimalType):
        return t
    if t.kind == TypeKind.REAL:
        return REAL
    return DOUBLE


def _avg_extract(accs, gm):
    (s, cnt) = accs
    safe = jnp.maximum(cnt, 1)
    if jnp.issubdtype(s.dtype, jnp.integer):
        # decimal avg: integer division with round-half-up on the lane
        q = jnp.sign(s) * ((jnp.abs(s) + safe // 2) // safe)
        vals = q
    else:
        vals = s / safe.astype(s.dtype)
    return vals, jnp.logical_and(gm, cnt > 0)


register_aggregate(AggregateFunction(
    name="avg",
    resolve_type=_avg_result_type,
    lanes=(
        # decimal averages accumulate in a WIDE int64 lane regardless of
        # the (possibly narrow) input lane — sums overflow int32
        AccLane("sum", lambda t: np.dtype(np.int64)
                if isinstance(t, DecimalType) else np.dtype(np.float64),
                lambda t: 0, scan_op="add"),
        AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0,
                scan_op="add"),
    ),
    accumulate=_sum_acc,
    combine=_sum_combine,
    extract=_avg_extract,
    lane_types=lambda t: (
        DOUBLE if not isinstance(t, DecimalType) else t, BIGINT),
    lane_contribs=lambda values, mask, at: (
        _masked(values.astype(
            np.dtype(np.int64) if isinstance(at, DecimalType)
            else np.dtype(np.float64)), mask, 0),
        mask.astype(jnp.int64)),
))


# ---------------------------------------------------------- variance family

def _var_lanes():
    return (
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0,
                scan_op="add"),
        AccLane("sum", lambda t: np.dtype(np.float64), lambda t: 0.0,
                scan_op="add"),
        AccLane("sumsq", lambda t: np.dtype(np.float64), lambda t: 0.0,
                scan_op="add"),
    )


def _var_contribs(values, mask, at):
    v = _masked(values.astype(jnp.float64), mask, 0.0)
    return (mask.astype(jnp.int64), v, v * v)


def _var_acc(accs, gids, values, mask):
    n, s, ss = accs
    v = _masked(values.astype(jnp.float64), mask, 0.0)
    n = n.at[gids].add(mask.astype(n.dtype), mode="drop")
    s = s.at[gids].add(v, mode="drop")
    ss = ss.at[gids].add(v * v, mode="drop")
    return (n, s, ss)


def _var_combine(accs, gids, lanes, mask):
    n, s, ss = accs
    pn, ps, pss = lanes
    n = n.at[gids].add(_masked(pn, mask, 0), mode="drop")
    s = s.at[gids].add(_masked(ps, mask, 0.0), mode="drop")
    ss = ss.at[gids].add(_masked(pss, mask, 0.0), mode="drop")
    return (n, s, ss)


def _make_var(name: str, sample: bool, stddev: bool):
    def extract(accs, gm):
        n, s, ss = accs
        nf = n.astype(jnp.float64)
        safe_n = jnp.maximum(nf, 1.0)
        m2 = ss - s * s / safe_n
        denom = jnp.maximum(nf - 1.0, 1.0) if sample else safe_n
        var = jnp.maximum(m2, 0.0) / denom
        out = jnp.sqrt(var) if stddev else var
        min_n = 2 if sample else 1
        return out, jnp.logical_and(gm, n >= min_n)

    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: DOUBLE,
        lanes=_var_lanes(),
        accumulate=_var_acc,
        combine=_var_combine,
        extract=extract,
        lane_types=lambda t: (BIGINT, DOUBLE, DOUBLE),
        final_type=lambda lanes: DOUBLE,
        lane_contribs=_var_contribs,
    ))


_make_var("variance", True, False)
_make_var("var_samp", True, False)
_make_var("var_pop", False, False)
_make_var("stddev", True, True)
_make_var("stddev_samp", True, True)
_make_var("stddev_pop", False, True)


# ------------------------------------------------------------ bool_and/or

register_aggregate(AggregateFunction(
    name="bool_and",
    resolve_type=lambda t: BOOLEAN,
    lanes=(
        AccLane("all", lambda t: np.dtype(np.bool_), lambda t: True),
        AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0),
    ),
    accumulate=lambda accs, gids, values, mask: (
        accs[0].at[gids].min(_masked(values, mask, True), mode="drop"),
        accs[1].at[gids].add(mask.astype(accs[1].dtype), mode="drop"),
    ),
    combine=lambda accs, gids, lanes, mask: (
        accs[0].at[gids].min(_masked(lanes[0], mask, True), mode="drop"),
        accs[1].at[gids].add(_masked(lanes[1], mask, 0), mode="drop"),
    ),
    extract=lambda accs, gm: (accs[0], jnp.logical_and(gm, accs[1] > 0)),
    lane_types=lambda t: (BOOLEAN, BIGINT),
))

register_aggregate(AggregateFunction(
    name="bool_or",
    resolve_type=lambda t: BOOLEAN,
    lanes=(
        AccLane("any", lambda t: np.dtype(np.bool_), lambda t: False),
        AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0),
    ),
    accumulate=lambda accs, gids, values, mask: (
        accs[0].at[gids].max(_masked(values, mask, False), mode="drop"),
        accs[1].at[gids].add(mask.astype(accs[1].dtype), mode="drop"),
    ),
    combine=lambda accs, gids, lanes, mask: (
        accs[0].at[gids].max(_masked(lanes[0], mask, False), mode="drop"),
        accs[1].at[gids].add(_masked(lanes[1], mask, 0), mode="drop"),
    ),
    extract=lambda accs, gm: (accs[0], jnp.logical_and(gm, accs[1] > 0)),
    lane_types=lambda t: (BOOLEAN, BIGINT),
))


# -------------------------------------------------------- arbitrary / any

def _arb_acc(accs, gids, values, mask):
    """Scatter-MAX with the MIN identity so masked rows never win —
    any deterministic choice satisfies "arbitrary"; an all-masked group
    keeps the identity and count==0 nulls it at extract. (A prior
    version used the max-identity fill, which made any null row win
    with the sentinel — fuzzer-caught.)"""
    ident = _minmax_identity_for(accs[0].dtype, False)
    return (
        accs[0].at[gids].max(_masked(values, mask, ident), mode="drop"),
        accs[1].at[gids].add(mask.astype(accs[1].dtype), mode="drop"),
    )


def _arb_combine(accs, gids, lanes, mask):
    ident = _minmax_identity_for(accs[0].dtype, False)
    m = jnp.logical_and(mask, lanes[1] > 0)   # empty partials are inert
    return (
        accs[0].at[gids].max(_masked(lanes[0], m, ident), mode="drop"),
        accs[1].at[gids].add(_masked(lanes[1], mask, 0), mode="drop"),
    )


register_aggregate(AggregateFunction(
    name="arbitrary",
    resolve_type=lambda t: t,
    lanes=(
        AccLane("val", lambda t: t.dtype,
                lambda t: _minmax_identity_for(np.dtype(t.dtype), False)),
        AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0),
    ),
    accumulate=_arb_acc,
    combine=_arb_combine,
    extract=lambda accs, gm: (accs[0], jnp.logical_and(gm, accs[1] > 0)),
    lane_types=lambda t: (t, BIGINT),
))


# ------------------------------------- moment/hash aggregate breadth
# (velox/functions/prestosql/aggregates: ChecksumAggregate.h,
#  GeometricMeanAggregate, CentralMomentsAggregates.h)

def _checksum_acc(accs, gids, values, mask):
    (x,) = accs
    from velox_tpu.ops.hash import hash_i64

    h = hash_i64(values.astype(jnp.int64)
                   if not jnp.issubdtype(values.dtype, jnp.floating)
                   else (values * 1e6).astype(jnp.int64))
    h = _masked(h.astype(jnp.int64), mask, 0)
    return (x.at[gids].add(h, mode="drop"),)   # order-independent sum


register_aggregate(AggregateFunction(
    name="checksum",
    resolve_type=lambda t: BIGINT,
    lanes=(AccLane("x", lambda t: np.dtype(np.int64), lambda t: 0),),
    accumulate=_checksum_acc,
    combine=lambda accs, gids, lanes, mask: (
        accs[0].at[gids].add(_masked(lanes[0], mask, 0), mode="drop"),),
    extract=lambda accs, gm: (accs[0], gm),
    lane_types=lambda t: (BIGINT,),
))


def _geomean_acc(accs, gids, values, mask):
    n, sl = accs
    v = values.astype(jnp.float64)
    ok = jnp.logical_and(mask, v > 0)
    n = n.at[gids].add(ok.astype(n.dtype), mode="drop")
    sl = sl.at[gids].add(_masked(jnp.log(jnp.maximum(v, 1e-300)),
                                 ok, 0.0), mode="drop")
    return (n, sl)


register_aggregate(AggregateFunction(
    name="geometric_mean",
    resolve_type=lambda t: DOUBLE,
    lanes=(
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
        AccLane("sumlog", lambda t: np.dtype(np.float64), lambda t: 0.0),
    ),
    accumulate=_geomean_acc,
    combine=lambda accs, gids, lanes, mask: (
        accs[0].at[gids].add(_masked(lanes[0], mask, 0), mode="drop"),
        accs[1].at[gids].add(_masked(lanes[1], mask, 0.0), mode="drop"),
    ),
    extract=lambda accs, gm: (
        jnp.exp(accs[1] / jnp.maximum(accs[0].astype(jnp.float64), 1.0)),
        jnp.logical_and(gm, accs[0] > 0)),
    lane_types=lambda t: (BIGINT, DOUBLE),
    final_type=lambda lanes: DOUBLE,
))


def _moments_lanes():
    return (
        AccLane("n", lambda t: np.dtype(np.int64), lambda t: 0),
        AccLane("s1", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("s2", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("s3", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("s4", lambda t: np.dtype(np.float64), lambda t: 0.0),
    )


def _moments_acc(accs, gids, values, mask):
    n, s1, s2, s3, s4 = accs
    v = _masked(values.astype(jnp.float64), mask, 0.0)
    n = n.at[gids].add(mask.astype(n.dtype), mode="drop")
    s1 = s1.at[gids].add(v, mode="drop")
    v2 = v * v
    s2 = s2.at[gids].add(v2, mode="drop")
    s3 = s3.at[gids].add(v2 * v, mode="drop")
    s4 = s4.at[gids].add(v2 * v2, mode="drop")
    return (n, s1, s2, s3, s4)


def _moments_combine(accs, gids, lanes, mask):
    out = []
    for a, p in zip(accs, lanes):
        z = 0 if a.dtype == jnp.int64 else 0.0
        out.append(a.at[gids].add(_masked(p, mask, z), mode="drop"))
    return tuple(out)


def _make_moments(name: str, kurt: bool):
    def extract(accs, gm):
        n, s1, s2, s3, s4 = accs
        nf = jnp.maximum(n.astype(jnp.float64), 1.0)
        m = s1 / nf
        m2 = jnp.maximum(s2 / nf - m * m, 0.0)
        m3 = s3 / nf - 3 * m * s2 / nf + 2 * m ** 3
        m4 = (s4 / nf - 4 * m * s3 / nf + 6 * m * m * s2 / nf
              - 3 * m ** 4)
        sd = jnp.sqrt(jnp.maximum(m2, 1e-300))
        if kurt:
            # Presto kurtosis: sample excess kurtosis
            nn = nf
            g2 = m4 / jnp.maximum(m2 * m2, 1e-300) - 3.0
            out = ((nn - 1) / jnp.maximum((nn - 2) * (nn - 3), 1.0)
                   * ((nn + 1) * g2 + 6))
            ok = n >= 4
        else:
            # Presto skewness: sample skewness
            g1 = m3 / jnp.maximum(sd ** 3, 1e-300)
            nn = nf
            out = (jnp.sqrt(jnp.maximum(nn * (nn - 1), 0.0))
                   / jnp.maximum(nn - 2, 1.0) * g1)
            ok = n >= 3
        return out, jnp.logical_and(gm, ok)

    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: DOUBLE,
        lanes=_moments_lanes(),
        accumulate=_moments_acc,
        combine=_moments_combine,
        extract=extract,
        lane_types=lambda t: (BIGINT, DOUBLE, DOUBLE, DOUBLE, DOUBLE),
        final_type=lambda lanes: DOUBLE,
    ))


_make_moments("skewness", False)
_make_moments("kurtosis", True)
