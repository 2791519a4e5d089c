"""Collect-style aggregates: array_agg, map_agg, map_union, percentiles.

Third tranche of the prestosql aggregate package (VERDICT r1 item 5):
array_agg (velox/functions/prestosql/aggregates/ArrayAggAggregate.cpp),
map_agg (MapAggAggregate.cpp), map_union (MapUnionAggregate.cpp),
approx_percentile (ApproxPercentileAggregate.cpp).

TPU-first design: these aggregates need every input value at finish —
an ARRAY result *is* the input, regrouped. The sort-is-the-hash-table
engine already produces exactly that arrangement: one global sort by
group id makes every group's values a contiguous run, so the collect
"accumulator" is the sorted value lane itself plus per-group
(start, length) offsets — precisely the ArrayColumn/MapColumn layout.
There is no per-group dynamic buffer (velox's ValueList) at all; the
HashAggregationOp collect mode (exec/operators.py) buffers raw rows and
runs the kernels here once at finish.

approx_percentile is computed EXACTLY from the same sorted runs (a
strict accuracy upgrade over the reference's KLL sketch — the sort the
sketch exists to avoid is this engine's native operation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import DataType
from velox_tpu.types.types import ArrayType, MapType, TypeKind, array, map_
from velox_tpu.functions.aggregates import (
    AggregateFunction, register_aggregate,
)


def _no_lanes(t):
    return ()


def _register_collect(name: str, kind: str, resolve_type) -> None:
    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=resolve_type,
        lanes=(),
        accumulate=None,
        combine=None,
        extract=None,
        lane_types=_no_lanes,
        collect_kind=kind,
    ))


_register_collect("array_agg", "array", lambda t: array(t))
_register_collect("map_agg", "map", lambda t: map_(t[0], t[1]))
# multimap_agg(K, V) -> map(K, array(V)): one (group, key, arrival)
# sort lays the nested values out flat; entries are the distinct
# (group, key) reps (MultiMapAggAggregate.cpp)
_register_collect("multimap_agg", "multimap",
                  lambda t: map_(t[0], array(t[1])))
_register_collect("map_union", "map_union", lambda t: t)
# approx_percentile(v, q): scalar result of the value type
_register_collect("approx_percentile", "percentile", lambda t: t[0])
# set_agg: array_agg with per-group value dedupe (SetAggAggregate.cpp)
_register_collect("set_agg", "set", lambda t: array(t))
# set_union: union of input arrays, deduped (SetUnionAggregate.cpp)
_register_collect("set_union", "set_union", lambda t: t)
# histogram: value -> occurrence count map (HistogramAggregate.cpp)
from velox_tpu.types import BIGINT as _BIGINT
_register_collect("histogram", "histogram", lambda t: map_(t, _BIGINT))
# map_union_sum: union of maps, values SUMMED per key (MapUnionSumAggregate)
from velox_tpu.types import DOUBLE as _DOUBLE
from velox_tpu.types.types import TypeKind as _TK
_register_collect(
    "map_union_sum", "map_union_sum",
    lambda t: map_(t.key, _DOUBLE if t.value.kind in (
        _TK.REAL, _TK.DOUBLE) else _BIGINT))
# reduce_agg(x, init, (a,b) -> combine): generic user-lambda reduction.
# RESTRICTION vs presto: one ASSOCIATIVE lambda serves as both input
# and combine function with state type == input type — which is what
# lets it run as a segmented associative scan instead of a per-row fold
# (ReduceAgg.cpp requires commutativity+associativity anyway).
_register_collect("reduce_agg", "reduce", lambda t: t)
# classification metric family (ClassificationAggregation.cpp):
# classification_*(buckets, outcome, pred) -> ARRAY(double) of the
# metric at thresholds i/buckets. Per-bucket true/false weight counts
# ride one (group, bucket) scatter; suffix sums + ratios finish on host
for _cname in ("classification_precision", "classification_recall",
               "classification_miss_rate", "classification_fall_out",
               "classification_thresholds"):
    _register_collect(_cname, "classification",
                      lambda t: array(_DOUBLE))
# vector_sum: elementwise sum of arrays-as-vectors, shorter arrays
# zero-padded (VectorSumAggregate) — one scatter-add over
# (group, ordinal) pairs, the MXU-adjacent way to sum vectors
_register_collect(
    "vector_sum", "vector_sum",
    lambda t: array(_DOUBLE if t.element.kind in (
        _TK.REAL, _TK.DOUBLE) else _BIGINT))
# approx_most_frequent(k, v): top-k values by frequency as a map —
# computed EXACTLY from the grouped counts (the sorted arrangement
# makes the sketch unnecessary, like approx_percentile)
_register_collect("approx_most_frequent", "most_frequent",
                  lambda t: map_(t[1], _BIGINT))
# approx_winsorized_mean(x, lo, hi): mean after clamping to the exact
# [lo, hi] quantile values (ApproxWinsorizedMeanAggregate — exact here,
# the sorted runs make the percentile sketch unnecessary)
_register_collect("approx_winsorized_mean", "winsorized",
                  lambda t: _DOUBLE)
# numeric_histogram(b, x): b-bucket histogram as map(center -> count),
# bucket centers = mean of each equal-width bin over the group's exact
# [min, max] span (NumericHistogramAggregate behavioral subset: the
# reference's Ben-Haim/Tom-Tov streaming centroids exist to avoid the
# full materialization this engine natively has)
_register_collect("numeric_histogram", "numeric_histogram",
                  lambda t: map_(_DOUBLE, _DOUBLE))
# tdigest_agg / qdigest_agg: mergeable quantile sketches as VARBINARY
# (TDigestAggregate.cpp, QDigestAggAggregate.cpp) — built EXACTLY from
# the value-sorted runs in one vectorized pass (functions/digest.py)
from velox_tpu.types import VARBINARY as _VARBINARY
_register_collect("tdigest_agg", "digest", lambda t: _VARBINARY)
_register_collect("qdigest_agg", "digest", lambda t: _VARBINARY)
# merge(sketch): union of group sketches — dispatches on the blob tag
# (t-digest / qdigest / HLL / SetDigest / KHLL; functions/sketch.py
# merge_blobs). Presto exposes one merge() name across all of them.
_register_collect("merge", "digest_merge", lambda t: t)
_register_collect("merge_set_digest", "digest_merge", lambda t: t)
_register_collect("merge_khll", "digest_merge", lambda t: t)
# approx_set / make_set_digest: distinct-set sketches as blobs
# (HyperLogLogAggregate.cpp, SetDigestFunctions — functions/sketch.py)
_register_collect("approx_set", "hll", lambda t: _VARBINARY)
_register_collect("make_set_digest", "hll", lambda t: _VARBINARY)
# khyperloglog_agg(x, uii): join-key uniqueness sketch
# (KHyperLogLogAggregate.cpp)
_register_collect("khyperloglog_agg", "khll", lambda t: _VARBINARY)
# reservoir_sample(x, k): uniform k-sample without replacement via
# bottom-k-by-hash priorities (deterministic + mergeable; deviation:
# Presto's signature also threads an initial sample state through)
_register_collect("reservoir_sample", "reservoir",
                  lambda t: array(t[0]))


# ---------------------------------------------------------------- kernels
# All kernels run inside the collect-mode finish jit. Inputs are at the
# concatenated capacity ``cap``; ``gids`` are the FINAL group ids from the
# one global grouping (sentinel = cap for inactive rows); ``num_groups``
# bounds the live group slots.

def collect_runs(gids: jax.Array, mask: jax.Array, order_ops=None):
    """Sort contributing rows into group-contiguous runs.

    Returns ``(perm, counts, starts)``: ``perm`` gathers input rows into
    (group-major, then ``order_ops``-ordered) element order; ``counts``/
    ``starts`` are per-group-slot element extents — the ArrayColumn
    offsets (velox ArrayVector offsets/sizes, built here by one sort
    instead of per-group ValueList appends).
    """
    cap = gids.shape[0]
    g2 = jnp.where(mask, gids, jnp.int32(cap))
    perm = jnp.arange(cap, dtype=jnp.int32)
    ops = [g2] + list(order_ops or []) + [perm]
    sorted_ops = jax.lax.sort(ops, is_stable=True, num_keys=len(ops) - 1)
    perm_sorted = sorted_ops[-1]
    counts = (jnp.zeros((cap,), jnp.int32)
              .at[g2].add(1, mode="drop"))
    starts = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    return perm_sorted, counts, starts


def dedupe_first(gids: jax.Array, key_ops, mask: jax.Array) -> jax.Array:
    """Keep-first mask over (gid, key) duplicates.

    ``key_ops``: sortable int operand list for the dedupe key (from
    ops/sortkey.encode_sort_key). The winner among duplicates is the
    lowest original row index — deterministic "arbitrary input map"
    semantics for map_agg/map_union duplicate keys.
    """
    cap = gids.shape[0]
    g2 = jnp.where(mask, gids, jnp.int32(cap))
    perm = jnp.arange(cap, dtype=jnp.int32)
    ops = [g2] + list(key_ops) + [perm]
    sorted_ops = jax.lax.sort(ops, is_stable=True, num_keys=len(ops))
    sg = sorted_ops[0]
    sperm = sorted_ops[-1]
    # a row opens a new (gid, key) run iff any sort operand differs from
    # the previous sorted row
    diff = jnp.zeros((cap,), jnp.bool_).at[0].set(True)
    for k in sorted_ops[:-1]:
        diff = jnp.logical_or(diff, jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]]))
    keep_sorted = jnp.logical_and(diff, sg < cap)
    keep = (jnp.zeros((cap,), jnp.bool_)
            .at[sperm].set(keep_sorted, mode="drop"))
    return jnp.logical_and(keep, mask)


def percentile_values(
    gids: jax.Array,
    values: jax.Array,
    value_ops,
    mask: jax.Array,
    q: jax.Array,
) -> tuple:
    """Exact per-group percentile: sort (gid, value), index each group's
    run at ``floor(q * (n-1))`` (Presto's lower-interpolation convention,
    velox/functions/prestosql/aggregates/ApproxPercentileAggregate.cpp
    result contract). Returns per-group-slot (values, valid)."""
    cap = gids.shape[0]
    perm_sorted, counts, starts = collect_runs(gids, mask, value_ops)
    svals = jnp.take(values, perm_sorted, mode="clip")
    # element index per group slot
    idx = jnp.arange(cap, dtype=jnp.int32)
    n = counts
    qpos = jnp.floor(
        q.astype(jnp.float32) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    ).astype(jnp.int32)
    pos = jnp.clip(starts + qpos, 0, cap - 1)
    out = jnp.take(svals, pos, mode="clip")
    return out, n > 0
