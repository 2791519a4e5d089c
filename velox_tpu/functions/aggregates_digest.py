"""Mergeable quantile digest lanes for approx_percentile partial/final.

The SINGLE-step approx_percentile stays EXACT (sorted runs,
functions/aggregates_collect.py). This module adds the bounded-memory
companion forms the reference gets from KLL sketches
(velox/functions/lib/KllSketch.h; ApproxPercentileAggregate.cpp
serialized accumulators, velox/exec/Aggregate.h:47): a merging-digest
accumulator as fixed-width matrix lanes, so PARTIAL/FINAL planning,
distribution, and spill all work with O(K) state per group.

TPU-first design — the digest is three device lanes per group:

* ``means``  (groups, K) float64 — centroid means
* ``weights``(groups, K) int64   — centroid row counts
* ``q``      (groups,)   float32 — the captured quantile argument

Ingest sorts the batch by (group, value) (the engine's native
operation), equal-count-bins each group's run into <= K centroids, then
merges them with the state via a per-group axis-1 sort of 2K centroids
and a cumulative-weight rebin (Dunning's MergingDigest with the k0
scale function — uniform quantile error ~ 1/(2K)). While a group holds
<= K rows the digest is EXACT (every row its own centroid), so small
groups reproduce the exact path bit-for-bit.

Deviations from the reference (documented):
* result type is DOUBLE in partial/final planning (the centroid lane
  type; the exact SINGLE path preserves the input type);
* accuracy parameter is fixed by K (=64) rather than per-call;
* results depend on batch/merge order (true of any mergeable digest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, DOUBLE, REAL, DataType
from velox_tpu.functions.aggregates import (
    AccLane, AggregateFunction, register_aggregate,
)

#: centroids per group (uniform-bin quantile error ~ 1/(2K))
K = 64


def _sorted_runs(gids, vals, w, mask, num_groups):
    """Sort (gid, value) and return per-element group-local cumulative
    weights + per-group totals (the weighted-rank basis for binning)."""
    from velox_tpu.ops.sortkey import encode_sort_key

    cap = gids.shape[0]
    g2 = jnp.where(mask, gids, jnp.int32(num_groups))
    perm = jnp.arange(cap, dtype=jnp.int32)
    vops = encode_sort_key(vals, None)
    ops = [g2] + list(vops) + [perm]
    sorted_ops = jax.lax.sort(ops, is_stable=True, num_keys=len(ops) - 1)
    sg = sorted_ops[0]
    sperm = sorted_ops[-1]
    sv = jnp.take(vals, sperm, mode="clip")
    sw = jnp.where(jnp.take(mask, sperm, mode="clip"),
                   jnp.take(w, sperm, mode="clip"),
                   jnp.zeros((), w.dtype))
    # per-group totals and start offsets in the sorted order
    counts = (jnp.zeros((num_groups,), w.dtype)
              .at[g2].add(w * mask.astype(w.dtype), mode="drop"))
    cum_all = jnp.cumsum(sw)
    group_start_w = (jnp.cumsum(counts) - counts)
    base = jnp.take(group_start_w, jnp.clip(sg, 0, num_groups - 1),
                    mode="clip")
    cumw = cum_all - base  # inclusive within-group cumulative weight
    return sg, sv, sw, cumw, counts


def _bin_elements(sg, sv, sw, cumw, counts, num_groups):
    """Equal-weight bin sorted elements into (groups, K) centroids."""
    totw = jnp.take(counts, jnp.clip(sg, 0, num_groups - 1),
                    mode="clip")
    center = cumw.astype(jnp.float32) - sw.astype(jnp.float32) * 0.5
    b = jnp.floor(K * center / jnp.maximum(
        totw.astype(jnp.float32), 1.0)).astype(jnp.int32)
    b = jnp.clip(b, 0, K - 1)
    live = jnp.logical_and(sg < num_groups, sw > 0)
    slot = jnp.where(live, sg * K + b, num_groups * K)
    wsum = (jnp.zeros((num_groups * K,), jnp.int64)
            .at[slot].add(sw.astype(jnp.int64), mode="drop"))
    msum = (jnp.zeros((num_groups * K,), jnp.float64)
            .at[slot].add(sv.astype(jnp.float64)
                          * sw.astype(jnp.float64), mode="drop"))
    wsum = wsum.reshape(num_groups, K)
    msum = msum.reshape(num_groups, K)
    means = msum / jnp.maximum(wsum, 1).astype(jnp.float64)
    return means, wsum


def _merge_state(means_a, w_a, means_b, w_b):
    """Merge two (G, K) digests into one: axis-1 sort of 2K centroids
    by mean (empty slots to the end), then cumulative-weight rebin."""
    g = means_a.shape[0]
    m2 = jnp.concatenate([means_a, means_b], axis=1)
    w2 = jnp.concatenate([w_a, w_b], axis=1)
    key = jnp.where(w2 > 0, m2, jnp.inf)
    order = jnp.argsort(key, axis=1)
    m2 = jnp.take_along_axis(m2, order, axis=1)
    w2 = jnp.take_along_axis(w2, order, axis=1)
    cumw = jnp.cumsum(w2, axis=1)
    totw = cumw[:, -1:]
    center = (cumw.astype(jnp.float64)
              - w2.astype(jnp.float64) * 0.5)
    b = jnp.floor(K * center / jnp.maximum(
        totw.astype(jnp.float64), 1.0)).astype(jnp.int32)
    b = jnp.clip(b, 0, K - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, 2 * K), 0)
    slot = jnp.where(w2 > 0, rows * K + b, g * K)
    wsum = (jnp.zeros((g * K,), jnp.int64)
            .at[slot.reshape(-1)]
            .add(w2.astype(jnp.int64).reshape(-1), mode="drop"))
    msum = (jnp.zeros((g * K,), jnp.float64)
            .at[slot.reshape(-1)]
            .add((m2 * w2.astype(jnp.float64)).reshape(-1),
                 mode="drop"))
    wsum = wsum.reshape(g, K)
    means = (msum.reshape(g, K)
             / jnp.maximum(wsum, 1).astype(jnp.float64))
    return means, wsum


def _accumulate(accs, gids, values, mask):
    means, weights, qlane = accs
    (v, vvalid), (q, qvalid) = values
    g = means.shape[0]
    m = mask
    if vvalid is not None:
        m = jnp.logical_and(m, vvalid)
    w = jnp.ones(v.shape, jnp.int64)
    sg, sv, sw, cumw, counts = _sorted_runs(
        gids.astype(jnp.int32), v, w, m, g)
    bm, bw = _bin_elements(sg, sv, sw, cumw, counts, g)
    means, weights = _merge_state(means, weights, bm, bw)
    qv = q.astype(jnp.float32)
    if qvalid is not None:
        m = jnp.logical_and(m, qvalid)
    qlane = qlane.at[jnp.where(m, gids, g)].max(
        jnp.where(m, qv, jnp.float32(-1.0)), mode="drop")
    return means, weights, qlane


def _combine(accs, gids, lanes, mask):
    """Merge partial digests (lanes gathered from name$lane@slot
    columns) into the accumulator: every partial centroid is a weighted
    value run through the same ingest."""
    means, weights, qlane = accs
    pmeans, pweights, pq = lanes
    g = means.shape[0]
    cap = gids.shape[0]
    # flatten partial centroids to a weighted element stream
    eg = jnp.repeat(jnp.where(mask, gids, jnp.int32(g)), K)
    ev = pmeans.reshape(-1)
    ew = jnp.where(jnp.repeat(mask, K), pweights.reshape(-1),
                   jnp.zeros((), pweights.dtype)).astype(jnp.int64)
    sg, sv, sw, cumw, counts = _sorted_runs(
        eg.astype(jnp.int32), ev, ew, ew > 0, g)
    bm, bw = _bin_elements(sg, sv, sw, cumw, counts, g)
    means, weights = _merge_state(means, weights, bm, bw)
    qlane = qlane.at[jnp.where(mask, gids, g)].max(
        jnp.where(mask, pq.astype(jnp.float32), jnp.float32(-1.0)),
        mode="drop")
    return means, weights, qlane


def _extract(accs, group_mask):
    means, weights, qlane = accs
    cumw = jnp.cumsum(weights, axis=1)
    totw = cumw[:, -1]
    q = jnp.clip(qlane.astype(jnp.float64), 0.0, 1.0)
    # Presto lower-interpolation target rank: floor(q * (n - 1))
    target = jnp.floor(
        q * jnp.maximum(totw - 1, 0).astype(jnp.float64)
    ).astype(jnp.int64)
    hit = cumw > target[:, None]
    idx = jnp.argmax(hit, axis=1)
    out = jnp.take_along_axis(means, idx[:, None], axis=1)[:, 0]
    valid = jnp.logical_and(group_mask, totw > 0)
    valid = jnp.logical_and(valid, qlane >= 0)
    return out, valid


def _lane_types(at) -> tuple:
    return (DOUBLE, BIGINT, REAL)


def _resolve(at):
    # SINGLE planning never reaches here (collect path); partial/final
    # planning returns the centroid type (documented deviation)
    return DOUBLE


def make_percentile_digest(collect_kind: str = "percentile"
                           ) -> AggregateFunction:
    return AggregateFunction(
        name="approx_percentile",
        resolve_type=lambda t: (
            t[0] if isinstance(t, tuple) and isinstance(t[0], DataType)
            else DOUBLE),
        lanes=(
            AccLane("dmean", lambda at: np.dtype(np.float64),
                    lambda at: 0.0, width=K),
            AccLane("dweight", lambda at: np.dtype(np.int64),
                    lambda at: 0, width=K),
            AccLane("q", lambda at: np.dtype(np.float32),
                    lambda at: -1.0),
        ),
        accumulate=_accumulate,
        combine=_combine,
        extract=_extract,
        lane_types=_lane_types,
        final_type=lambda lts: DOUBLE,
        input_type_from_lanes=lambda lts: (DOUBLE, DOUBLE),
        collect_kind=collect_kind,
    )


def register_percentile_digest() -> None:
    register_aggregate(make_percentile_digest())
