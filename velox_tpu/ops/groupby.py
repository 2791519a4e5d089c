"""Group-id assignment kernels.

The TPU replacement for velox's grouping hash table
(velox/exec/HashTable.h:146 kArray/kNormalizedKey/kHash modes,
exec/GroupingSet.cpp:311 groupProbe):

* ``group_ids_array`` — direct value-id addressing when host-side key stats
  bound the key space (the kArray mode, velox/exec/VectorHasher.h:127-136):
  gid is a mixed-radix combination of per-key value ids. O(1) per row, the
  preferred mode whenever stats allow; gids are stable across batches so
  accumulators persist (streaming-friendly).
* ``group_ids_sorted`` — generic mode: one lexicographic sort of the key
  operands, segment boundaries, cumsum. On TPU a bitonic sort beats a
  random-access hash probe (HBM gathers) for the generic case; this is the
  sort-is-the-hash-table design. gids are batch-local; cross-batch merge
  happens by re-grouping (group keys, accumulators) pairs — the exact
  analog of partial/final aggregation companions
  (velox/exec/AggregateCompanionAdapter.h:24).

All functions are pure and jittable; "no match" / padding rows get the
sentinel gid == capacity which scatter ``mode="drop"`` discards.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from velox_tpu.ops.sortkey import encode_sort_key

#: (values, valid) — valid None means all-valid
KeyCol = Tuple[jax.Array, Optional[jax.Array]]


def _key_operands(keys: Sequence[KeyCol]) -> List[jax.Array]:
    ops: List[jax.Array] = []
    for values, valid in keys:
        if valid is not None:
            # SQL GROUP BY: nulls are one group; zero the lane so garbage
            # under a null doesn't split it.
            values = jnp.where(valid, values, jnp.zeros((), values.dtype))
        ops.extend(encode_sort_key(values, valid))
    return ops


def group_ids_sorted(
    keys: Sequence[KeyCol], sel: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort-based batch-local grouping.

    Returns ``(gids, group_rows, group_sel, num_groups)``:
      * gids       (cap,) int32 — group id per input row; inactive rows get
                   the sentinel ``cap`` (dropped by scatter mode="drop").
      * group_rows (cap,) int32 — original row index of each group's first
                   row (gather key values through it).
      * group_sel  (cap,) bool — which group slots are live.
      * num_groups ()     int32 — device scalar group count.
    """
    cap = sel.shape[0]
    if not keys:
        # keyless (global aggregation): no sort needed — one group holding
        # every active row; group_rows points at any row (keys unused)
        any_active = jnp.any(sel)
        gids = jnp.where(sel, jnp.int32(0), jnp.int32(cap))
        group_rows = jnp.zeros((cap,), jnp.int32)
        num_groups = any_active.astype(jnp.int32)
        group_sel = jnp.zeros((cap,), jnp.bool_).at[0].set(any_active)
        return gids, group_rows, group_sel, num_groups

    perm = jnp.arange(cap, dtype=jnp.int32)
    inactive = jnp.where(sel, jnp.int32(0), jnp.int32(1))
    ops = [inactive] + _key_operands(keys)
    sorted_all = jax.lax.sort(ops + [perm], is_stable=True, num_keys=len(ops))
    sorted_keys = sorted_all[1:-1]
    sorted_perm = sorted_all[-1]
    active_sorted = jnp.take(sel, sorted_perm, mode="clip")

    if sorted_keys:
        diff = jnp.zeros((cap,), dtype=jnp.bool_)
        for k in sorted_keys:
            diff = jnp.logical_or(diff, jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]]))
    else:
        # no keys: single global group (global aggregation)
        diff = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), jnp.zeros((cap - 1,), jnp.bool_)])
    boundary = jnp.logical_and(active_sorted, diff)
    # first active row always opens a group even if diff says equal-to-prev
    boundary = boundary.at[0].set(active_sorted[0])

    sid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    num_groups = jnp.sum(boundary.astype(jnp.int32))
    sid = jnp.where(active_sorted, sid, jnp.int32(cap))

    gids = jnp.zeros((cap,), jnp.int32).at[sorted_perm].set(sid)
    group_rows = (
        jnp.zeros((cap,), jnp.int32)
        .at[jnp.where(boundary, sid, jnp.int32(cap))]
        .set(sorted_perm, mode="drop")
    )
    group_sel = jnp.arange(cap, dtype=jnp.int32) < num_groups
    return gids, group_rows, group_sel, num_groups


def group_ids_array(
    value_ids: Sequence[jax.Array],
    radices: Sequence[int],
    sel: jax.Array,
    num_groups: int,
) -> jax.Array:
    """kArray mode: gid = mixed-radix combination of per-key value ids.

    ``value_ids[k]`` must be in ``[0, radices[k])`` for active rows (host
    key stats guarantee it; out-of-range ids fall on the sentinel). Stable
    across batches — accumulators of size ``num_groups`` persist.
    """
    cap = sel.shape[0]
    gid = jnp.zeros((cap,), dtype=jnp.int32)
    stride = 1
    for vid, radix in zip(value_ids, radices):
        gid = gid + vid.astype(jnp.int32) * stride
        stride *= radix
    in_range = jnp.logical_and(gid >= 0, gid < num_groups)
    ok = jnp.logical_and(sel, in_range)
    return jnp.where(ok, gid, jnp.int32(num_groups))


_SCAN_OPS = {
    "add": jnp.add,
    "min": jnp.minimum,
    "max": jnp.maximum,
}


def segment_scan(values: jax.Array, head: jax.Array,
                 op: str) -> jax.Array:
    """Inclusive segmented scan over group-contiguous rows.

    ``head[i]`` marks the first row of each segment; the value at each
    segment's LAST row is the segment's full reduction. The clustered
    replacement for scatter-reduce accumulation (velox
    StreamingAggregation.cpp assignGroups + Aggregate::addRawInput): one
    ``associative_scan`` instead of a scatter — on the axon TPU backend
    an int64 scatter-add at 8M rows costs ~800ms while this scan costs
    ~35ms (tools/ubench measurements, round 2).
    """
    f = _SCAN_OPS[op]

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, f(av, bv)), jnp.logical_or(af, bf)

    sv, _ = jax.lax.associative_scan(comb, (values, head))
    return sv
