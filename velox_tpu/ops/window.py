"""Window-function kernels: segmented scans over sorted partitions.

The TPU re-design of velox/exec/window (SortWindowBuild.h + per-function
eval): sort once by (partition keys, sort keys), then every window
function is a *segmented scan* or a gather against partition/peer
boundaries — O(n log n) total, fully parallel, no per-partition loops.
Results scatter back to original row order.

Default frame semantics implemented: RANGE UNBOUNDED PRECEDING .. CURRENT
ROW (the SQL default) — running aggregates include the full current peer
group, matching Presto.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def segment_starts(seg_change: jax.Array) -> jax.Array:
    """For each row, index of its segment's first row (sorted layout).

    ``seg_change[i]`` is True when row i opens a new segment.
    """
    n = seg_change.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start_or_zero = jnp.where(seg_change, idx, 0)
    return jax.lax.associative_scan(jnp.maximum, start_or_zero)


def segment_ends(seg_change: jax.Array, n_valid: jax.Array) -> jax.Array:
    """For each row, one past its segment's last row (sorted layout)."""
    n = seg_change.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    nxt = jnp.concatenate([seg_change[1:], jnp.ones((1,), jnp.bool_)])
    end_or_big = jnp.where(nxt, idx + 1, n)
    rev = jax.lax.associative_scan(
        jnp.minimum, end_or_big[::-1])[::-1]
    return jnp.minimum(rev, n_valid)


def segmented_cumsum(values: jax.Array, seg_change: jax.Array) -> jax.Array:
    """Inclusive running sum that resets at segment starts."""
    def comb(a, b):
        (reset_a, sum_a), (reset_b, sum_b) = a, b
        return (jnp.logical_or(reset_a, reset_b),
                jnp.where(reset_b, sum_b, sum_a + sum_b))

    _, out = jax.lax.associative_scan(comb, (seg_change, values))
    return out


def segmented_scan(values: jax.Array, seg_change: jax.Array,
                   op: Callable) -> jax.Array:
    """Inclusive segmented scan with an arbitrary associative op."""
    def comb(a, b):
        (reset_a, v_a), (reset_b, v_b) = a, b
        return (jnp.logical_or(reset_a, reset_b),
                jnp.where(reset_b, v_b, op(v_a, v_b)))

    _, out = jax.lax.associative_scan(comb, (seg_change, values))
    return out


def row_numbers(part_change: jax.Array) -> jax.Array:
    """1-based row number within each partition (sorted layout)."""
    idx = jnp.arange(part_change.shape[0], dtype=jnp.int64)
    starts = segment_starts(part_change).astype(jnp.int64)
    return idx - starts + 1


def ranks(part_change: jax.Array, peer_change: jax.Array
          ) -> Tuple[jax.Array, jax.Array]:
    """(rank, dense_rank), 1-based, sorted layout.

    ``peer_change`` marks rows whose sort-key differs from the previous
    row (a new peer group); partition starts are always peer changes.
    """
    idx = jnp.arange(part_change.shape[0], dtype=jnp.int64)
    part_start = segment_starts(part_change).astype(jnp.int64)
    peer_start = segment_starts(
        jnp.logical_or(part_change, peer_change)).astype(jnp.int64)
    rank = peer_start - part_start + 1
    new_peer = jnp.logical_or(part_change, peer_change)
    dense = segmented_cumsum(
        new_peer.astype(jnp.int64), part_change)
    return rank, dense
