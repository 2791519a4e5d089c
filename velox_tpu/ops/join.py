"""Equi-join kernels: sorted build index + vectorized binary-search probe.

The TPU re-design of velox's join hash table
(velox/exec/HashTable.h joinProbe/listJoinResults, HashProbe.cpp:796): the
build side is *sorted by key* once (a bitonic sort — the TPU's native
"parallel table build", cf. parallelJoinBuild exec/HashTable.cpp:1003), and
probing is a vectorized ``searchsorted``: O(log n) fully-parallel gathers
per probe row, no random scatter, no collision chains. Duplicate build keys
form contiguous runs, so a probe row's matches are ``[first, last)`` — the
run-list analog of velox's nextOffset duplicate lists.

Composite keys are packed into one int64 "normalized key" on the host-stats
fast path (velox/exec/VectorHasher.h:130 normalized keys); wider keys pack
into two lanes probed hierarchically (not yet needed for TPC-H).

Match expansion produces data-dependent row counts; the host syncs the
device match total once per probe batch to pick a padded output capacity —
the analog of Velox's outputBatchSize loop in listJoinResults.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_I64_MAX = jnp.iinfo(jnp.int64).max


def build_join_index(
    key: jax.Array, valid: Optional[jax.Array], sel: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort build rows by key. Null-key and padding rows never match.

    Returns ``(sorted_keys, perm, n_active)``; trailing (non-matchable)
    slots hold the lane's max so the array is globally ascending for
    searchsorted; counts are clamped by ``n_active`` to keep real max-value
    keys exact. The key lane's width is preserved (int32 keys sort/probe
    in 32-bit — TPU narrow-lane rule).
    """
    cap = sel.shape[0]
    if key.dtype not in (jnp.int32, jnp.int64):
        key = key.astype(jnp.int64)
    active = sel if valid is None else jnp.logical_and(sel, valid)
    perm = jnp.arange(cap, dtype=jnp.int32)
    rank = jnp.where(active, jnp.int32(0), jnp.int32(1))
    _, sorted_keys, sorted_perm = jax.lax.sort(
        [rank, key, perm], is_stable=True, num_keys=2
    )
    n_active = jnp.sum(active.astype(jnp.int32))
    idx = jnp.arange(cap, dtype=jnp.int32)
    sorted_keys = jnp.where(
        idx < n_active, sorted_keys, jnp.iinfo(key.dtype).max)
    return sorted_keys, sorted_perm, n_active


def probe_join_index(
    sorted_keys: jax.Array,
    n_active: jax.Array,
    probe_key: jax.Array,
    probe_valid: Optional[jax.Array],
    probe_sel: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per probe row: (first match position, match count) in the build sort."""
    pk = probe_key.astype(sorted_keys.dtype)
    first = jnp.searchsorted(sorted_keys, pk, side="left").astype(jnp.int32)
    last = jnp.searchsorted(sorted_keys, pk, side="right").astype(jnp.int32)
    first = jnp.minimum(first, n_active)
    last = jnp.minimum(last, n_active)
    ok = probe_sel if probe_valid is None else jnp.logical_and(
        probe_sel, probe_valid)
    count = jnp.where(ok, last - first, 0)
    return first, count


def match_total(count: jax.Array, emit_unmatched: Optional[jax.Array] = None
                ) -> jax.Array:
    """Device scalar: total output rows (host syncs this to size output)."""
    c = count
    if emit_unmatched is not None:
        c = jnp.where(jnp.logical_and(emit_unmatched, count == 0), 1, count)
    return jnp.sum(c)


def expand_matches(
    first: jax.Array,
    count: jax.Array,
    build_perm: jax.Array,
    out_cap: int,
    emit_unmatched: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Expand (first, count) runs into flat output rows.

    Returns ``(probe_rows, build_rows, matched, out_sel)`` each of shape
    ``(out_cap,)``. ``emit_unmatched`` (left-outer semantics) makes
    zero-count probe rows emit one row with ``matched=False`` (build
    columns become null). Rows beyond the true total are masked off by
    ``out_sel``; ``out_cap`` must be >= the synced ``match_total``.
    """
    emit = count
    if emit_unmatched is not None:
        emit = jnp.where(
            jnp.logical_and(emit_unmatched, count == 0), 1, count)
    offsets = jnp.cumsum(emit) - emit            # exclusive prefix sum
    total = offsets[-1] + emit[-1]

    j = jnp.arange(out_cap, dtype=offsets.dtype)
    probe_rows = (
        jnp.searchsorted(offsets, j, side="right").astype(jnp.int32) - 1
    )
    probe_rows = jnp.clip(probe_rows, 0, first.shape[0] - 1)
    ordinal = j.astype(jnp.int32) - jnp.take(
        offsets, probe_rows, mode="clip").astype(jnp.int32)
    cnt = jnp.take(count, probe_rows, mode="clip").astype(jnp.int32)
    matched = ordinal < cnt
    build_pos = jnp.take(first, probe_rows, mode="clip") + ordinal
    build_rows = jnp.take(build_perm, build_pos, mode="clip")
    out_sel = j < total
    return probe_rows, build_rows, matched, out_sel


def build_matched_flags(
    build_cap: int,
    build_rows: jax.Array,
    matched: jax.Array,
    out_sel: jax.Array,
) -> jax.Array:
    """Which build rows matched at least once (right/full outer joins).

    Accumulated across probe batches by OR-ing results
    (velox/exec/HashProbe.cpp right-join tracking analog).
    """
    hit = jnp.logical_and(matched, out_sel)
    rows = jnp.where(hit, build_rows, jnp.int32(build_cap))
    return (
        jnp.zeros((build_cap,), jnp.bool_)
        .at[rows]
        .set(True, mode="drop")
    )


def pack_normalized_key(
    value_ids: Sequence[jax.Array], bits: Sequence[int]
) -> jax.Array:
    """Pack per-column value ids into one int64 normalized key.

    ``value_ids[k]`` must fit in ``bits[k]``; total bits must be <= 63
    (velox/exec/VectorHasher.h:130-133 packs <=59 bits/key the same way).
    """
    assert sum(bits) <= 63, "normalized key overflow"
    lane = jnp.int32 if sum(bits) <= 31 else jnp.int64
    key = jnp.zeros_like(value_ids[0], dtype=lane)
    shift = 0
    for vid, b in zip(value_ids, bits):
        key = key | (vid.astype(lane) << shift)
        shift += b
    return key
