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
    # inactive rows get the sentinel IN the key (a 2-operand sort compiles
    # far faster than 3 operands on TPU); real max-value keys may mix with
    # sentinels but n_active clamping keeps counts exact
    big = jnp.iinfo(key.dtype).max
    key2 = jnp.where(active, key, big)
    # the payload carries activity in its high range so actives precede
    # inactives among equal (sentinel-colliding) keys
    perm = jnp.arange(cap, dtype=jnp.int32)
    perm2 = jnp.where(active, perm, perm + cap)
    sorted_keys, sorted_perm2 = jax.lax.sort(
        [key2, perm2], is_stable=False, num_keys=2
    )
    sorted_perm = jnp.where(
        sorted_perm2 >= cap, sorted_perm2 - cap, sorted_perm2)
    n_active = jnp.sum(active.astype(jnp.int32))
    idx = jnp.arange(cap, dtype=jnp.int32)
    sorted_keys = jnp.where(idx < n_active, sorted_keys, big)
    return sorted_keys, sorted_perm, n_active


def probe_join_index(
    sorted_keys: jax.Array,
    n_active: jax.Array,
    probe_key: jax.Array,
    probe_valid: Optional[jax.Array],
    probe_sel: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Per probe row: (first match position, match count) in the build
    sort.

    Implemented by CO-SORTING probe keys with the (already sorted) build
    keys and propagating per-segment build counts with scans — random
    gathers (binary search) are far slower than one more bitonic sort on
    TPU, so the probe, like everything else here, is a sort + scans.
    """
    nb = sorted_keys.shape[0]
    npr = probe_key.shape[0]
    pk = probe_key.astype(sorted_keys.dtype)
    keys_cat = jnp.concatenate([sorted_keys, pk])
    # tag packed into the payload (2-operand sorts compile much faster):
    # build rows carry [0, nb), probe rows [nb, nb+npr) — ordering build
    # first among equal keys for free
    combo = jnp.arange(nb + npr, dtype=jnp.int32)
    sk, scombo = jax.lax.sort(
        [keys_cat, combo], is_stable=False, num_keys=2)
    stag = (scombo >= nb).astype(jnp.int32)
    sidx = scombo

    # segment boundaries on the sorted keys
    change = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]])
    # builds before each position (exclusive) and per-segment totals
    is_build = (stag == 0).astype(jnp.int32)
    b_incl = jnp.cumsum(is_build)
    b_excl = b_incl - is_build
    seg_id = jnp.cumsum(change.astype(jnp.int32)) - 1
    # builds before the segment = min over segment of b_excl == b_excl at
    # segment start; propagate via a running max of (start-flagged) value
    start_val = jnp.where(change, b_excl, -1)
    seg_first = jax.lax.associative_scan(jnp.maximum, start_val)
    # builds inside the segment up to the end: total builds in segment =
    # (b_incl at segment end) - seg_first; propagate segment totals
    # backwards via reverse max of end-flagged b_incl
    is_end = jnp.concatenate([change[1:], jnp.ones((1,), jnp.bool_)])
    end_val = jnp.where(is_end, b_incl, jnp.iinfo(jnp.int32).max)
    seg_end_b = jax.lax.associative_scan(
        jnp.minimum, end_val[::-1])[::-1]

    first_sorted = jnp.minimum(seg_first, n_active).astype(jnp.int32)
    count_sorted = (jnp.minimum(seg_end_b, n_active)
                    .astype(jnp.int32) - first_sorted)

    # scatter results back to probe-row positions
    probe_pos = jnp.where(stag == 1, sidx - nb, npr)
    first = (jnp.zeros((npr,), jnp.int32)
             .at[probe_pos].set(first_sorted, mode="drop"))
    count = (jnp.zeros((npr,), jnp.int32)
             .at[probe_pos].set(count_sorted, mode="drop"))
    ok = probe_sel if probe_valid is None else jnp.logical_and(
        probe_sel, probe_valid)
    count = jnp.where(ok, count, 0)
    return first, count


def build_join_index_presorted(
    key: jax.Array, valid: Optional[jax.Array], sel: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MergeJoin build index: input already ASCENDING on the key (nulls
    anywhere — they are unmatchable and packed out). No lax.sort: usable
    rows are front-packed with a ``nonzero`` gather, preserving their
    sorted order (velox/exec/MergeJoinSource analog — sortedness is the
    plan's contract, exec/MergeJoin.h:47). Same return contract as
    :func:`build_join_index`.
    """
    cap = sel.shape[0]
    if key.dtype not in (jnp.int32, jnp.int64):
        key = key.astype(jnp.int64)
    active = sel if valid is None else jnp.logical_and(sel, valid)
    from velox_tpu.ops.sort import pack_indices

    perm = pack_indices(active)
    n_active = jnp.sum(active.astype(jnp.int32))
    big = jnp.iinfo(key.dtype).max
    idx = jnp.arange(cap, dtype=jnp.int32)
    sorted_keys = jnp.where(
        idx < n_active, jnp.take(key, perm, mode="clip"), big)
    return sorted_keys, perm, n_active


def probe_join_index_presorted(
    sorted_keys: jax.Array,
    n_active: jax.Array,
    probe_key: jax.Array,
    probe_valid: Optional[jax.Array],
    probe_sel: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """MergeJoin probe: binary search instead of a co-sort. With both
    sides sorted this is the classic merge — per probe key the matching
    build run is [searchsorted-left, searchsorted-right), clamped to
    ``n_active`` so sentinel-colliding max keys stay exact."""
    pk = probe_key.astype(sorted_keys.dtype)
    first = jnp.searchsorted(sorted_keys, pk, side="left").astype(
        jnp.int32)
    last = jnp.searchsorted(sorted_keys, pk, side="right").astype(
        jnp.int32)
    first = jnp.minimum(first, n_active)
    count = jnp.maximum(jnp.minimum(last, n_active) - first, 0)
    ok = probe_sel if probe_valid is None else jnp.logical_and(
        probe_sel, probe_valid)
    count = jnp.where(ok, count, 0)
    return first, count


def _rank_in_sorted(pk: jax.Array, bk: jax.Array, side: str,
                    key_range=None) -> jax.Array:
    """For every bk[i], the count of pk entries < it (side="left") or
    <= it (side="right") — searchsorted semantics via ONE bitonic sort
    of the concatenation: a build element's merged position minus its
    build rank IS its probe rank. A tag in the sort key breaks value
    ties per side (left: build sorts before equal probe; right:
    after); the id lane doubles as a strictly-increasing tie-break so
    no is_stable flag is needed.

    With host ``key_range`` (the build codec's (lo, hi) stats) and a
    span under 2^29, (value, tag) packs into ONE int32 key: probe
    values clamp to [lo-1, hi+1] first — out-of-range values keep
    their order relative to every build key, and equal-value probe
    swaps cannot change any build key's probe-count."""
    npr, nb = pk.shape[0], bk.shape[0]
    n = npr + nb
    tag_probe = 1 if side == "left" else 0
    ids = jnp.arange(n, dtype=jnp.int32)
    if key_range is not None:
        lo, hi = key_range
        if (hi - lo + 3) * 2 < (1 << 31) - 2:
            lo1 = lo - 1
            pk2 = (jnp.clip(pk, lo1, hi + 1) - lo1).astype(jnp.int32)
            bk2 = (jnp.clip(bk.astype(pk.dtype), lo1, hi + 1)
                   - lo1).astype(jnp.int32)
            vals = jnp.concatenate(
                [pk2 * 2 + tag_probe, bk2 * 2 + (1 - tag_probe)])
            _, sid = jax.lax.sort([vals, ids], num_keys=2)
            pos_of = jnp.zeros((n,), jnp.int32).at[sid].set(
                jnp.arange(n, dtype=jnp.int32), unique_indices=True)
            return pos_of[npr:] - jnp.arange(nb, dtype=jnp.int32)
    vals = jnp.concatenate([pk, bk.astype(pk.dtype)])
    tag = jnp.concatenate([
        jnp.full((npr,), tag_probe, jnp.int32),
        jnp.full((nb,), 1 - tag_probe, jnp.int32)])
    _, _, sid = jax.lax.sort([vals, tag, ids], num_keys=3)
    pos_of = jnp.zeros((n,), jnp.int32).at[sid].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return pos_of[npr:] - jnp.arange(nb, dtype=jnp.int32)


def probe_join_index_merge(
    sorted_keys: jax.Array,
    n_active: jax.Array,
    probe_key: jax.Array,
    probe_valid: Optional[jax.Array],
    probe_sel: jax.Array,
    key_range=None,
) -> Tuple[jax.Array, jax.Array]:
    """Flipped merge probe: requires the probe KEY LANE itself ascending
    (the merge-join plan contract; callers verify on device and fall
    back to :func:`probe_join_index_presorted` otherwise).

    Instead of binary-searching every probe row into the build table
    (log2(build) rounds of probe-width gathers — the measured Q18/Q3
    probe hotspot at ~150-180ms per 6M-row batch), search each BUILD key
    into the probe array (build-width — tiny), then reconstruct per-probe
    (first, count) with a difference array + prefix sums at probe width:
    two small scatters whose cost scales with the BUILD width, one i32
    cumsum, one i32 cummax. The classic sort-merge interval inversion."""
    nb = sorted_keys.shape[0]
    npr = probe_key.shape[0]
    pk = probe_key.astype(sorted_keys.dtype)
    bi = jnp.arange(nb, dtype=jnp.int32)
    act = bi < n_active
    # each build key's matching probe run [pl, pr)
    if npr >= (1 << 20):
        # searchsorted lowers to log2(npr) DEPENDENT gather rounds
        # (~750ms at 4.2M-into-8.4M on v5e); at multi-M widths one
        # bitonic sort of the concatenation ranks every build key in
        # a single pass (~5x, measured) — the sort-merge rank trick
        pl = _rank_in_sorted(pk, sorted_keys, "left", key_range)
        pr = _rank_in_sorted(pk, sorted_keys, "right", key_range)
    else:
        pl = jnp.searchsorted(pk, sorted_keys,
                              side="left").astype(jnp.int32)
        pr = jnp.searchsorted(pk, sorted_keys,
                              side="right").astype(jnp.int32)
    pl = jnp.where(act, pl, npr)
    pr = jnp.where(act, pr, npr)
    one = act.astype(jnp.int32)
    delta = (jnp.zeros((npr + 1,), jnp.int32)
             .at[pl].add(one, mode="drop")
             .at[pr].add(-one, mode="drop"))
    count = jnp.cumsum(delta)[:npr]
    # first build position of the run serving each probe row: duplicate
    # build keys share pl, scatter-min keeps the run head; build indices
    # increase with probe position, so a forward cummax fills the runs
    fm = (jnp.full((npr + 1,), -1, jnp.int32)
          .at[pl].max(jnp.where(act, bi, -1), mode="drop"))
    # max of run == last duplicate; recover the head by count: the run
    # [first, first+count) ends at the scattered max + 1
    ff = jax.lax.cummax(fm[:npr])
    first = jnp.maximum(ff + 1 - count, 0)
    ok = probe_sel if probe_valid is None else jnp.logical_and(
        probe_sel, probe_valid)
    count = jnp.where(ok, count, 0)
    return first, count


def probe_join_index_merge_repair(
    sorted_keys: jax.Array,
    n_active: jax.Array,
    probe_key: jax.Array,
    probe_valid: Optional[jax.Array],
    probe_sel: jax.Array,
    key_range=None,
) -> Tuple[jax.Array, jax.Array]:
    """Flipped merge probe for lanes whose VALID subsequence is
    ascending but whose inactive slots hold arbitrary values (batch
    tails padded to capacity, null rows): forward-fill inactive slots
    with the running max (one cummax) so the lane becomes globally
    monotone, then run the ordinary flipped probe — repaired slots can
    shift run boundaries only onto rows the final sel/valid mask drops.
    This is the partial-batch case the raw ascending check rejects
    (the SF2 Q18 regression: a 3.6M-row tail batch in an 8.4M lane).

    The repair requires active rows to be a PREFIX of the lane (the
    classifier only returns the repair code for that shape): the
    suffix fills with the dtype max, keeping the lane monotone with
    purely elementwise ops — the axon remote compiler SIGSEGVs on
    64-bit lax.cummax at multi-M widths, so no scan appears here."""
    ok = probe_sel if probe_valid is None else jnp.logical_and(
        probe_sel, probe_valid)
    cnt = jnp.sum(ok.astype(jnp.int32))
    idx = jnp.arange(probe_key.shape[0], dtype=jnp.int32)
    # cast to the BUILD key lane dtype BEFORE filling: int64-max would
    # wrap to -1 under the core's astype(sorted_keys.dtype) and land
    # the filler BELOW every real key, corrupting the run boundaries
    pk = probe_key.astype(sorted_keys.dtype)
    hi = jnp.iinfo(pk.dtype).max
    repaired = jnp.where(idx < cnt, pk, hi)
    return probe_join_index_merge(
        sorted_keys, n_active, repaired, probe_valid, probe_sel,
        key_range)


def valid_ascending_code(values: jax.Array, ok: Optional[jax.Array]
                         ) -> jax.Array:
    """0 = unsorted, 1 = active rows are a PREFIX whose values ascend
    (suffix-fill repair applies), 2 = raw lane ascending. One scalar
    for a single replayable fetch. Elementwise only — see
    probe_join_index_merge_repair for why no cummax."""
    asc_pairs = values[1:] >= values[:-1]
    raw = jnp.all(asc_pairs)
    if ok is None:
        return jnp.where(raw, jnp.int32(2), jnp.int32(0))
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    cnt = jnp.sum(ok.astype(jnp.int32))
    is_prefix = jnp.all(ok == (idx < cnt))
    asc_prefix = jnp.all(
        jnp.where(idx[:-1] < cnt - 1, asc_pairs, True))
    fixable = jnp.logical_and(is_prefix, asc_prefix)
    return jnp.where(raw, jnp.int32(2),
                     jnp.where(fixable, jnp.int32(1), jnp.int32(0)))


def build_join_table(
    sorted_keys: jax.Array, n_active: jax.Array, lo: int, span: int
) -> Tuple[jax.Array, jax.Array]:
    """Direct-address (kArray) join index over a host-known key range
    ``[lo, lo+span)`` — velox HashMode::kArray (velox/exec/
    HashTable.cpp:470-520 mode selection by VectorHasher range stats).

    ``tfirst[v-lo]`` = first position of value ``v`` in the sorted build
    order, ``tcount[v-lo]`` = run length. The probe then costs two
    gathers instead of a binary search (searchsorted lowers to a
    log2(n)-step scan of full-width gathers on TPU — ~1.3s at 8M x 2M,
    the measured Q3 merge-probe hotspot; gathers are ~60ms).
    """
    cap = sorted_keys.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    in_tab = jnp.logical_and(
        idx < n_active,
        jnp.logical_and(sorted_keys >= lo, sorted_keys < lo + span))
    off = jnp.where(in_tab, sorted_keys - lo, span).astype(jnp.int32)
    tfirst = (jnp.full((span,), cap, jnp.int32)
              .at[off].min(idx, mode="drop"))
    tcount = (jnp.zeros((span,), jnp.int32)
              .at[off].add(1, mode="drop"))
    return tfirst, tcount


def probe_join_table(
    tfirst: jax.Array,
    tcount: jax.Array,
    lo: int,
    probe_key: jax.Array,
    probe_valid: Optional[jax.Array],
    probe_sel: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """kArray probe: two gathers. Same (first, count) contract as
    :func:`probe_join_index`; out-of-range probe keys cannot match."""
    span = tfirst.shape[0]
    off = probe_key.astype(jnp.int64) - lo if probe_key.dtype == jnp.int64 \
        else probe_key.astype(jnp.int32) - jnp.int32(lo)
    in_range = jnp.logical_and(off >= 0, off < span)
    o32 = jnp.where(in_range, off, 0).astype(jnp.int32)
    first = jnp.take(tfirst, o32, mode="clip")
    count = jnp.take(tcount, o32, mode="clip")
    ok = probe_sel if probe_valid is None else jnp.logical_and(
        probe_sel, probe_valid)
    ok = jnp.logical_and(ok, in_range)
    count = jnp.where(ok, count, 0)
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
    emit = emit.astype(jnp.int32)
    offsets = jnp.cumsum(emit) - emit            # exclusive prefix sum
    total = offsets[-1] + emit[-1]

    j = jnp.arange(out_cap, dtype=jnp.int32)
    n_probe = first.shape[0]
    if out_cap * 8 <= n_probe:
        # selective join (few output rows from a wide probe): the
        # scatter below costs by its PROBE-width updates (~0.5s at 6M on
        # the tunneled v5e) — binary-search the small output ordinal
        # space into the monotone run-end array instead: log2(probe)
        # rounds of out_cap-wide gathers
        ends = offsets + emit
        probe_rows = jnp.searchsorted(ends, j, side="right").astype(
            jnp.int32)
        probe_rows = jnp.minimum(probe_rows, n_probe - 1)
    else:
        # out row j -> probe row: scatter each emitting probe row's
        # index at its first output slot, then forward-propagate with a
        # max-scan — scans, not binary search (row indices are
        # increasing along heads)
        heads = jnp.where(emit > 0, offsets, jnp.int32(out_cap))
        row_at_head = (
            jnp.full((out_cap,), -1, jnp.int32)
            .at[heads].max(jnp.arange(n_probe, dtype=jnp.int32),
                           mode="drop"))
        probe_rows = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, row_at_head), 0)
    ordinal = j - jnp.take(offsets, probe_rows, mode="clip")
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
