"""Kernel-layer tests: sort keys, sort/top-n, group-by, join probe, hash.

Mirrors the reference's per-layer unit-test style
(velox/exec/tests/HashTableTest.cpp, PrefixSortTest.cpp) with numpy oracles.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from velox_tpu.ops.sortkey import encode_sort_key
from velox_tpu.ops.sort import sort_indices, top_n_indices, compact_indices
from velox_tpu.ops.groupby import group_ids_sorted, group_ids_array
from velox_tpu.ops.join import (
    build_join_index, probe_join_index, match_total, expand_matches,
    build_matched_flags, pack_normalized_key,
)
from velox_tpu.ops.hash import hash_columns, partition_ids


# ------------------------------------------------------------------ sortkey

def test_float_key_order_preserved():
    vals = np.array([-np.inf, -2.5, -0.0, 0.0, 1.5, np.inf, np.nan])
    for dt in (np.float32, np.float64):
        keys = encode_sort_key(jnp.asarray(vals.astype(dt)), None)[0]
        keys = np.asarray(keys)
        # strictly increasing except the -0.0/0.0 pair
        assert keys[0] < keys[1] < keys[2] <= keys[3] < keys[4] < keys[5]
        assert keys[6] > keys[5]  # NaN sorts greatest (Presto)


def test_descending_inverts():
    vals = jnp.asarray(np.array([3, 1, 2], dtype=np.int64))
    asc = np.asarray(encode_sort_key(vals, None)[0])
    desc = np.asarray(encode_sort_key(vals, None, descending=True)[0])
    assert (np.argsort(asc) == np.argsort(-desc)).all()


# --------------------------------------------------------------------- sort

def test_sort_multi_key_with_padding_and_nulls():
    # capacity 8, 6 active rows
    a = jnp.asarray(np.array([2, 1, 2, 1, 2, 1, 9, 9], dtype=np.int64))
    b = jnp.asarray(np.array([1.0, 5.0, 3.0, 2.0, 2.0, 5.0, 0, 0]))
    bval = jnp.asarray(np.array([1, 1, 0, 1, 1, 1, 0, 0], dtype=bool))
    sel = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 0, 0], dtype=bool))
    # ORDER BY a ASC, b DESC NULLS LAST
    perm = np.asarray(sort_indices(
        [(a, None, False, False), (b, bval, True, False)], sel))
    # active rows come first
    assert set(perm[:6]) == {0, 1, 2, 3, 4, 5}
    # a=1 rows: (1,5.0),(3,2.0),(5,5.0) -> desc b: rows {1,5} then 3
    assert set(perm[:2]) == {1, 5} and perm[2] == 3
    # a=2 rows: (0,1.0),(2,null),(4,2.0) -> desc, nulls last: 4,0,2
    assert list(perm[3:6]) == [4, 0, 2]


def test_top_n():
    a = jnp.asarray(np.array([5, 3, 9, 1, 7, 0, 0, 0], dtype=np.int64))
    sel = jnp.asarray(np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=bool))
    idx, osel = top_n_indices([(a, None, False, False)], sel, 3)
    assert list(np.asarray(idx)) == [3, 1, 0]
    assert np.asarray(osel).all()


def test_top_n_fewer_rows_than_n():
    a = jnp.asarray(np.array([5, 3, 0, 0], dtype=np.int64))
    sel = jnp.asarray(np.array([1, 1, 0, 0], dtype=bool))
    idx, osel = top_n_indices([(a, None, False, False)], sel, 3)
    assert list(np.asarray(idx)[:2]) == [1, 0]
    assert list(np.asarray(osel)) == [True, True, False]


def test_compact():
    sel = jnp.asarray(np.array([0, 1, 0, 1, 1, 0], dtype=bool))
    perm = np.asarray(compact_indices(sel))
    assert list(perm[:3]) == [1, 3, 4]


# ------------------------------------------------------------------ groupby

def test_group_ids_sorted_basic():
    k = jnp.asarray(np.array([10, 20, 10, 30, 20, 10, 0, 0], dtype=np.int64))
    sel = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 0, 0], dtype=bool))
    gids, group_rows, group_sel, n = group_ids_sorted([(k, None)], sel)
    gids, group_rows, group_sel, n = map(
        np.asarray, (gids, group_rows, group_sel, n))
    assert n == 3
    assert group_sel[:3].all() and not group_sel[3:].any()
    # rows with equal keys share gids
    assert gids[0] == gids[2] == gids[5]
    assert gids[1] == gids[4]
    assert len({gids[0], gids[1], gids[3]}) == 3
    # inactive rows got the drop sentinel
    assert (gids[6:] == 8).all()
    # group_rows point at rows carrying each group's key
    keys_of_groups = sorted(np.asarray(k)[group_rows[:3]].tolist())
    assert keys_of_groups == [10, 20, 30]


def test_group_ids_sorted_null_key_groups_together():
    k = jnp.asarray(np.array([1, 7, 1, 9], dtype=np.int64))
    valid = jnp.asarray(np.array([1, 0, 1, 0], dtype=bool))
    sel = jnp.ones(4, dtype=bool)
    gids, _, _, n = group_ids_sorted([(k, valid)], sel)
    gids = np.asarray(gids)
    assert int(n) == 2
    assert gids[1] == gids[3]  # both nulls one group despite 7 != 9
    assert gids[0] == gids[2] != gids[1]


def test_group_ids_sorted_no_keys_global_agg():
    sel = jnp.asarray(np.array([1, 1, 0, 1], dtype=bool))
    gids, _, _, n = group_ids_sorted([], sel)
    gids = np.asarray(gids)
    assert int(n) == 1
    assert (gids[[0, 1, 3]] == 0).all() and gids[2] == 4


def test_group_ids_array_mode():
    v1 = jnp.asarray(np.array([0, 1, 0, 2], dtype=np.int32))
    v2 = jnp.asarray(np.array([1, 0, 1, 1], dtype=np.int32))
    sel = jnp.asarray(np.array([1, 1, 1, 0], dtype=bool))
    gids = np.asarray(group_ids_array([v1, v2], [3, 2], sel, 6))
    assert gids[0] == gids[2] == 3   # 0 + 1*3
    assert gids[1] == 1
    assert gids[3] == 6              # sentinel


# --------------------------------------------------------------------- join

def _join_oracle(build, probe):
    out = []
    for pi, pk in enumerate(probe):
        for bi, bk in enumerate(build):
            if pk is not None and bk is not None and pk == bk:
                out.append((pi, bi))
    return sorted(out)


def test_join_inner_with_duplicates():
    bk = jnp.asarray(np.array([1, 2, 2, 3, 0, 0], dtype=np.int64))
    bsel = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], dtype=bool))
    pk = jnp.asarray(np.array([2, 5, 1, 2, 0, 0], dtype=np.int64))
    psel = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], dtype=bool))

    skeys, perm, n_active = build_join_index(bk, None, bsel)
    first, count = probe_join_index(skeys, n_active, pk, None, psel)
    total = int(match_total(count))
    assert total == 5
    pr, br, matched, osel = expand_matches(first, count, perm, 8)
    got = sorted(
        (int(p), int(b))
        for p, b, ok in zip(np.asarray(pr), np.asarray(br), np.asarray(osel))
        if ok)
    oracle = _join_oracle([1, 2, 2, 3], [2, 5, 1, 2])
    assert got == oracle


def test_join_left_outer_and_matched_flags():
    bk = jnp.asarray(np.array([1, 3, 0, 0], dtype=np.int64))
    bsel = jnp.asarray(np.array([1, 1, 0, 0], dtype=bool))
    pk = jnp.asarray(np.array([1, 2, 0, 0], dtype=np.int64))
    psel = jnp.asarray(np.array([1, 1, 0, 0], dtype=bool))

    skeys, perm, n_active = build_join_index(bk, None, bsel)
    first, count = probe_join_index(skeys, n_active, pk, None, psel)
    total = int(match_total(count, emit_unmatched=psel))
    assert total == 2
    pr, br, matched, osel = expand_matches(
        first, count, perm, 4, emit_unmatched=psel)
    rows = [
        (int(p), int(b), bool(m))
        for p, b, m, ok in zip(
            np.asarray(pr), np.asarray(br), np.asarray(matched),
            np.asarray(osel))
        if ok]
    assert (0, 0, True) in rows
    assert any(p == 1 and not m for p, _, m in rows)
    flags = np.asarray(build_matched_flags(4, br, matched, osel))
    assert flags[0] and not flags[1]


def test_join_null_keys_never_match():
    bk = jnp.asarray(np.array([1, 1], dtype=np.int64))
    bvalid = jnp.asarray(np.array([1, 0], dtype=bool))
    bsel = jnp.ones(2, dtype=bool)
    pk = jnp.asarray(np.array([1, 1], dtype=np.int64))
    pvalid = jnp.asarray(np.array([1, 0], dtype=bool))
    psel = jnp.ones(2, dtype=bool)
    skeys, perm, n_active = build_join_index(bk, bvalid, bsel)
    first, count = probe_join_index(skeys, n_active, pk, pvalid, psel)
    assert int(match_total(count)) == 1  # only the valid-valid pair


def test_join_int64_max_key_exact():
    m = np.iinfo(np.int64).max
    bk = jnp.asarray(np.array([m, 5, 0], dtype=np.int64))
    bsel = jnp.asarray(np.array([1, 1, 0], dtype=bool))
    pk = jnp.asarray(np.array([m, 0, 0], dtype=np.int64))
    psel = jnp.asarray(np.array([1, 0, 0], dtype=bool))
    skeys, perm, n_active = build_join_index(bk, None, bsel)
    first, count = probe_join_index(skeys, n_active, pk, None, psel)
    assert int(match_total(count)) == 1


def test_pack_normalized_key():
    v1 = jnp.asarray(np.array([1, 2], dtype=np.int32))
    v2 = jnp.asarray(np.array([3, 0], dtype=np.int32))
    k = np.asarray(pack_normalized_key([v1, v2], [4, 4]))
    assert k[0] == 1 | (3 << 4)
    assert k[1] == 2


# --------------------------------------------------------------------- hash

def test_hash_partition_stability_and_spread():
    x = jnp.asarray(np.arange(1000, dtype=np.int64))
    h = hash_columns([(x, None)])
    p = np.asarray(partition_ids(h, 8))
    counts = np.bincount(p, minlength=8)
    assert (counts > 60).all()  # roughly uniform
    # deterministic
    p2 = np.asarray(partition_ids(hash_columns([(x, None)]), 8))
    assert (p == p2).all()


def test_hash_equal_values_equal_hashes_float():
    x = jnp.asarray(np.array([0.0, -0.0, np.nan, np.nan]))
    h = np.asarray(hash_columns([(x, None)]))
    assert h[0] == h[1] and h[2] == h[3]


def test_pallas_grouped_sum_interpret():
    """MXU one-hot grouped-sum kernel (interpret mode on CPU)."""
    from velox_tpu.ops.pallas_agg import grouped_sum_i32

    rng = np.random.default_rng(9)
    n, G = 100_000, 12
    gids = rng.integers(0, G + 1, n).astype(np.int32)  # incl. sentinel
    vals = rng.integers(-10_500_000, 10_500_000, n).astype(np.int32)
    got = np.asarray(grouped_sum_i32(
        jnp.asarray(gids), jnp.asarray(vals), G, interpret=True))
    exp = np.array([vals[gids == g].sum() for g in range(G)],
                   dtype=np.int64)
    assert (got == exp).all()


def test_rank_in_sorted_matches_searchsorted():
    """The bitonic-sort rank trick must agree with searchsorted on
    both sides, duplicates and padding included (ops/join.py
    _rank_in_sorted — the large-lane merge-probe path)."""
    import numpy as np

    from velox_tpu.ops.join import _rank_in_sorted

    rng = np.random.default_rng(7)
    for npr, nb in ((1 << 12, 300), (2048, 2048), (512, 1 << 11)):
        pk = np.sort(rng.integers(0, 500, npr)).astype(np.int64)
        bk = np.sort(rng.integers(0, 500, nb)).astype(np.int64)
        bk[-5:] = np.iinfo(np.int64).max  # padding filler
        bk = np.sort(bk)
        for key_range in (None, (0, 499)):
            pl = np.asarray(_rank_in_sorted(
                jnp.asarray(pk), jnp.asarray(bk), "left", key_range))
            pr = np.asarray(_rank_in_sorted(
                jnp.asarray(pk), jnp.asarray(bk), "right", key_range))
            assert (pl == np.searchsorted(pk, bk, side="left")).all()
            assert (pr == np.searchsorted(pk, bk,
                                          side="right")).all()
