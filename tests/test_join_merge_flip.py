"""Flipped merge probe (ops/join.py probe_join_index_merge) and the
small-output binary-search path of expand_matches.

Both are TPU latency redesigns of velox's merge join / listJoinResults
(velox/exec/MergeJoin.h:47, velox/exec/HashTable.h listJoinResults):
build-width searches + probe-width prefix sums instead of probe-width
binary search, and ordinal binary search instead of a probe-width
scatter when the output is small.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from velox_tpu.ops.join import (
    build_join_index_presorted, expand_matches, match_total,
    probe_join_index_merge, probe_join_index_presorted,
)


def _ref_first_count(build_keys, probe_keys):
    first, count = [], []
    for p in probe_keys:
        lo = np.searchsorted(build_keys, p, side="left")
        hi = np.searchsorted(build_keys, p, side="right")
        first.append(lo)
        count.append(hi - lo)
    return np.array(first), np.array(count)


@pytest.mark.parametrize("dup_build", [False, True])
@pytest.mark.parametrize("dup_probe", [False, True])
def test_merge_flip_matches_binary_search(dup_build, dup_probe):
    rng = np.random.default_rng(3)
    bk = np.sort(rng.integers(0, 60, 40))
    if not dup_build:
        bk = np.unique(bk)
    pk = np.sort(rng.integers(-5, 70, 300))
    if not dup_probe:
        pk = np.unique(pk)
    nb_cap = 64
    sel = np.zeros(nb_cap, bool)
    sel[: len(bk)] = True
    keys = np.full(nb_cap, 0, np.int64)
    keys[: len(bk)] = bk
    sorted_keys, perm, n_active = build_join_index_presorted(
        jnp.asarray(keys), None, jnp.asarray(sel))
    psel = jnp.ones((len(pk),), jnp.bool_)
    f1, c1 = probe_join_index_presorted(
        sorted_keys, n_active, jnp.asarray(pk), None, psel)
    f2, c2 = probe_join_index_merge(
        sorted_keys, n_active, jnp.asarray(pk), None, psel)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    # first only meaningful where count > 0
    m = np.asarray(c1) > 0
    assert np.array_equal(np.asarray(f1)[m], np.asarray(f2)[m])
    rf, rc = _ref_first_count(bk, pk)
    assert np.array_equal(np.asarray(c2), rc)
    assert np.array_equal(np.asarray(f2)[m], rf[m])


def test_merge_flip_respects_sel_and_valid():
    bk = jnp.asarray(np.array([2, 4, 4, 9], np.int64))
    sel = jnp.ones((4,), jnp.bool_)
    sorted_keys, perm, n_active = build_join_index_presorted(
        bk, None, sel)
    pk = jnp.asarray(np.array([1, 2, 4, 4, 9, 12], np.int64))
    psel = jnp.asarray(np.array([1, 0, 1, 1, 1, 1], bool))
    pvalid = jnp.asarray(np.array([1, 1, 1, 0, 1, 1], bool))
    f, c = probe_join_index_merge(
        sorted_keys, n_active, pk, pvalid, psel)
    assert np.asarray(c).tolist() == [0, 0, 2, 0, 1, 0]
    assert int(f[2]) == 1 and int(f[4]) == 3


def test_merge_flip_empty_build():
    sorted_keys, perm, n_active = build_join_index_presorted(
        jnp.asarray(np.array([5], np.int64)), None,
        jnp.asarray(np.array([False])))
    pk = jnp.asarray(np.array([1, 5, 9], np.int64))
    f, c = probe_join_index_merge(
        sorted_keys, n_active, pk, None, jnp.ones((3,), jnp.bool_))
    assert np.asarray(c).tolist() == [0, 0, 0]


@pytest.mark.parametrize("outer", [False, True])
def test_expand_small_output_binary_search(outer):
    # probe width 4096 with out_cap 64 -> takes the searchsorted path
    npr = 4096
    first = np.zeros(npr, np.int32)
    count = np.zeros(npr, np.int32)
    # a few selective matches
    hits = [(7, 0, 2), (100, 2, 1), (4000, 3, 3)]
    for r, f, c in hits:
        first[r], count[r] = f, c
    # outer case: only a sparse selection emits unmatched rows (a left
    # join after a selective filter), keeping the output small enough
    # for the binary-search path
    sel = np.zeros(npr, bool)
    sel[[7, 100, 4000, 9, 2222]] = True
    emit = jnp.asarray(sel) if outer else None
    build_perm = jnp.arange(64, dtype=jnp.int32)
    total = int(match_total(jnp.asarray(count), emit))
    out_cap = 64
    assert out_cap * 8 <= npr
    pr, br, matched, osel = expand_matches(
        jnp.asarray(first), jnp.asarray(count), build_perm, out_cap,
        emit)
    pr, br = np.asarray(pr), np.asarray(br)
    matched, osel = np.asarray(matched), np.asarray(osel)
    assert osel.sum() == total
    # reference expansion
    ref = []
    for r in range(npr):
        c = count[r]
        if c > 0:
            ref += [(r, first[r] + k, True) for k in range(c)]
        elif outer and sel[r]:
            ref += [(r, None, False)]
    got = [(int(pr[j]), int(br[j]) if matched[j] else None,
            bool(matched[j])) for j in range(total)]
    assert got == ref


def test_merge_flip_repair_padded_tail():
    """probe_join_index_merge_repair: a probe lane ascending only on
    its VALID prefix (batch tail padded with zeros — the SF2 Q18
    shape) must match the binary-search probe exactly."""
    from velox_tpu.ops.join import (
        probe_join_index_merge_repair, valid_ascending_code,
    )

    rng = np.random.default_rng(7)
    bk = np.sort(rng.integers(0, 60, 40))
    pk_valid = np.sort(rng.integers(-5, 70, 300))
    cap = 512
    pk = np.zeros(cap, np.int64)            # zero padding breaks raw
    pk[:300] = pk_valid
    psel = np.zeros(cap, bool)
    psel[:300] = True
    nb_cap = 64
    sel = np.zeros(nb_cap, bool)
    sel[: len(bk)] = True
    keys = np.zeros(nb_cap, np.int64)
    keys[: len(bk)] = bk
    sorted_keys, perm, n_active = build_join_index_presorted(
        jnp.asarray(keys), None, jnp.asarray(sel))
    code = valid_ascending_code(jnp.asarray(pk), jnp.asarray(psel))
    assert int(code) == 1                    # repair path
    f1, c1 = probe_join_index_presorted(
        sorted_keys, n_active, jnp.asarray(pk), None,
        jnp.asarray(psel))
    f2, c2 = probe_join_index_merge_repair(
        sorted_keys, n_active, jnp.asarray(pk), None,
        jnp.asarray(psel))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    m = np.asarray(c1) > 0
    assert np.array_equal(np.asarray(f1)[m], np.asarray(f2)[m])
    # raw-ascending lane classifies as 2; interleaved garbage as 0
    full = np.sort(rng.integers(0, 99, cap))
    assert int(valid_ascending_code(
        jnp.asarray(full), jnp.ones(cap, bool))) == 2
    bad = pk.copy()
    bad[10] = 99999                          # valid slot out of order
    assert int(valid_ascending_code(
        jnp.asarray(bad), jnp.asarray(psel))) == 0


def test_merge_join_multi_batch_tail_equals_hash_join():
    """End-to-end: a merge join whose probe arrives as a full batch
    plus a padded tail batch must equal the hash join on the same
    data (the flip engages per batch: raw on the full one, repair on
    the tail)."""
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan_pydict
    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    rng = np.random.default_rng(11)
    n1, n2 = 256, 77                         # tail pads to capacity
    k1 = np.sort(rng.integers(0, 200, n1))
    k2 = np.sort(rng.integers(200, 400, n2))
    v1 = rng.integers(0, 10, n1)
    v2 = rng.integers(0, 10, n2)
    b1 = Batch.from_pydict(
        {"k": [int(x) for x in k1], "v": [int(x) for x in v1]},
        {"k": BIGINT, "v": BIGINT})
    b2 = Batch.from_pydict(
        {"k": [int(x) for x in k2], "v": [int(x) for x in v2]},
        {"k": BIGINT, "v": BIGINT})
    bk = np.unique(rng.integers(0, 400, 50))
    build = Batch.from_pydict(
        {"bk": [int(x) for x in bk],
         "bv": [int(x) for x in rng.integers(0, 5, len(bk))]},
        {"bk": BIGINT, "bv": BIGINT})

    def plan(method):
        right = PlanBuilder().values([build])
        pb = PlanBuilder().values([b1, b2])
        join = getattr(pb, method)
        return (join(right, ["k"], ["bk"], "inner",
                     output=["k", "v", "bv"])
                .aggregate([], ["count(*) as n", "sum(v) as sv",
                                "sum(bv) as sb"]).build())

    got = run_plan_pydict(plan("merge_join"))
    want = run_plan_pydict(plan("hash_join"))
    assert got == want
    assert got["n"][0] > 0
