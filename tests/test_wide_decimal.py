"""Long-decimal (int128) digit-split lanes vs a Python-int oracle.

velox computes DECIMAL(p>18) on int128 (velox/type/HugeInt.h,
DecimalUtil.h); this engine shreds wide columns into three signed-digit
int64 lanes at ingest (types/widedec.py, io/catalog.py
shred_wide_decimals) — ingest, sum/avg/min/max/count, and comparisons
must be EXACT. Narrow decimal columns must keep the single-lane path.
"""

import decimal

_CTX = decimal.Context(prec=60)
import random
from collections import defaultdict

import pyarrow as pa
import pytest

from velox_tpu.exec import run_plan
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.io.catalog import get_table
from velox_tpu.plan import PlanBuilder

D = decimal.Decimal
SCALE = 10


def _dataset(n=600, mag=10 ** 34, seed=5):
    rng = random.Random(seed)
    ks = [rng.randrange(5) for _ in range(n)]
    raw = [None if rng.random() < 0.05 else rng.randrange(-mag, mag)
           for _ in range(n)]
    vals = [None if r is None else D(r).scaleb(-SCALE, _CTX) for r in raw]
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "x": pa.array(vals, pa.decimal128(38, SCALE))})
    return t, ks, raw


@pytest.fixture()
def wide_table():
    t, ks, raw = _dataset()
    register_arrow("widec_t", t, 128)
    yield ks, raw
    drop_table("widec_t")


def test_ingest_shreds_and_roundtrips(wide_table):
    ks, raw = wide_table
    tab = get_table("widec_t")
    assert "x" in (tab.wide_groups or {})
    out = run_plan(PlanBuilder().table_scan("widec_t").build())
    got = out.to_pydict()
    assert out.schema.field("x").type == pa.decimal128(38, SCALE)
    for g, r in zip(got["x"], raw):
        if r is None:
            assert g is None
        else:
            assert int(g.scaleb(SCALE, _CTX)) == r


def test_wide_aggregates_match_python_ints(wide_table):
    ks, raw = wide_table
    plan = (PlanBuilder().table_scan("widec_t")
            .aggregate(["k"], ["sum(x) AS s", "min(x) AS lo",
                               "max(x) AS hi", "avg(x) AS a",
                               "count(x) AS c"])
            .order_by(["k"]).build())
    got = run_plan(plan).to_pydict()
    groups = defaultdict(list)
    for k, r in zip(ks, raw):
        if r is not None:
            groups[k].append(r)
    assert got["k"] == sorted(groups)
    for i, k in enumerate(got["k"]):
        g = groups[k]
        assert int(got["s"][i].scaleb(SCALE, _CTX)) == sum(g), k
        assert int(got["lo"][i].scaleb(SCALE, _CTX)) == min(g), k
        assert int(got["hi"][i].scaleb(SCALE, _CTX)) == max(g), k
        tot = sum(g)
        sgn = -1 if tot < 0 else 1
        exp_avg = sgn * ((2 * abs(tot) + len(g)) // (2 * len(g)))
        assert int(got["a"][i].scaleb(SCALE, _CTX)) == exp_avg, k
        assert got["c"][i] == len(g)


def test_wide_partial_final_aggregation(wide_table):
    ks, raw = wide_table
    plan = (PlanBuilder().table_scan("widec_t")
            .partial_aggregation(["k"], ["sum(x) AS s", "min(x) AS lo"])
            .final_aggregation().order_by(["k"]).build())
    got = run_plan(plan).to_pydict()
    groups = defaultdict(list)
    for k, r in zip(ks, raw):
        if r is not None:
            groups[k].append(r)
    for i, k in enumerate(got["k"]):
        assert int(got["s"][i].scaleb(SCALE, _CTX)) == sum(groups[k]), k
        assert int(got["lo"][i].scaleb(SCALE, _CTX)) == min(groups[k]), k


def test_wide_comparisons(wide_table):
    ks, raw = wide_table
    cut = D(3).scaleb(23)  # 3e23 in value space
    cut_raw = int(cut.scaleb(SCALE, _CTX))
    for op, pred in [
        ("gt", lambda r: r > cut_raw),
        ("lte", lambda r: r <= cut_raw),
        ("eq", lambda r: r == cut_raw),
    ]:
        sym = {"gt": ">", "lte": "<=", "eq": "="}[op]
        plan = (PlanBuilder().table_scan("widec_t")
                .filter(f"x {sym} 300000000000000000000000.0")
                .aggregate([], ["count(*) AS c"]).build())
        got = run_plan(plan).to_pydict()
        exp = sum(1 for r in raw if r is not None and pred(r))
        assert got["c"][0] == (exp if exp else None) or \
            got["c"][0] == exp, (op, got["c"], exp)


def test_sum_overflow_beyond_p38_is_null():
    t, ks, raw = _dataset(n=400, mag=10 ** 37, seed=7)
    register_arrow("widec_big", t, 128)
    try:
        got = run_plan(
            PlanBuilder().table_scan("widec_big")
            .aggregate([], ["sum(x) AS s"]).build()).to_pydict()
    finally:
        drop_table("widec_big")
    tot = sum(r for r in raw if r is not None)
    if abs(tot) >= 10 ** 38:
        assert got["s"][0] is None
    else:
        assert int(got["s"][0].scaleb(SCALE, _CTX)) == tot


def test_narrow_decimals_keep_single_lane():
    vals = [D("12.34"), D("-5.00"), None]
    t = pa.table({"y": pa.array(vals, pa.decimal128(20, 2))})
    register_arrow("widec_narrow", t, 128)
    try:
        tab = get_table("widec_narrow")
        assert not (tab.wide_groups or {})
        got = run_plan(
            PlanBuilder().table_scan("widec_narrow").build()).to_pydict()
        assert got["y"] == [D("12.34"), D("-5.00"), None]
    finally:
        drop_table("widec_narrow")
