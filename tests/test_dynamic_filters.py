"""Bloom/IN-set dynamic join filters (velox/exec/HashProbe.cpp:419-444;
velox/common/base/BloomFilter.h; build velox/exec/HashTable.cpp:1036).

Round-3 upgrade over the min/max-range-only pushdown: exact IN-tables
for small builds, per-probe-dictionary string sets, per-key filters on
multi-key joins, bloom bitmasks for large builds — and the push now
fires at build publication so the lazy parquet row-group pruner sees
it (scan splits realize lazily)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from velox_tpu.exec import run_plan, run_plan_pydict
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.io.catalog import get_table, register_parquet
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.vector.batch import Batch


def _probe_table(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": rng.integers(0, 1000, n),
        "s": rng.choice(["aa", "bb", "cc", "dd"], n),
        "v": np.round(rng.normal(size=n), 4),
    })


def test_in_set_filter_small_build():
    t = _probe_table()
    register_arrow("dyn_in", t, 512)
    build = Batch.from_pydict(
        {"bk": [5, 17, 300, 999], "w": [1.0, 2.0, 3.0, 4.0]},
        {"bk": BIGINT, "w": DOUBLE})
    plan = (PlanBuilder().table_scan("dyn_in", columns=["k", "v"])
            .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                       "inner", output=["k", "v", "w"])
            .order_by(["k", "v"]).build())
    try:
        out = run_plan_pydict(plan)
    finally:
        drop_table("dyn_in")
    df = t.to_pandas()
    exp = df.merge(pd.DataFrame(
        {"bk": [5, 17, 300, 999], "w": [1.0, 2.0, 3.0, 4.0]}),
        left_on="k", right_on="bk").sort_values(["k", "v"])
    assert out["k"] == exp.k.tolist()
    assert len(out["k"]) > 0


def test_two_key_join_with_string_dictionary_key():
    t = _probe_table(seed=1)
    register_arrow("dyn_2k", t, 512)
    build = Batch.from_pydict(
        {"bk": [5, 17, 300], "bs": ["aa", "cc", "aa"],
         "w": [1.0, 2.0, 3.0]},
        {"bk": BIGINT, "bs": VARCHAR, "w": DOUBLE})
    plan = (PlanBuilder().table_scan("dyn_2k", columns=["k", "s", "v"])
            .hash_join(PlanBuilder().values([build]), ["k", "s"],
                       ["bk", "bs"], "inner",
                       output=["k", "s", "v", "w"])
            .order_by(["k", "v"]).build())
    try:
        out = run_plan_pydict(plan)
    finally:
        drop_table("dyn_2k")
    df = t.to_pandas()
    exp = df.merge(pd.DataFrame(
        {"bk": [5, 17, 300], "bs": ["aa", "cc", "aa"],
         "w": [1.0, 2.0, 3.0]}),
        left_on=["k", "s"], right_on=["bk", "bs"]).sort_values(
        ["k", "v"])
    assert out["k"] == exp.k.tolist()
    assert out["s"] == exp.s.tolist()


def test_bloom_filter_large_build():
    rng = np.random.default_rng(2)
    t = _probe_table(seed=2)
    register_arrow("dyn_bloom", t, 512)
    # > _SET_PUSH_MAX distinct keys, mostly missing the probe domain
    bks = np.unique(rng.integers(0, 1_000_000, 9000))
    build = Batch.from_pydict(
        {"bk": bks.tolist(), "w": (bks * 0.5).tolist()},
        {"bk": BIGINT, "w": DOUBLE})
    plan = (PlanBuilder().table_scan("dyn_bloom", columns=["k", "v"])
            .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                       "inner", output=["k", "v", "w"])
            .order_by(["k", "v"]).build())
    try:
        out = run_plan_pydict(plan)
    finally:
        drop_table("dyn_bloom")
    df = t.to_pandas()
    exp = df.merge(pd.DataFrame({"bk": bks, "w": bks * 0.5}),
                   left_on="k", right_on="bk").sort_values(["k", "v"])
    assert out["k"] == exp.k.tolist()
    for a, b in zip(out["w"], exp.w):
        assert a == pytest.approx(b)


def test_rowgroups_skipped_by_dynamic_in_set(tmp_path):
    # parquet with k clustered so row groups have tight min/max spans
    n = 10_000
    t = pa.table({
        "k": pa.array(np.repeat(np.arange(10), n // 10)),
        "v": pa.array(np.arange(n, dtype=np.float64)),
    })
    path = str(tmp_path / "dyn.parquet")
    pq.write_table(t, path, row_group_size=n // 10)
    register_parquet("dyn_pq", path, lazy=True)
    build = Batch.from_pydict({"bk": [3, 7], "w": [0.5, 1.5]},
                              {"bk": BIGINT, "w": DOUBLE})
    plan = (PlanBuilder().table_scan("dyn_pq", columns=["k", "v"])
            .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                       "inner", output=["k", "v", "w"])
            .aggregate(["k"], ["count(*) AS c"])
            .order_by(["k"]).build())
    try:
        out = run_plan_pydict(plan)
        tab = get_table("dyn_pq")
        # 10 row groups, only the two containing k in {3, 7} survive
        assert tab.last_skipped == 8, tab.last_skipped
    finally:
        drop_table("dyn_pq")
    assert out["k"] == [3, 7]
    assert out["c"] == [n // 10, n // 10]


def test_empty_build_short_circuits():
    t = _probe_table(seed=3)
    register_arrow("dyn_empty", t, 512)
    build = Batch.from_pydict({"bk": [], "w": []},
                              {"bk": BIGINT, "w": DOUBLE})
    plan = (PlanBuilder().table_scan("dyn_empty", columns=["k", "v"])
            .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                       "inner", output=["k", "v", "w"]).build())
    try:
        out = run_plan_pydict(plan)
    finally:
        drop_table("dyn_empty")
    assert out["k"] == []
