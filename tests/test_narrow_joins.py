"""Narrow-lane (int32 decimal) exactness through the JOIN path.

Round 1 proved decimal exactness for Q1/Q6 (pure scan->aggregate); the
round-2 perf plan routes Q3/Q18's money math through the same cents lanes
(VERDICT r1 item 2). These tests pin bit-exactness of the clustered
merge-join + streaming-aggregation plans in decimal mode against int64
pandas oracles on referentially-dense numpy-backend data.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.exec import run_plan
from velox_tpu.io.catalog import drop_table, register_arrow
from velox_tpu.io.tpch import generate_tables
from velox_tpu.tpch import tpch_plan
from velox_tpu.utils.config import config

SF = 0.01


def _cents(tbl: pa.Table, cols):
    return {
        c: np.round(np.asarray(tbl.column(c)) * 100).astype(np.int64)
        for c in cols
    }


@pytest.fixture(scope="module")
def decimal_tpch():
    config.narrow_lanes = True
    tables = generate_tables(SF)
    li = tables["lineitem"]
    od = tables["orders"]
    cu = tables["customer"]

    li_c = _cents(li, ["l_extendedprice", "l_discount", "l_quantity"])
    od_c = _cents(od, ["o_totalprice"])

    register_arrow(
        "lineitem",
        pa.table({
            "l_orderkey": li.column("l_orderkey"),
            "l_extendedprice": li_c["l_extendedprice"],
            "l_discount": li_c["l_discount"],
            "l_quantity": li_c["l_quantity"],
            "l_shipdate": li.column("l_shipdate"),
        }),
        batch_rows=1 << 14,
        decimal_overrides={
            "l_extendedprice": (9, 2), "l_discount": (3, 2),
            "l_quantity": (4, 2)},
    )
    register_arrow(
        "orders",
        pa.table({
            "o_orderkey": od.column("o_orderkey"),
            "o_custkey": od.column("o_custkey"),
            "o_orderdate": od.column("o_orderdate"),
            "o_shippriority": od.column("o_shippriority"),
            "o_totalprice": od_c["o_totalprice"],
        }),
        batch_rows=1 << 14,
        decimal_overrides={"o_totalprice": (10, 2)},
    )
    register_arrow(
        "customer",
        pa.table({
            "c_custkey": cu.column("c_custkey"),
            "c_name": cu.column("c_name"),
            "c_mktsegment": cu.column("c_mktsegment"),
        }),
        batch_rows=1 << 14,
    )

    dfs = {
        "lineitem": pd.DataFrame({
            "l_orderkey": np.asarray(li.column("l_orderkey")),
            "price": li_c["l_extendedprice"],
            "disc": li_c["l_discount"],
            "qty": li_c["l_quantity"],
            "l_shipdate": np.asarray(
                li.column("l_shipdate").cast(pa.int32())),
        }),
        "orders": pd.DataFrame({
            "o_orderkey": np.asarray(od.column("o_orderkey")),
            "o_custkey": np.asarray(od.column("o_custkey")),
            "o_orderdate": np.asarray(
                od.column("o_orderdate").cast(pa.int32())),
            "o_shippriority": np.asarray(od.column("o_shippriority")),
            "total": od_c["o_totalprice"],
        }),
        "customer": pd.DataFrame({
            "c_custkey": np.asarray(cu.column("c_custkey")),
            "c_name": cu.column("c_name").to_pylist(),
            "c_mktsegment": cu.column("c_mktsegment").to_pylist(),
        }),
    }
    yield dfs
    for t in ("lineitem", "orders", "customer"):
        drop_table(t)
    config.narrow_lanes = False


def test_q3_decimal_exact(decimal_tpch):
    dfs = decimal_tpch
    cutoff = 9204  # 1995-03-15
    cust = dfs["customer"]
    cust = cust[cust["c_mktsegment"] == "BUILDING"][["c_custkey"]]
    od = dfs["orders"]
    od = od[od["o_orderdate"] < cutoff]
    od = od.merge(cust, left_on="o_custkey", right_on="c_custkey")
    li = dfs["lineitem"]
    li = li[li["l_shipdate"] > cutoff]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["rev"] = j["price"] * (100 - j["disc"])  # scale 4 integer
    e = (j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"])
         .agg(revenue=("rev", "sum")).reset_index()
         .sort_values(["revenue", "o_orderdate"],
                      ascending=[False, True]).head(10))

    r = run_plan(tpch_plan(3, clustered=True).build()).to_pydict()
    assert r["l_orderkey"] == e["l_orderkey"].tolist()
    assert [int(x.scaleb(4)) for x in r["revenue"]] == e["revenue"].tolist()


def test_q18_decimal_exact(decimal_tpch):
    dfs = decimal_tpch
    li = dfs["lineitem"]
    g = li.groupby("l_orderkey").agg(q=("qty", "sum")).reset_index()
    # threshold: decimal(4,2) quantity cents > 300.00
    big = g[g["q"] > 30000][["l_orderkey"]]
    od = dfs["orders"].merge(
        big, left_on="o_orderkey", right_on="l_orderkey")
    od = od.merge(dfs["customer"], left_on="o_custkey", right_on="c_custkey")
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    e = (j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "total"])
         .agg(sum_qty=("qty", "sum")).reset_index()
         .sort_values(["total", "o_orderdate"],
                      ascending=[False, True]).head(100))

    r = run_plan(tpch_plan(18, clustered=True).build()).to_pydict()
    assert len(r["o_orderkey"]) == len(e)
    assert r["o_orderkey"] == e["o_orderkey"].tolist()
    assert [int(x.scaleb(2)) for x in r["sum_qty"]] == e["sum_qty"].tolist()
    assert [int(x.scaleb(2))
            for x in r["o_totalprice"]] == e["total"].tolist()
