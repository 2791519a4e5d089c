"""TPC-H query correctness vs pandas oracles on generated data.

The analog of velox's TpchQueryBuilder tests + DuckDB assertQuery oracle
(velox/exec/tests/utils/QueryAssertions.h:254-299): both engines consume
the identical generated tables; results must match to float tolerance.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.io.tpch import CURRENT_DATE, generate_tables, register_tpch
from velox_tpu.tpch import tpch_plan

SF = 0.01


@pytest.fixture(scope="module")
def tpch():
    tables = register_tpch(SF, batch_rows=1 << 14)
    dfs = {}
    for name, t in tables.items():
        df = t.to_pandas()
        for c in df.columns:
            if df[c].dtype == object and hasattr(
                    df[c].iloc[0] if len(df) else None, "toordinal"):
                pass
        dfs[name] = df
    return dfs


def _dates_as_days(df, cols):
    out = df.copy()
    for c in cols:
        out[c] = pd.to_datetime(out[c]).map(
            lambda d: (d.date() - pd.Timestamp(1970, 1, 1).date()).days)
    return out


def assert_frame(got: dict, expected: pd.DataFrame, float_cols=(),
                 date_cols=()):
    got_df = pd.DataFrame(got)
    assert list(got_df.columns) == list(expected.columns), (
        list(got_df.columns), list(expected.columns))
    assert len(got_df) == len(expected), (len(got_df), len(expected))
    expected = expected.reset_index(drop=True)
    for c in expected.columns:
        if c in date_cols:
            exp = _dates_as_days(expected, [c])[c]
            gv = got_df[c].map(
                lambda d: (d - pd.Timestamp(1970, 1, 1).date()).days
                if hasattr(d, "toordinal") else d)
            assert gv.tolist() == exp.tolist(), c
        elif c in float_cols:
            np.testing.assert_allclose(
                got_df[c].to_numpy(dtype=float),
                expected[c].to_numpy(dtype=float), rtol=1e-9, err_msg=c)
        else:
            assert got_df[c].tolist() == expected[c].tolist(), c


def test_q1(tpch):
    li = _dates_as_days(tpch["lineitem"], ["l_shipdate"])
    cutoff = (pd.Timestamp("1998-12-01") - pd.Timedelta(days=90)
              - pd.Timestamp("1970-01-01")).days
    f = li[li["l_shipdate"] <= cutoff].copy()
    f["disc_price"] = f["l_extendedprice"] * (1 - f["l_discount"])
    f["charge"] = f["disc_price"] * (1 + f["l_tax"])
    e = (f.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "count"),
    ).reset_index().sort_values(["l_returnflag", "l_linestatus"]))
    got = run_plan_pydict(tpch_plan(1))
    assert_frame(got, e, float_cols=[
        "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
        "avg_qty", "avg_price", "avg_disc"])


def test_q3(tpch):
    cutoff = pd.Timestamp("1995-03-15").date()
    cust = tpch["customer"]
    cust = cust[cust["c_mktsegment"] == "BUILDING"]
    orders = tpch["orders"]
    orders = orders[orders["o_orderdate"] < cutoff]
    orders = orders[orders["o_custkey"].isin(cust["c_custkey"])]
    li = tpch["lineitem"]
    li = li[li["l_shipdate"] > cutoff]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["part_rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    e = (j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"])
         .agg(revenue=("part_rev", "sum")).reset_index()
         .sort_values(["revenue", "o_orderdate"],
                      ascending=[False, True]).head(10))
    e = e[["l_orderkey", "revenue", "o_orderdate", "o_shippriority"]]
    got = run_plan_pydict(tpch_plan(3))
    assert_frame(got, e, float_cols=["revenue"],
                 date_cols=["o_orderdate"])


def test_q5(tpch):
    nat = tpch["nation"].merge(
        tpch["region"][tpch["region"]["r_name"] == "ASIA"],
        left_on="n_regionkey", right_on="r_regionkey")
    sup = tpch["supplier"].merge(
        nat[["n_nationkey", "n_name"]], left_on="s_nationkey",
        right_on="n_nationkey")
    o = tpch["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1994-01-01").date())
          & (o["o_orderdate"] < pd.Timestamp("1995-01-01").date())]
    oc = o.merge(tpch["customer"], left_on="o_custkey",
                 right_on="c_custkey")
    j = tpch["lineitem"].merge(
        oc[["o_orderkey", "c_nationkey"]], left_on="l_orderkey",
        right_on="o_orderkey")
    j = j.merge(sup[["s_suppkey", "s_nationkey", "n_name"]],
                left_on=["l_suppkey", "c_nationkey"],
                right_on=["s_suppkey", "s_nationkey"])
    j["part_rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    e = (j.groupby("n_name").agg(revenue=("part_rev", "sum"))
         .reset_index().sort_values("revenue", ascending=False))
    got = run_plan_pydict(tpch_plan(5))
    assert_frame(got, e, float_cols=["revenue"])


def test_q6(tpch):
    li = tpch["lineitem"]
    f = li[(li["l_shipdate"] >= pd.Timestamp("1994-01-01").date())
           & (li["l_shipdate"] < pd.Timestamp("1995-01-01").date())
           & (li["l_discount"] >= 0.05) & (li["l_discount"] <= 0.07)
           & (li["l_quantity"] < 24)]
    expected = float((f["l_extendedprice"] * f["l_discount"]).sum())
    got = run_plan_pydict(tpch_plan(6))
    assert got["revenue"][0] == pytest.approx(expected, rel=1e-9)


def test_q10(tpch):
    o = tpch["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1993-10-01").date())
          & (o["o_orderdate"] < pd.Timestamp("1994-01-01").date())]
    li = tpch["lineitem"]
    li = li[li["l_returnflag"] == "R"]
    j = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey",
                 right_on="o_orderkey")
    cust = tpch["customer"].merge(
        tpch["nation"][["n_nationkey", "n_name"]],
        left_on="c_nationkey", right_on="n_nationkey")
    j = j.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["part_rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    e = (j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone",
                    "n_name", "c_address", "c_comment"])
         .agg(revenue=("part_rev", "sum")).reset_index()
         .sort_values("revenue", ascending=False).head(20))
    e = e[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
           "c_address", "c_phone", "c_comment"]]
    got = run_plan_pydict(tpch_plan(10))
    assert_frame(got, e, float_cols=["revenue", "c_acctbal"])


def test_q18(tpch):
    li = tpch["lineitem"]
    totals = li.groupby("l_orderkey")["l_quantity"].sum()
    big = totals[totals > 300].index
    o = tpch["orders"]
    o = o[o["o_orderkey"].isin(big)]
    j = o.merge(tpch["customer"][["c_custkey", "c_name"]],
                left_on="o_custkey", right_on="c_custkey")
    j = li.merge(j, left_on="l_orderkey", right_on="o_orderkey")
    e = (j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice"])
         .agg(sum_qty=("l_quantity", "sum")).reset_index()
         .sort_values(["o_totalprice", "o_orderdate"],
                      ascending=[False, True]).head(100))
    got = run_plan_pydict(tpch_plan(18))
    assert_frame(got, e, float_cols=["o_totalprice", "sum_qty"],
                 date_cols=["o_orderdate"])


def test_generation_determinism():
    t1 = generate_tables(0.001)
    from velox_tpu.io.tpch import _CACHE

    _CACHE.clear()
    t2 = generate_tables(0.001)
    assert t1["lineitem"].equals(t2["lineitem"])
    assert t1["orders"].equals(t2["orders"])


def test_structural_invariants():
    t = generate_tables(0.001)
    li = t["lineitem"].to_pandas()
    ps = t["partsupp"].to_pandas()
    # every lineitem (partkey, suppkey) pair exists in partsupp
    pairs = set(zip(ps["ps_partkey"], ps["ps_suppkey"]))
    li_pairs = set(zip(li["l_partkey"], li["l_suppkey"]))
    assert li_pairs <= pairs
    # customers with custkey % 3 == 0 place no orders
    o = t["orders"].to_pandas()
    assert (o["o_custkey"] % 3 != 0).all()
