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


def _vol(df):
    return df["l_extendedprice"] * (1 - df["l_discount"])


def test_q2(tpch):
    nat = tpch["nation"].merge(
        tpch["region"][tpch["region"]["r_name"] == "EUROPE"],
        left_on="n_regionkey", right_on="r_regionkey")
    sup = tpch["supplier"].merge(
        nat[["n_nationkey", "n_name"]], left_on="s_nationkey",
        right_on="n_nationkey")
    ps = tpch["partsupp"].merge(sup, left_on="ps_suppkey",
                                right_on="s_suppkey")
    p = tpch["part"]
    p = p[(p["p_size"] == 15) & p["p_type"].str.endswith("BRASS")]
    j = ps.merge(p[["p_partkey", "p_mfgr"]], left_on="ps_partkey",
                 right_on="p_partkey")
    mins = ps.groupby("ps_partkey")["ps_supplycost"].min().rename("mc")
    j = j.join(mins, on="ps_partkey")
    j = j[j["ps_supplycost"] == j["mc"]]
    e = (j.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True]).head(100)
        [["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
          "s_address", "s_phone", "s_comment"]])
    got = run_plan_pydict(tpch_plan(2))
    assert_frame(got, e, float_cols=["s_acctbal"])


def test_q4(tpch):
    li = tpch["lineitem"]
    late = li[li["l_commitdate"] < li["l_receiptdate"]]["l_orderkey"]
    o = tpch["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1993-07-01").date())
          & (o["o_orderdate"] < pd.Timestamp("1993-10-01").date())]
    o = o[o["o_orderkey"].isin(late)]
    e = (o.groupby("o_orderpriority").size()
         .reset_index(name="order_count")
         .sort_values("o_orderpriority"))
    got = run_plan_pydict(tpch_plan(4))
    assert_frame(got, e)


def test_q7(tpch):
    n = tpch["nation"][tpch["nation"]["n_name"].isin(
        ["FRANCE", "GERMANY"])]
    sup = tpch["supplier"].merge(
        n[["n_nationkey", "n_name"]], left_on="s_nationkey",
        right_on="n_nationkey").rename(columns={"n_name": "supp_nation"})
    cust = tpch["customer"].merge(
        n[["n_nationkey", "n_name"]], left_on="c_nationkey",
        right_on="n_nationkey").rename(columns={"n_name": "cust_nation"})
    o = tpch["orders"].merge(cust[["c_custkey", "cust_nation"]],
                             left_on="o_custkey", right_on="c_custkey")
    li = tpch["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1995-01-01").date())
            & (li["l_shipdate"] <= pd.Timestamp("1996-12-31").date())]
    j = li.merge(sup[["s_suppkey", "supp_nation"]], left_on="l_suppkey",
                 right_on="s_suppkey")
    j = j.merge(o[["o_orderkey", "cust_nation"]], left_on="l_orderkey",
                right_on="o_orderkey")
    j = j[((j["supp_nation"] == "FRANCE") & (j["cust_nation"] == "GERMANY"))
          | ((j["supp_nation"] == "GERMANY")
             & (j["cust_nation"] == "FRANCE"))]
    j["l_year"] = pd.to_datetime(j["l_shipdate"]).dt.year
    j["volume"] = _vol(j)
    e = (j.groupby(["supp_nation", "cust_nation", "l_year"])
         .agg(revenue=("volume", "sum")).reset_index()
         .sort_values(["supp_nation", "cust_nation", "l_year"]))
    got = run_plan_pydict(tpch_plan(7))
    assert_frame(got, e, float_cols=["revenue"])


def test_q8(tpch):
    amer = tpch["nation"].merge(
        tpch["region"][tpch["region"]["r_name"] == "AMERICA"],
        left_on="n_regionkey", right_on="r_regionkey")["n_nationkey"]
    cust = tpch["customer"]
    cust = cust[cust["c_nationkey"].isin(amer)]
    o = tpch["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1995-01-01").date())
          & (o["o_orderdate"] <= pd.Timestamp("1996-12-31").date())]
    o = o[o["o_custkey"].isin(cust["c_custkey"])]
    p = tpch["part"]
    p = p[p["p_type"] == "ECONOMY ANODIZED STEEL"]
    sup = tpch["supplier"].merge(
        tpch["nation"][["n_nationkey", "n_name"]],
        left_on="s_nationkey", right_on="n_nationkey")
    li = tpch["lineitem"]
    li = li[li["l_partkey"].isin(p["p_partkey"])]
    j = li.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                 right_on="o_orderkey")
    j = j.merge(sup[["s_suppkey", "n_name"]], left_on="l_suppkey",
                right_on="s_suppkey")
    j["o_year"] = pd.to_datetime(j["o_orderdate"]).dt.year
    j["volume"] = _vol(j)
    j["bvol"] = np.where(j["n_name"] == "BRAZIL", j["volume"], 0.0)
    e = j.groupby("o_year").agg(
        brazil=("bvol", "sum"), total=("volume", "sum")).reset_index()
    e["mkt_share"] = e["brazil"] / e["total"]
    e = e[["o_year", "mkt_share"]].sort_values("o_year")
    got = run_plan_pydict(tpch_plan(8))
    assert_frame(got, e, float_cols=["mkt_share"])


def test_q9(tpch):
    p = tpch["part"]
    p = p[p["p_name"].str.contains("green")]
    li = tpch["lineitem"]
    li = li[li["l_partkey"].isin(p["p_partkey"])]
    j = li.merge(tpch["partsupp"],
                 left_on=["l_partkey", "l_suppkey"],
                 right_on=["ps_partkey", "ps_suppkey"])
    j = j.merge(tpch["orders"][["o_orderkey", "o_orderdate"]],
                left_on="l_orderkey", right_on="o_orderkey")
    sup = tpch["supplier"].merge(
        tpch["nation"][["n_nationkey", "n_name"]],
        left_on="s_nationkey", right_on="n_nationkey")
    j = j.merge(sup[["s_suppkey", "n_name"]], left_on="l_suppkey",
                right_on="s_suppkey")
    j["o_year"] = pd.to_datetime(j["o_orderdate"]).dt.year
    j["amount"] = _vol(j) - j["ps_supplycost"] * j["l_quantity"]
    e = (j.groupby(["n_name", "o_year"]).agg(
        sum_profit=("amount", "sum")).reset_index()
        .rename(columns={"n_name": "nation"})
        .sort_values(["nation", "o_year"], ascending=[True, False]))
    got = run_plan_pydict(tpch_plan(9))
    assert_frame(got, e, float_cols=["sum_profit"])


def test_q11(tpch):
    ger = tpch["nation"][tpch["nation"]["n_name"] == "GERMANY"]
    sup = tpch["supplier"]
    sup = sup[sup["s_nationkey"].isin(ger["n_nationkey"])]
    ps = tpch["partsupp"]
    ps = ps[ps["ps_suppkey"].isin(sup["s_suppkey"])].copy()
    ps["val"] = ps["ps_supplycost"] * ps["ps_availqty"]
    total = ps["val"].sum() * (0.0001 / SF)
    e = (ps.groupby("ps_partkey").agg(value=("val", "sum")).reset_index())
    e = e[e["value"] > total].sort_values("value", ascending=False)
    got = run_plan_pydict(tpch_plan(11, sf=SF))
    assert_frame(got, e, float_cols=["value"])


def test_q12(tpch):
    li = tpch["lineitem"]
    li = li[li["l_shipmode"].isin(["MAIL", "SHIP"])
            & (li["l_commitdate"] < li["l_receiptdate"])
            & (li["l_shipdate"] < li["l_commitdate"])
            & (li["l_receiptdate"] >= pd.Timestamp("1994-01-01").date())
            & (li["l_receiptdate"] < pd.Timestamp("1995-01-01").date())]
    j = li.merge(tpch["orders"][["o_orderkey", "o_orderpriority"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    j["high"] = j["o_orderpriority"].isin(
        ["1-URGENT", "2-HIGH"]).astype(int)
    j["low"] = 1 - j["high"]
    e = (j.groupby("l_shipmode").agg(
        high_line_count=("high", "sum"),
        low_line_count=("low", "sum")).reset_index()
        .sort_values("l_shipmode"))
    got = run_plan_pydict(tpch_plan(12))
    assert_frame(got, e)


def test_q13(tpch):
    o = tpch["orders"]
    o = o[~o["o_comment"].str.contains("special.*requests")]
    c = tpch["customer"][["c_custkey"]]
    j = c.merge(o[["o_orderkey", "o_custkey"]], left_on="c_custkey",
                right_on="o_custkey", how="left")
    counts = j.groupby("c_custkey")["o_orderkey"].count()
    e = (counts.value_counts().reset_index())
    e.columns = ["c_count", "custdist"]
    e = e.sort_values(["custdist", "c_count"], ascending=[False, False])
    got = run_plan_pydict(tpch_plan(13))
    assert_frame(got, e)


def test_q14(tpch):
    li = tpch["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1995-09-01").date())
            & (li["l_shipdate"] < pd.Timestamp("1995-10-01").date())]
    j = li.merge(tpch["part"][["p_partkey", "p_type"]],
                 left_on="l_partkey", right_on="p_partkey")
    vol = _vol(j)
    promo = vol.where(j["p_type"].str.startswith("PROMO"), 0.0)
    expected = 100.0 * promo.sum() / vol.sum()
    got = run_plan_pydict(tpch_plan(14))
    assert got["promo_revenue"][0] == pytest.approx(expected, rel=1e-9)


def test_q15(tpch):
    li = tpch["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01").date())
            & (li["l_shipdate"] < pd.Timestamp("1996-04-01").date())].copy()
    li["rev"] = _vol(li)
    rev = li.groupby("l_suppkey").agg(
        total_revenue=("rev", "sum")).reset_index()
    best = rev[rev["total_revenue"] == rev["total_revenue"].max()]
    e = best.merge(tpch["supplier"], left_on="l_suppkey",
                   right_on="s_suppkey").sort_values("s_suppkey")
    e = e[["s_suppkey", "s_name", "s_address", "s_phone",
           "total_revenue"]]
    got = run_plan_pydict(tpch_plan(15))
    assert_frame(got, e, float_cols=["total_revenue"])


def test_q16(tpch):
    bad = tpch["supplier"]
    bad = bad[bad["s_comment"].str.contains("Customer.*Complaints")]
    ps = tpch["partsupp"]
    ps = ps[~ps["ps_suppkey"].isin(bad["s_suppkey"])]
    p = tpch["part"]
    p = p[(p["p_brand"] != "Brand#45")
          & ~p["p_type"].str.startswith("MEDIUM POLISHED")
          & p["p_size"].isin([49, 14, 23, 45, 19, 3, 36, 9])]
    j = ps.merge(p[["p_partkey", "p_brand", "p_type", "p_size"]],
                 left_on="ps_partkey", right_on="p_partkey")
    e = (j.groupby(["p_brand", "p_type", "p_size"])["ps_suppkey"]
         .nunique().reset_index(name="supplier_cnt")
         .sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                      ascending=[False, True, True, True]))
    got = run_plan_pydict(tpch_plan(16))
    assert_frame(got, e)


def test_q17(tpch):
    p = tpch["part"]
    p = p[(p["p_brand"] == "Brand#23") & (p["p_container"] == "MED BOX")]
    li = tpch["lineitem"]
    li = li[li["l_partkey"].isin(p["p_partkey"])]
    avgs = li.groupby("l_partkey")["l_quantity"].mean() * 0.2
    j = li.join(avgs.rename("lim"), on="l_partkey")
    expected = j[j["l_quantity"] < j["lim"]]["l_extendedprice"].sum() / 7.0
    got = run_plan_pydict(tpch_plan(17))
    if expected == 0:
        assert got["avg_yearly"][0] in (0.0, None)
    else:
        assert got["avg_yearly"][0] == pytest.approx(expected, rel=1e-9)


def test_q19(tpch):
    li = tpch["lineitem"]
    li = li[li["l_shipmode"].isin(["AIR", "REG AIR"])
            & (li["l_shipinstruct"] == "DELIVER IN PERSON")]
    j = li.merge(tpch["part"], left_on="l_partkey", right_on="p_partkey")
    c1 = ((j["p_brand"] == "Brand#12")
          & j["p_container"].isin(
              ["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (j["l_quantity"] >= 1) & (j["l_quantity"] <= 11)
          & (j["p_size"] >= 1) & (j["p_size"] <= 5))
    c2 = ((j["p_brand"] == "Brand#23")
          & j["p_container"].isin(
              ["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (j["l_quantity"] >= 10) & (j["l_quantity"] <= 20)
          & (j["p_size"] >= 1) & (j["p_size"] <= 10))
    c3 = ((j["p_brand"] == "Brand#34")
          & j["p_container"].isin(
              ["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (j["l_quantity"] >= 20) & (j["l_quantity"] <= 30)
          & (j["p_size"] >= 1) & (j["p_size"] <= 15))
    expected = _vol(j[c1 | c2 | c3]).sum()
    got = run_plan_pydict(tpch_plan(19))
    if expected == 0:
        assert got["revenue"][0] in (0.0, None)
    else:
        assert got["revenue"][0] == pytest.approx(expected, rel=1e-9)


def test_q20(tpch):
    p = tpch["part"]
    forest = p[p["p_name"].str.startswith("forest")]["p_partkey"]
    li = tpch["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1994-01-01").date())
            & (li["l_shipdate"] < pd.Timestamp("1995-01-01").date())]
    sums = (li.groupby(["l_partkey", "l_suppkey"])["l_quantity"].sum()
            * 0.5).rename("half").reset_index()
    ps = tpch["partsupp"]
    ps = ps[ps["ps_partkey"].isin(forest)]
    j = ps.merge(sums, left_on=["ps_partkey", "ps_suppkey"],
                 right_on=["l_partkey", "l_suppkey"])
    good = j[j["ps_availqty"] > j["half"]]["ps_suppkey"].unique()
    sup = tpch["supplier"]
    can = tpch["nation"][tpch["nation"]["n_name"] == "CANADA"]
    e = sup[sup["s_suppkey"].isin(good)
            & sup["s_nationkey"].isin(can["n_nationkey"])]
    e = e[["s_name", "s_address"]].sort_values("s_name")
    got = run_plan_pydict(tpch_plan(20))
    assert_frame(got, e)


def test_q21(tpch):
    li = tpch["lineitem"]
    late = li[li["l_receiptdate"] > li["l_commitdate"]]
    f_orders = tpch["orders"]
    f_orders = f_orders[f_orders["o_orderstatus"] == "F"]["o_orderkey"]
    saudi = tpch["nation"][tpch["nation"]["n_name"] == "SAUDI ARABIA"]
    sup = tpch["supplier"]
    sup = sup[sup["s_nationkey"].isin(saudi["n_nationkey"])]
    l1 = late[late["l_orderkey"].isin(f_orders)]
    l1 = l1.merge(sup[["s_suppkey", "s_name"]], left_on="l_suppkey",
                  right_on="s_suppkey")
    # exists: another supplier on same order
    multi = li.groupby("l_orderkey")["l_suppkey"].nunique()
    def exists_other(row):
        g = li[li["l_orderkey"] == row["l_orderkey"]]
        return (g["l_suppkey"] != row["l_suppkey"]).any()
    def exists_other_late(row):
        g = late[late["l_orderkey"] == row["l_orderkey"]]
        return (g["l_suppkey"] != row["l_suppkey"]).any()
    keep = l1.apply(
        lambda r: exists_other(r) and not exists_other_late(r), axis=1)
    l1 = l1[keep] if len(l1) else l1
    e = (l1.groupby("s_name").size().reset_index(name="numwait")
         .sort_values(["numwait", "s_name"], ascending=[False, True])
         .head(100))
    got = run_plan_pydict(tpch_plan(21))
    assert_frame(got, e)


def test_q22(tpch):
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    c = tpch["customer"].copy()
    c["cntrycode"] = c["c_phone"].str[:2]
    c = c[c["cntrycode"].isin(codes)]
    avg_bal = c[c["c_acctbal"] > 0.0]["c_acctbal"].mean()
    c = c[c["c_acctbal"] > avg_bal]
    c = c[~c["c_custkey"].isin(tpch["orders"]["o_custkey"])]
    e = (c.groupby("cntrycode").agg(
        numcust=("c_acctbal", "count"),
        totacctbal=("c_acctbal", "sum")).reset_index()
        .sort_values("cntrycode"))
    got = run_plan_pydict(tpch_plan(22))
    assert_frame(got, e, float_cols=["totacctbal"])


def test_q3_clustered_matches_hash(tpch):
    base = run_plan_pydict(tpch_plan(3, SF).build())
    clus = run_plan_pydict(tpch_plan(3, SF, clustered=True).build())
    bd, cd = pd.DataFrame(base), pd.DataFrame(clus)
    assert list(bd.columns) == list(cd.columns)
    assert bd["l_orderkey"].tolist() == cd["l_orderkey"].tolist()
    np.testing.assert_allclose(bd["revenue"], cd["revenue"], rtol=1e-9)


def test_q18_clustered_matches_hash(tpch):
    base = run_plan_pydict(tpch_plan(18, SF).build())
    clus = run_plan_pydict(tpch_plan(18, SF, clustered=True).build())
    bd, cd = pd.DataFrame(base), pd.DataFrame(clus)
    assert list(bd.columns) == list(cd.columns)
    assert bd["o_orderkey"].tolist() == cd["o_orderkey"].tolist()
    np.testing.assert_allclose(bd["sum_qty"], cd["sum_qty"], rtol=1e-9)
