"""TPC-DS reporting-query subset vs pandas oracles
(velox/benchmarks/tpcds harness analog; spec-shaped data from
io/tpcds.py)."""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.io.tpcds import generate_tpcds, register_tpcds
from velox_tpu.tpcds import SUPPORTED_QUERIES, tpcds_plan

SF = 0.005


@pytest.fixture(scope="module")
def dfs():
    tables = register_tpcds(SF, batch_rows=1 << 14)
    out = {k: t.to_pandas() for k, t in tables.items()}
    yield out
    from velox_tpu.io import drop_table

    for k in tables:
        try:
            drop_table(k)
        except KeyError:
            pass


def _star(dfs, d_filter, i_filter):
    ss = dfs["store_sales"]
    dt = dfs["date_dim"]
    it = dfs["item"]
    j = ss.merge(dt[d_filter(dt)], left_on="ss_sold_date_sk",
                 right_on="d_date_sk")
    return j.merge(it[i_filter(it)], left_on="ss_item_sk",
                   right_on="i_item_sk")


def test_q3(dfs):
    got = run_plan_pydict(tpcds_plan(3).build())
    j = _star(dfs, lambda d: d.d_moy == 11,
              lambda i: i.i_manufact_id == 128)
    exp = (j.groupby(["d_year", "i_brand_id", "i_brand"])
           ["ss_ext_sales_price"].sum().reset_index()
           .sort_values(["d_year", "ss_ext_sales_price", "i_brand_id"],
                        ascending=[True, False, True]).head(100))
    assert got["d_year"] == exp["d_year"].tolist()
    assert got["i_brand_id"] == exp["i_brand_id"].tolist()
    for a, b in zip(got["sum_agg"], exp["ss_ext_sales_price"]):
        assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("qn,mgr,moy,year,col", [
    (52, 1, 11, 2000, "ext_price"), (55, 28, 11, 1999, "ext_price")])
def test_brand_stars(dfs, qn, mgr, moy, year, col):
    got = run_plan_pydict(tpcds_plan(qn).build())
    j = _star(dfs, lambda d: (d.d_moy == moy) & (d.d_year == year),
              lambda i: i.i_manager_id == mgr)
    exp = (j.groupby(["d_year", "i_brand", "i_brand_id"])
           ["ss_ext_sales_price"].sum().reset_index()
           .sort_values(["d_year", "ss_ext_sales_price", "i_brand_id"],
                        ascending=[True, False, True]).head(100))
    assert got["i_brand_id"] == exp["i_brand_id"].tolist()
    for a, b in zip(got[col], exp["ss_ext_sales_price"]):
        assert a == pytest.approx(b, rel=1e-9)


def test_q42(dfs):
    got = run_plan_pydict(tpcds_plan(42).build())
    j = _star(dfs, lambda d: (d.d_moy == 11) & (d.d_year == 2000),
              lambda i: i.i_manager_id == 1)
    exp = (j.groupby(["d_year", "i_category_id", "i_category"])
           ["ss_ext_sales_price"].sum().reset_index()
           .sort_values(
               ["ss_ext_sales_price", "d_year", "i_category_id",
                "i_category"], ascending=[False, True, True, True])
           .head(100))
    assert got["i_category_id"] == exp["i_category_id"].tolist()
    for a, b in zip(got["total"], exp["ss_ext_sales_price"]):
        assert a == pytest.approx(b, rel=1e-9)


def test_q7(dfs):
    got = run_plan_pydict(tpcds_plan(7).build())
    ss = dfs["store_sales"]
    cd = dfs["customer_demographics"]
    dt = dfs["date_dim"]
    pr = dfs["promotion"]
    it = dfs["item"]
    cd_keep = cd[(cd.cd_gender == "M") & (cd.cd_marital_status == "S")
                 & (cd.cd_education_status == "College")].cd_demo_sk
    dt_keep = dt[dt.d_year == 2000].d_date_sk
    pr_keep = pr[(pr.p_channel_email == "N")
                 | (pr.p_channel_event == "N")].p_promo_sk
    j = ss[ss.ss_cdemo_sk.isin(set(cd_keep))
           & ss.ss_sold_date_sk.isin(set(dt_keep))
           & ss.ss_promo_sk.isin(set(pr_keep))]
    j = j.merge(it, left_on="ss_item_sk", right_on="i_item_sk")
    exp = (j.groupby("i_item_id").agg(
        agg1=("ss_quantity", "mean"), agg2=("ss_list_price", "mean"),
        agg3=("ss_coupon_amt", "mean"), agg4=("ss_sales_price", "mean"))
        .reset_index().sort_values("i_item_id").head(100))
    assert got["i_item_id"] == exp["i_item_id"].tolist()
    for c in ("agg1", "agg2", "agg3", "agg4"):
        for a, b in zip(got[c], exp[c]):
            assert a == pytest.approx(b, rel=1e-9)


def test_q19(dfs):
    got = run_plan_pydict(tpcds_plan(19).build())
    ss, dt, it = (dfs["store_sales"], dfs["date_dim"], dfs["item"])
    cu, ca, st = (dfs["customer"], dfs["customer_address"],
                  dfs["store"])
    dkeep = dt[(dt.d_moy == 11) & (dt.d_year == 1999)].d_date_sk
    j = ss[ss.ss_sold_date_sk.isin(set(dkeep))]
    j = j.merge(it[it.i_manager_id == 8], left_on="ss_item_sk",
                right_on="i_item_sk")
    j = j.merge(cu, left_on="ss_customer_sk", right_on="c_customer_sk")
    j = j.merge(ca, left_on="c_current_addr_sk",
                right_on="ca_address_sk")
    j = j.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
    exp = (j.groupby(["i_brand_id", "i_brand", "i_manufact_id"])
           ["ss_ext_sales_price"].sum().reset_index()
           .sort_values(["ss_ext_sales_price", "i_brand_id"],
                        ascending=[False, True]).head(100))
    assert got["i_brand_id"] == exp["i_brand_id"].tolist()
    for a, b in zip(got["ext_price"], exp["ss_ext_sales_price"]):
        assert a == pytest.approx(b, rel=1e-9)


def test_q96(dfs):
    got = run_plan_pydict(tpcds_plan(96).build())
    ss, dt, st = dfs["store_sales"], dfs["date_dim"], dfs["store"]
    dkeep = set(dt[dt.d_dom == 25].d_date_sk)
    skeep = set(st[st.s_state == "TX"].s_store_sk)
    exp = int((ss.ss_sold_date_sk.isin(dkeep)
               & ss.ss_store_sk.isin(skeep)).sum())
    assert got["cnt"] == [exp]


def test_supported_list():
    assert SUPPORTED_QUERIES == list(range(1, 100))
    assert len(SUPPORTED_QUERIES) == 99


def _semi(ss, dim, lk, rk):
    return ss[ss[lk].isin(dim[rk])]


def test_q13_q48_or_bands(dfs):
    ss, dt, st = dfs["store_sales"], dfs["date_dim"], dfs["store"]
    cd, cu, ca = (dfs["customer_demographics"], dfs["customer"],
                  dfs["customer_address"])
    base = _semi(_semi(ss, dt[dt.d_year == 2001], "ss_sold_date_sk",
                       "d_date_sk"), st, "ss_store_sk", "s_store_sk")
    j = base.merge(cd, left_on="ss_cdemo_sk", right_on="cd_demo_sk")

    def bands(j, combos, price_col="ss_sales_price"):
        m = False
        for ms, ed, lo, hi in combos:
            m = m | ((j.cd_marital_status == ms)
                     & (j.cd_education_status == ed)
                     & (j[price_col] >= lo) & (j[price_col] <= hi))
        return j[m]

    def addr_bands(j, combos):
        m = False
        for states, lo, hi in combos:
            m = m | (j.ca_state.isin(states)
                     & (j.ss_ext_discount_amt >= lo)
                     & (j.ss_ext_discount_amt <= hi))
        return j[m]

    # q13
    f = bands(j, [("M", "Advanced Degree", 100, 150),
                  ("S", "College", 50, 100),
                  ("W", "2 yr Degree", 150, 200)])
    f = (f.merge(cu, left_on="ss_customer_sk", right_on="c_customer_sk")
         .merge(ca, left_on="c_current_addr_sk",
                right_on="ca_address_sk"))
    f = addr_bands(f, [(("TX", "OH", "CA"), 0, 200),
                       (("NY", "KS", "MI"), 150, 300),
                       (("AL", "GA", "TN"), 50, 250)])
    got = run_plan_pydict(tpcds_plan(13).build())
    if len(f):
        assert got["a1"][0] == pytest.approx(f.ss_quantity.mean())
        assert got["s1"][0] == pytest.approx(f.ss_wholesale_cost.sum())
    else:
        assert got["a1"] == [None]
    # q48
    f2 = bands(j, [("M", "4 yr Degree", 100, 150),
                   ("D", "2 yr Degree", 50, 100),
                   ("S", "College", 150, 200)])
    f2 = (f2.merge(cu, left_on="ss_customer_sk",
                   right_on="c_customer_sk")
          .merge(ca, left_on="c_current_addr_sk",
                 right_on="ca_address_sk"))
    f2 = addr_bands(f2, [(("TX", "NY"), 0, 2000),
                         (("CA", "OH"), 150, 3000),
                         (("GA", "IL"), 50, 25000)])
    got2 = run_plan_pydict(tpcds_plan(48).build())
    assert got2["total_qty"][0] == (
        f2.ss_quantity.sum() if len(f2) else None)


def test_q27_rollup(dfs):
    ss, dt, st, it, cd = (dfs["store_sales"], dfs["date_dim"],
                          dfs["store"], dfs["item"],
                          dfs["customer_demographics"])
    dem = cd[(cd.cd_gender == "F") & (cd.cd_marital_status == "S")
             & (cd.cd_education_status == "College")]
    j = _semi(_semi(ss, dem, "ss_cdemo_sk", "cd_demo_sk"),
              dt[dt.d_year == 2002], "ss_sold_date_sk", "d_date_sk")
    j = (j.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    got = run_plan_pydict(tpcds_plan(27).build())
    rows = set(zip(got["i_item_id"], got["s_state"], got["group_id"]))
    # level 0: (item, state); level 1: (item); level 2: grand total
    g0 = j.groupby(["i_item_id", "s_state"]).ss_quantity.mean()
    got0 = {(i, s): a for i, s, g, a in zip(
        got["i_item_id"], got["s_state"], got["group_id"], got["agg1"])
        if g == 0}
    for (i, s), v in g0.items():
        if (i, s) in got0:       # limit(100) may trim
            assert got0[(i, s)] == pytest.approx(v)
    # grand-total row exists with null keys
    assert any(g == 2 and i is None and s is None
               for i, s, g in rows)


def test_q43_day_pivot(dfs):
    ss, dt, st = dfs["store_sales"], dfs["date_dim"], dfs["store"]
    j = (ss.merge(dt[dt.d_year == 2000], left_on="ss_sold_date_sk",
                  right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    got = run_plan_pydict(tpcds_plan(43).build())
    for i, sid in enumerate(got["s_store_id"]):
        sub = j[j.s_store_id == sid]
        for abbr, full in [("sun", "Sunday"), ("wed", "Wednesday"),
                           ("sat", "Saturday")]:
            exp = sub.loc[sub.d_day_name == full,
                          "ss_sales_price"].sum()
            assert got[f"{abbr}_sales"][i] == pytest.approx(exp)


def test_q53_window_deviation(dfs):
    ss, dt, it = dfs["store_sales"], dfs["date_dim"], dfs["item"]
    j = (ss.merge(dt[dt.d_year == 2000], left_on="ss_sold_date_sk",
                  right_on="d_date_sk")
         .merge(it[(it.i_manufact_id >= 100)
                   & (it.i_manufact_id <= 140)],
                left_on="ss_item_sk", right_on="i_item_sk"))
    sums = (j.groupby(["i_manufact_id", "d_qoy"]).ss_sales_price.sum()
            .reset_index(name="sum_sales"))
    sums["avg_q"] = sums.groupby("i_manufact_id")["sum_sales"] \
        .transform("mean")
    exp = sums[(sums.avg_q > 0)
               & ((sums.sum_sales - sums.avg_q).abs()
                  / sums.avg_q > 0.1)]
    got = run_plan_pydict(tpcds_plan(53).build())
    assert len(got["sum_sales"]) == min(len(exp), 100)
    exp_pairs = sorted(zip(exp.avg_q.round(6), exp.sum_sales.round(6)))
    got_pairs = sorted(zip(np.round(got["avg_quarterly_sales"], 6),
                           np.round(got["sum_sales"], 6)))
    assert got_pairs == exp_pairs[:len(got_pairs)]


def test_q65_underperformers(dfs):
    ss, dt, st, it = (dfs["store_sales"], dfs["date_dim"],
                      dfs["store"], dfs["item"])
    f = _semi(ss, dt[dt.d_year == 2000], "ss_sold_date_sk",
              "d_date_sk")
    rev = (f.groupby(["ss_store_sk", "ss_item_sk"]).ss_sales_price
           .sum().reset_index(name="revenue"))
    rev["ave"] = rev.groupby("ss_store_sk").revenue.transform("mean")
    low = rev[rev.revenue <= 0.1 * rev.ave]
    low = (low.merge(st, left_on="ss_store_sk", right_on="s_store_sk")
           .merge(it, left_on="ss_item_sk", right_on="i_item_sk")
           .sort_values(["s_store_name", "i_item_id"]).head(100))
    got = run_plan_pydict(tpcds_plan(65).build())
    assert got["s_store_name"] == low.s_store_name.tolist()
    assert got["i_item_id"] == low.i_item_id.tolist()
    for a, b in zip(got["revenue"], low.revenue):
        assert a == pytest.approx(b)
