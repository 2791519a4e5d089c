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
    assert SUPPORTED_QUERIES == [3, 7, 19, 42, 52, 55, 96]
