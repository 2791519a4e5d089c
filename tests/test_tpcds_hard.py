"""TPC-DS hard-tier queries (queries_hard.py) on dsdgen-EXACT data vs
pandas oracles.

Same harness contract as test_tpcds_dsdgen.py: the reference's own
dsdgen generates the data, constants are tuned for non-empty results
at SF0.01, and every oracle asserts NON-VACUITY.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.io.dsdgen import available, register_dsdgen
from velox_tpu.tpcds import tpcds_plan

SF = 0.01

pytestmark = pytest.mark.skipif(
    not available(), reason="reference dsdgen not available")

_TABLES = [
    "store_sales", "store_returns", "catalog_sales", "catalog_returns",
    "web_sales", "web_returns", "date_dim", "item", "customer",
    "customer_address", "customer_demographics",
    "household_demographics", "store", "promotion", "warehouse",
    "web_site", "web_page", "catalog_page", "inventory", "income_band",
    "call_center",
]


@pytest.fixture(scope="module")
def dfs():
    tables = register_dsdgen(SF, batch_rows=1 << 15, tables=_TABLES)
    out = {k: t.to_pandas() for k, t in tables.items()}
    yield out
    from velox_tpu.io import drop_table

    for k in tables:
        try:
            drop_table(k)
        except KeyError:
            pass


def _approx_rows(got, exp_df, mapping, rel=1e-9):
    n = len(next(iter(got.values()))) if got else 0
    assert n == len(exp_df), (n, len(exp_df))
    for gcol, ecol in mapping.items():
        e = exp_df[ecol].tolist()
        g = got[gcol]
        for a, b in zip(g, e):
            if isinstance(b, float) and not pd.isna(b):
                assert a == pytest.approx(b, rel=rel), (gcol, a, b)
            elif pd.isna(b):
                assert a is None or (
                    isinstance(a, float) and np.isnan(a))
            else:
                assert a == b, (gcol, a, b)


def _semi(f, dim, lk, rk):
    return f[f[lk].isin(set(dim[rk]))]


# --------------------------------------------------------------- q11/q4

def _year_total_oracle(dfs, fact, dcol, ccol, measure, year):
    dd = dfs["date_dim"]
    f = _semi(dfs[fact], dd[dd.d_year == year], dcol, "d_date_sk")
    f = f[f[ccol].notna()]
    return measure(f).groupby(f[ccol]).sum()


def test_q11(dfs):
    year = 2000
    got = run_plan_pydict(tpcds_plan(11, year=year).build())

    def m_ss(f):
        return f.ss_ext_list_price - f.ss_ext_discount_amt

    def m_ws(f):
        return f.ws_ext_list_price - f.ws_ext_discount_amt

    s1 = _year_total_oracle(dfs, "store_sales", "ss_sold_date_sk",
                            "ss_customer_sk", m_ss, year)
    s2 = _year_total_oracle(dfs, "store_sales", "ss_sold_date_sk",
                            "ss_customer_sk", m_ss, year + 1)
    w1 = _year_total_oracle(dfs, "web_sales", "ws_sold_date_sk",
                            "ws_bill_customer_sk", m_ws, year)
    w2 = _year_total_oracle(dfs, "web_sales", "ws_sold_date_sk",
                            "ws_bill_customer_sk", m_ws, year + 1)
    j = (pd.DataFrame({"s1": s1}).join(
            pd.DataFrame({"s2": s2}), how="inner")
         .join(pd.DataFrame({"w1": w1}), how="inner")
         .join(pd.DataFrame({"w2": w2}), how="inner"))
    j = j[(j.s1 > 0) & (j.w1 > 0) & (j.w2 / j.w1 > j.s2 / j.s1)]
    cu = dfs["customer"].set_index("c_customer_sk")
    j = j.join(cu[["c_customer_id", "c_first_name", "c_last_name",
                   "c_preferred_cust_flag"]], how="inner")
    exp = (j.sort_values(["c_customer_id", "c_first_name",
                          "c_last_name", "c_preferred_cust_flag"])
           .head(100))
    assert len(exp) > 0
    _approx_rows(got, exp, {
        "c_customer_id": "c_customer_id",
        "c_first_name": "c_first_name",
        "c_last_name": "c_last_name",
        "c_preferred_cust_flag": "c_preferred_cust_flag"})


def test_q4(dfs):
    year = 2000
    got = run_plan_pydict(tpcds_plan(4, year=year).build())

    def m(pfx):
        def f(df):
            return ((df[f"{pfx}_ext_list_price"]
                     - df[f"{pfx}_ext_wholesale_cost"]
                     - df[f"{pfx}_ext_discount_amt"])
                    + df[f"{pfx}_ext_sales_price"]) / 2.0
        return f

    legs = {}
    for key, fact, dcol, ccol, pfx in [
            ("s", "store_sales", "ss_sold_date_sk", "ss_customer_sk",
             "ss"),
            ("c", "catalog_sales", "cs_sold_date_sk",
             "cs_bill_customer_sk", "cs"),
            ("w", "web_sales", "ws_sold_date_sk",
             "ws_bill_customer_sk", "ws")]:
        legs[f"{key}1"] = _year_total_oracle(
            dfs, fact, dcol, ccol, m(pfx), year)
        legs[f"{key}2"] = _year_total_oracle(
            dfs, fact, dcol, ccol, m(pfx), year + 1)
    j = pd.DataFrame({"s1": legs["s1"]})
    for k in ("s2", "c1", "c2", "w1", "w2"):
        j = j.join(pd.DataFrame({k: legs[k]}), how="inner")
    j = j[(j.s1 > 0) & (j.c1 > 0) & (j.w1 > 0)]
    j = j[(j.c2 / j.c1 > j.s2 / j.s1) & (j.c2 / j.c1 > j.w2 / j.w1)]
    cu = dfs["customer"].set_index("c_customer_sk")
    j = j.join(cu[["c_customer_id", "c_first_name", "c_last_name",
                   "c_email_address"]], how="inner")
    exp = (j.sort_values(["c_customer_id", "c_first_name",
                          "c_last_name", "c_email_address"])
           .head(100))
    assert len(exp) > 0
    _approx_rows(got, exp, {
        "c_customer_id": "c_customer_id",
        "c_first_name": "c_first_name",
        "c_last_name": "c_last_name",
        "c_email_address": "c_email_address"})


# --------------------------------------------------------------- q58

def test_q58(dfs):
    dd = dfs["date_dim"]
    # spec tol is 0.1; at SF0.01 only ~18 items/channel/week overlap,
    # so widen until a week has three-channel revenues in band
    day, tol = "2002-01-01", 2.0
    got = run_plan_pydict(tpcds_plan(58, day=day, tol=tol).build())

    wk_seq = dd[dd.d_date.astype(str) == day].d_week_seq.iloc[0]
    wk_sks = set(dd[dd.d_week_seq == wk_seq].d_date_sk)
    it = dfs["item"].set_index("i_item_sk")["i_item_id"]

    def leg(fact, dcol, icol, price):
        f = dfs[fact]
        f = f[f[dcol].isin(wk_sks)]
        iid = f[icol].map(it)
        return f[price].groupby(iid).sum()

    ss = leg("store_sales", "ss_sold_date_sk", "ss_item_sk",
             "ss_ext_sales_price")
    cs = leg("catalog_sales", "cs_sold_date_sk", "cs_item_sk",
             "cs_ext_sales_price")
    ws = leg("web_sales", "ws_sold_date_sk", "ws_item_sk",
             "ws_ext_sales_price")
    j = (pd.DataFrame({"ss": ss})
         .join(pd.DataFrame({"cs": cs}), how="inner")
         .join(pd.DataFrame({"ws": ws}), how="inner"))
    lo, hi = 1 - tol, 1 + tol
    ok = ((j.ss >= lo * j.cs) & (j.ss <= hi * j.cs)
          & (j.cs >= lo * j.ss) & (j.cs <= hi * j.ss)
          & (j.ss >= lo * j.ws) & (j.ss <= hi * j.ws)
          & (j.ws >= lo * j.ss) & (j.ws <= hi * j.ss)
          & (j.cs >= lo * j.ws) & (j.cs <= hi * j.ws)
          & (j.ws >= lo * j.cs) & (j.ws <= hi * j.cs))
    j = j[ok]
    avg = (j.ss + j.cs + j.ws) / 3.0
    exp = pd.DataFrame({
        "item_id": j.index, "ss_item_rev": j.ss,
        "ss_dev": j.ss / avg * 100.0, "cs_item_rev": j.cs,
        "cs_dev": j.cs / avg * 100.0, "ws_item_rev": j.ws,
        "ws_dev": j.ws / avg * 100.0, "average": avg,
    }).sort_values(["item_id", "ss_item_rev"]).head(100)
    assert len(exp) > 0
    _approx_rows(got, exp, {c: c for c in exp.columns})


# --------------------------------------------------------------- q75

def test_q75(dfs):
    # the only (category, year) pair whose net sales drop below 0.9x
    # at SF0.01 (verified by sweeping all categories x 1998-2002)
    year, category = 2002, "Shoes"
    it_all = dfs["item"]
    got = run_plan_pydict(
        tpcds_plan(75, year=year, category=category).build())

    dd = dfs["date_dim"].set_index("d_date_sk")["d_year"]
    it = it_all[it_all.i_category == category].set_index("i_item_sk")[
        ["i_brand_id", "i_class_id", "i_category_id", "i_manufact_id"]]

    def detail(fact, pfx, rfact, rpfx, okey, rokey, ramt=None):
        ramt = ramt or f"{rpfx}_return_amt"
        f = dfs[fact].copy()
        f = f[f[f"{pfx}_item_sk"].isin(it.index)]
        f = f.join(it, on=f"{pfx}_item_sk", how="inner")
        f["d_year"] = f[f"{pfx}_sold_date_sk"].map(dd)
        f = f[f.d_year.notna()]
        r = dfs[rfact][[rokey, f"{rpfx}_item_sk",
                        f"{rpfx}_return_quantity", ramt]]
        f = f.merge(r, how="left",
                    left_on=[okey, f"{pfx}_item_sk"],
                    right_on=[rokey, f"{rpfx}_item_sk"])
        out = pd.DataFrame({
            "d_year": f.d_year,
            "i_brand_id": f.i_brand_id, "i_class_id": f.i_class_id,
            "i_category_id": f.i_category_id,
            "i_manufact_id": f.i_manufact_id,
            "sales_cnt": f[f"{pfx}_quantity"]
            - f[f"{rpfx}_return_quantity"].fillna(0),
            "sales_amt": f[f"{pfx}_ext_sales_price"]
            - f[ramt].fillna(0.0),
        })
        return out

    det = pd.concat([
        detail("catalog_sales", "cs", "catalog_returns", "cr",
               "cs_order_number", "cr_order_number",
               ramt="cr_return_amount"),
        detail("store_sales", "ss", "store_returns", "sr",
               "ss_ticket_number", "sr_ticket_number"),
        detail("web_sales", "ws", "web_returns", "wr",
               "ws_order_number", "wr_order_number"),
    ]).drop_duplicates()
    keys = ["d_year", "i_brand_id", "i_class_id", "i_category_id",
            "i_manufact_id"]
    tot = det.groupby(keys, dropna=False)[
        ["sales_cnt", "sales_amt"]].sum().reset_index()
    ids = ["i_brand_id", "i_class_id", "i_category_id",
           "i_manufact_id"]
    curr = tot[tot.d_year == year + 1]
    prev = tot[tot.d_year == year]
    j = curr.merge(prev, on=ids, suffixes=("_c", "_p"))
    j = j[j.sales_cnt_c / j.sales_cnt_p < 0.9]
    exp = pd.DataFrame({
        "prev_year": year, "year_": year + 1,
        "i_brand_id": j.i_brand_id, "i_class_id": j.i_class_id,
        "i_category_id": j.i_category_id,
        "i_manufact_id": j.i_manufact_id,
        "prev_yr_cnt": j.sales_cnt_p, "curr_yr_cnt": j.sales_cnt_c,
        "sales_cnt_diff": j.sales_cnt_c - j.sales_cnt_p,
        "sales_amt_diff": j.sales_amt_c - j.sales_amt_p,
    }).sort_values(["sales_cnt_diff", "sales_amt_diff"]).head(100)
    assert len(exp) > 0
    _approx_rows(got, exp, {c: c for c in exp.columns})


# ------------------------------------------------- q5 / q77 / q80

def _date_window(dfs, day, days):
    import datetime as dt

    d0 = dt.date.fromisoformat(day)
    d1 = d0 + dt.timedelta(days=days)
    dd = dfs["date_dim"]
    dates = pd.to_datetime(dd.d_date).dt.date
    return set(dd[(dates >= d0) & (dates <= d1)].d_date_sk)


def _check_rollup(got, detail, order_cols=("channel", "id")):
    """Compare engine ROLLUP(channel, id) output rows to a pandas
    per-(channel, id) detail frame with sales/returns/profit."""
    lvl0 = detail.groupby(["channel", "id"], dropna=False)[
        ["sales", "returns_", "profit"]].sum().reset_index()
    lvl1 = (detail.groupby(["channel"])[
        ["sales", "returns_", "profit"]].sum().reset_index()
        .assign(id=None))
    lvl2 = detail[["sales", "returns_", "profit"]].sum().to_frame().T
    lvl2["channel"] = None
    lvl2["id"] = None
    exp = (pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
           .sort_values(list(order_cols), na_position="last",
                        kind="mergesort")
           .head(100))
    assert len(exp) > 3
    _approx_rows(got, exp, {
        "channel": "channel", "id": "id", "sales": "sales",
        "returns_": "returns_", "profit": "profit"})


def test_q5(dfs):
    day = "2000-08-23"
    got = run_plan_pydict(tpcds_plan(5, day=day).build())
    sks = _date_window(dfs, day, 14)

    def leg(sales_tab, s_ent, s_date, s_price, s_profit, ret_tab,
            r_ent, r_date, r_amt, r_loss, dim, dk, did, label):
        s = dfs[sales_tab]
        s = s[s[s_date].isin(sks)]
        r = dfs[ret_tab]
        r = r[r[r_date].isin(sks)]
        dimdf = dfs[dim].set_index(dk)[did]
        srows = pd.DataFrame({
            "ent": s[s_ent], "sales": s[s_price],
            "profit_raw": s[s_profit], "returns_": 0.0,
            "loss": 0.0})
        rrows = pd.DataFrame({
            "ent": r[r_ent], "sales": 0.0, "profit_raw": 0.0,
            "returns_": r[r_amt], "loss": r[r_loss]})
        al = pd.concat([srows, rrows])
        al["id_raw"] = al.ent.map(dimdf)
        al = al[al.id_raw.notna()]
        g = al.groupby("id_raw")[
            ["sales", "returns_", "profit_raw", "loss"]].sum()
        return pd.DataFrame({
            "channel": f"{label} channel",
            "id": [f"{label}{i}" for i in g.index],
            "sales": g.sales.values, "returns_": g.returns_.values,
            "profit": (g.profit_raw - g.loss).values})

    ssr = leg("store_sales", "ss_store_sk", "ss_sold_date_sk",
              "ss_ext_sales_price", "ss_net_profit",
              "store_returns", "sr_store_sk", "sr_returned_date_sk",
              "sr_return_amt", "sr_net_loss",
              "store", "s_store_sk", "s_store_id", "store")
    csr = leg("catalog_sales", "cs_catalog_page_sk",
              "cs_sold_date_sk", "cs_ext_sales_price",
              "cs_net_profit", "catalog_returns",
              "cr_catalog_page_sk", "cr_returned_date_sk",
              "cr_return_amount", "cr_net_loss",
              "catalog_page", "cp_catalog_page_sk",
              "cp_catalog_page_id", "catalog_page")
    # web: returns route to the site of the originating sale
    wsl = dfs["web_sales"][["ws_item_sk", "ws_order_number",
                            "ws_web_site_sk"]]
    wr = dfs["web_returns"].merge(
        wsl, left_on=["wr_item_sk", "wr_order_number"],
        right_on=["ws_item_sk", "ws_order_number"], how="inner")
    ws = dfs["web_sales"]
    ws = ws[ws.ws_sold_date_sk.isin(sks)]
    wr = wr[wr.wr_returned_date_sk.isin(sks)]
    site = dfs["web_site"].set_index("web_site_sk")["web_site_id"]
    al = pd.concat([
        pd.DataFrame({"ent": ws.ws_web_site_sk,
                      "sales": ws.ws_ext_sales_price,
                      "profit_raw": ws.ws_net_profit,
                      "returns_": 0.0, "loss": 0.0}),
        pd.DataFrame({"ent": wr.ws_web_site_sk, "sales": 0.0,
                      "profit_raw": 0.0,
                      "returns_": wr.wr_return_amt,
                      "loss": wr.wr_net_loss})])
    al["id_raw"] = al.ent.map(site)
    al = al[al.id_raw.notna()]
    g = al.groupby("id_raw")[
        ["sales", "returns_", "profit_raw", "loss"]].sum()
    wsr = pd.DataFrame({
        "channel": "web channel",
        "id": [f"web_site{i}" for i in g.index],
        "sales": g.sales.values, "returns_": g.returns_.values,
        "profit": (g.profit_raw - g.loss).values})
    _check_rollup(got, pd.concat([ssr, csr, wsr], ignore_index=True))


def test_q77(dfs):
    day = "2000-08-23"
    got = run_plan_pydict(tpcds_plan(77, day=day).build())
    sks = _date_window(dfs, day, 30)

    ss_t = dfs["store_sales"]
    ss_t = ss_t[ss_t.ss_sold_date_sk.isin(sks)
                & ss_t.ss_store_sk.isin(set(dfs["store"].s_store_sk))]
    ss = ss_t.groupby("ss_store_sk").agg(
        sales=("ss_ext_sales_price", "sum"),
        profit=("ss_net_profit", "sum"))
    sr_t = dfs["store_returns"]
    sr_t = sr_t[sr_t.sr_returned_date_sk.isin(sks)
                & sr_t.sr_store_sk.isin(set(dfs["store"].s_store_sk))]
    sr = sr_t.groupby("sr_store_sk").agg(
        returns_=("sr_return_amt", "sum"),
        profit_loss=("sr_net_loss", "sum"))
    store = ss.join(sr, how="left")
    store_leg = pd.DataFrame({
        "channel": "store channel", "id": store.index,
        "sales": store.sales,
        "returns_": store.returns_.fillna(0.0),
        "profit": store.profit - store.profit_loss.fillna(0.0)})

    cs_t = dfs["catalog_sales"]
    cs_t = cs_t[cs_t.cs_sold_date_sk.isin(sks)
                & cs_t.cs_call_center_sk.notna()]
    cs = cs_t.groupby("cs_call_center_sk").agg(
        sales=("cs_ext_sales_price", "sum"),
        profit=("cs_net_profit", "sum"))
    cr_t = dfs["catalog_returns"]
    cr_t = cr_t[cr_t.cr_returned_date_sk.isin(sks)]
    r_tot, l_tot = (cr_t.cr_return_amount.sum(),
                    cr_t.cr_net_loss.sum())
    catalog_leg = pd.DataFrame({
        "channel": "catalog channel", "id": cs.index,
        "sales": cs.sales, "returns_": r_tot,
        "profit": cs.profit - l_tot})

    wpages = set(dfs["web_page"].wp_web_page_sk)
    ws_t = dfs["web_sales"]
    ws_t = ws_t[ws_t.ws_sold_date_sk.isin(sks)
                & ws_t.ws_web_page_sk.isin(wpages)]
    ws = ws_t.groupby("ws_web_page_sk").agg(
        sales=("ws_ext_sales_price", "sum"),
        profit=("ws_net_profit", "sum"))
    wr_t = dfs["web_returns"]
    wr_t = wr_t[wr_t.wr_returned_date_sk.isin(sks)
                & wr_t.wr_web_page_sk.isin(wpages)]
    wr = wr_t.groupby("wr_web_page_sk").agg(
        returns_=("wr_return_amt", "sum"),
        profit_loss=("wr_net_loss", "sum"))
    web = ws.join(wr, how="left")
    web_leg = pd.DataFrame({
        "channel": "web channel", "id": web.index,
        "sales": web.sales, "returns_": web.returns_.fillna(0.0),
        "profit": web.profit - web.profit_loss.fillna(0.0)})

    _check_rollup(got, pd.concat(
        [store_leg, catalog_leg, web_leg], ignore_index=True))


def test_q80(dfs):
    day, price = "2002-11-01", 5.0
    got = run_plan_pydict(tpcds_plan(80, day=day, price=price).build())
    sks = _date_window(dfs, day, 30)
    oki = set(dfs["item"][
        dfs["item"].i_current_price > price].i_item_sk)
    okp = set(dfs["promotion"][
        dfs["promotion"].p_channel_tv == "N"].p_promo_sk)

    def leg(fact, pfx, okey, rfact, rpfx, rokey, ramt, dim, dk, did,
            label, entcol):
        f = dfs[fact]
        f = f[f[f"{pfx}_sold_date_sk"].isin(sks)
              & f[f"{pfx}_item_sk"].isin(oki)
              & f[f"{pfx}_promo_sk"].isin(okp)]
        r = dfs[rfact][[f"{rpfx}_item_sk", rokey, ramt,
                        f"{rpfx}_net_loss"]]
        f = f.merge(r, how="left",
                    left_on=[f"{pfx}_item_sk", okey],
                    right_on=[f"{rpfx}_item_sk", rokey])
        dimdf = dfs[dim].set_index(dk)[did]
        f["id_raw"] = f[entcol].map(dimdf)
        f = f[f.id_raw.notna()]
        g = f.groupby("id_raw").apply(
            lambda x: pd.Series({
                "sales": x[f"{pfx}_ext_sales_price"].sum(),
                "returns_": x[ramt].fillna(0.0).sum(),
                "profit": (x[f"{pfx}_net_profit"]
                           - x[f"{rpfx}_net_loss"].fillna(0.0)
                           ).sum()}),
            include_groups=False)
        return pd.DataFrame({
            "channel": f"{label} channel",
            "id": [f"{label}{i}" for i in g.index],
            "sales": g.sales.values, "returns_": g.returns_.values,
            "profit": g.profit.values})

    ssr = leg("store_sales", "ss", "ss_ticket_number",
              "store_returns", "sr", "sr_ticket_number",
              "sr_return_amt", "store", "s_store_sk", "s_store_id",
              "store", "ss_store_sk")
    csr = leg("catalog_sales", "cs", "cs_order_number",
              "catalog_returns", "cr", "cr_order_number",
              "cr_return_amount", "catalog_page",
              "cp_catalog_page_sk", "cp_catalog_page_id",
              "catalog_page", "cs_catalog_page_sk")
    wsr = leg("web_sales", "ws", "ws_order_number", "web_returns",
              "wr", "wr_order_number", "wr_return_amt", "web_site",
              "web_site_sk", "web_site_id", "web_site",
              "ws_web_site_sk")
    _check_rollup(got, pd.concat([ssr, csr, wsr],
                                 ignore_index=True))
