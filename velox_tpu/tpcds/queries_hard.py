"""TPC-DS hard-query tier: multi-channel CTE giants.

The 16 queries the first 83 left open — year-over-year customer CTEs
(q4/q11/q74-family), channel profit-and-loss rollups (q5/q77/q80),
cross-channel INTERSECT item sets (q14/q23), cumulative-window crosses
(q51), wide rollup ranks (q67), and the two-year store/catalog monster
(q64). Plan shapes mirror the reference's TPC-DS harness
(velox/tpcds/gen; SQL text from the TPC-DS spec). CTE legs are built
once as PlanBuilder sub-plans and composed by joins/unions — the same
broadcast-join shapes the distributed runner shards over the mesh.
"""

from __future__ import annotations

from velox_tpu.plan import PlanBuilder


def _dim(table, columns, subfilter=None):
    return PlanBuilder().table_scan(table, columns=columns,
                                    subfilter=subfilter)


# ------------------------------------------------------------------
# q11 / q4: year-over-year per-customer channel totals
# ------------------------------------------------------------------

_CHAN_COLS = {
    "store_sales": ("ss_sold_date_sk", "ss_customer_sk", "ss_ext"),
    "catalog_sales": ("cs_sold_date_sk", "cs_bill_customer_sk", "cs_ext"),
    "web_sales": ("ws_sold_date_sk", "ws_bill_customer_sk", "ws_ext"),
}


def _year_total(fact: str, measure_cols, measure: str, year: int,
                out: str) -> PlanBuilder:
    """One year_total CTE leg: per-customer sum of ``measure`` over one
    year of ``fact`` (spec q4/q11 year_total)."""
    dcol, ccol, _ = _CHAN_COLS[fact]
    dt = _dim("date_dim", ["d_date_sk", "d_year"], f"d_year = {year}")
    return (
        PlanBuilder()
        .table_scan(fact, columns=[dcol, ccol, *measure_cols])
        .hash_join(dt, [dcol], ["d_date_sk"], "left_semi")
        .filter(f"is_not_null({ccol})")
        .project([ccol, f"{measure} AS m"])
        .aggregate([ccol], [f"sum(m) AS {out}"])
        .project([f"{ccol} AS {out}_c", out])
    )


def q11(year: int = 2001) -> PlanBuilder:
    """Customers whose web spend grew faster than store spend across
    two consecutive years (spec q11: 4 year_total legs over
    list-price-minus-discount, joined on customer)."""

    def leg(fact, pfx, y, out):
        return _year_total(
            fact, [f"{pfx}_ext_list_price", f"{pfx}_ext_discount_amt"],
            f"{pfx}_ext_list_price - {pfx}_ext_discount_amt", y, out)

    s1 = leg("store_sales", "ss", year, "s1")
    s2 = leg("store_sales", "ss", year + 1, "s2")
    w1 = leg("web_sales", "ws", year, "w1")
    w2 = leg("web_sales", "ws", year + 1, "w2")
    cu = _dim("customer", ["c_customer_sk", "c_customer_id",
                           "c_first_name", "c_last_name",
                           "c_preferred_cust_flag"])
    return (
        s1
        .hash_join(s2, ["s1_c"], ["s2_c"], "inner",
                   output=["s1_c", "s1", "s2"])
        .hash_join(w1, ["s1_c"], ["w1_c"], "inner",
                   output=["s1_c", "s1", "s2", "w1"])
        .hash_join(w2, ["s1_c"], ["w2_c"], "inner",
                   output=["s1_c", "s1", "s2", "w1", "w2"])
        .filter("s1 > 0 AND w1 > 0")
        .filter("w2 / w1 > s2 / s1")
        .hash_join(cu, ["s1_c"], ["c_customer_sk"], "inner",
                   output=["c_customer_id", "c_first_name",
                           "c_last_name", "c_preferred_cust_flag"])
        .order_by(["c_customer_id", "c_first_name", "c_last_name",
                   "c_preferred_cust_flag"])
        .limit(100)
    )


def q4(year: int = 2001) -> PlanBuilder:
    """Customers whose catalog growth beat both store and web growth
    (spec q4: 6 year_total legs over the half-profit measure)."""

    def leg(fact, pfx, y, out):
        return _year_total(
            fact,
            [f"{pfx}_ext_list_price", f"{pfx}_ext_wholesale_cost",
             f"{pfx}_ext_discount_amt", f"{pfx}_ext_sales_price"],
            f"(({pfx}_ext_list_price - {pfx}_ext_wholesale_cost"
            f" - {pfx}_ext_discount_amt) + {pfx}_ext_sales_price) / 2.0",
            y, out)

    s1 = leg("store_sales", "ss", year, "s1")
    s2 = leg("store_sales", "ss", year + 1, "s2")
    c1 = leg("catalog_sales", "cs", year, "c1")
    c2 = leg("catalog_sales", "cs", year + 1, "c2")
    w1 = leg("web_sales", "ws", year, "w1")
    w2 = leg("web_sales", "ws", year + 1, "w2")
    cu = _dim("customer", ["c_customer_sk", "c_customer_id",
                           "c_first_name", "c_last_name",
                           "c_email_address"])
    return (
        s1
        .hash_join(s2, ["s1_c"], ["s2_c"], "inner",
                   output=["s1_c", "s1", "s2"])
        .hash_join(c1, ["s1_c"], ["c1_c"], "inner",
                   output=["s1_c", "s1", "s2", "c1"])
        .hash_join(c2, ["s1_c"], ["c2_c"], "inner",
                   output=["s1_c", "s1", "s2", "c1", "c2"])
        .hash_join(w1, ["s1_c"], ["w1_c"], "inner",
                   output=["s1_c", "s1", "s2", "c1", "c2", "w1"])
        .hash_join(w2, ["s1_c"], ["w2_c"], "inner",
                   output=["s1_c", "s1", "s2", "c1", "c2", "w1",
                           "w2"])
        .filter("s1 > 0 AND c1 > 0 AND w1 > 0")
        .filter("c2 / c1 > s2 / s1 AND c2 / c1 > w2 / w1")
        .hash_join(cu, ["s1_c"], ["c_customer_sk"], "inner",
                   output=["c_customer_id", "c_first_name",
                           "c_last_name", "c_email_address"])
        .order_by(["c_customer_id", "c_first_name", "c_last_name",
                   "c_email_address"])
        .limit(100)
    )


# ------------------------------------------------------------------
# q58: per-item revenue within 10% across all three channels in one week
# ------------------------------------------------------------------

def _week_dates(day: str) -> PlanBuilder:
    """date_sk set of the week containing ``day`` (spec q58's nested
    d_week_seq subquery)."""
    wk = (PlanBuilder()
          .table_scan("date_dim", columns=["d_date", "d_week_seq"])
          .filter(f"d_date = DATE '{day}'")
          .project(["d_week_seq AS wk_seq"]))
    return (PlanBuilder()
            .table_scan("date_dim",
                        columns=["d_date_sk", "d_week_seq"])
            .hash_join(wk, ["d_week_seq"], ["wk_seq"], "left_semi")
            .project(["d_date_sk AS wd_sk"]))


def q58(day: str = "2000-01-03", tol: float = 0.1) -> PlanBuilder:
    """Items whose store/catalog/web revenues in one week are mutually
    within ``tol`` (spec q58: 10%; wider at tiny SF where three-channel
    overlap in one week is a handful of items)."""
    def leg(fact, dcol, icol, price, out):
        it = _dim("item", ["i_item_sk", "i_item_id"])
        return (
            PlanBuilder()
            .table_scan(fact, columns=[dcol, icol, price])
            .hash_join(_week_dates(day), [dcol], ["wd_sk"],
                       "left_semi")
            .hash_join(it, [icol], ["i_item_sk"], "inner",
                       output=["i_item_id", price])
            .aggregate(["i_item_id"], [f"sum({price}) AS {out}"])
            .project([f"i_item_id AS {out}_id", out])
        )

    ss = leg("store_sales", "ss_sold_date_sk", "ss_item_sk",
             "ss_ext_sales_price", "ss_item_rev")
    cs = leg("catalog_sales", "cs_sold_date_sk", "cs_item_sk",
             "cs_ext_sales_price", "cs_item_rev")
    ws = leg("web_sales", "ws_sold_date_sk", "ws_item_sk",
             "ws_ext_sales_price", "ws_item_rev")
    return (
        ss
        .hash_join(cs, ["ss_item_rev_id"], ["cs_item_rev_id"],
                   "inner",
                   output=["ss_item_rev_id", "ss_item_rev",
                           "cs_item_rev"])
        .hash_join(ws, ["ss_item_rev_id"], ["ws_item_rev_id"],
                   "inner",
                   output=["ss_item_rev_id", "ss_item_rev",
                           "cs_item_rev", "ws_item_rev"])
        .filter(" AND ".join(
            f"{a}_item_rev >= {1 - tol} * {b}_item_rev AND "
            f"{a}_item_rev <= {1 + tol} * {b}_item_rev"
            for a, b in (("ss", "cs"), ("cs", "ss"), ("ss", "ws"),
                         ("ws", "ss"), ("cs", "ws"), ("ws", "cs"))))
        .project(["ss_item_rev_id AS item_id", "ss_item_rev",
                  "ss_item_rev / ((ss_item_rev + cs_item_rev +"
                  " ws_item_rev) / 3.0) * 100.0 AS ss_dev",
                  "cs_item_rev",
                  "cs_item_rev / ((ss_item_rev + cs_item_rev +"
                  " ws_item_rev) / 3.0) * 100.0 AS cs_dev",
                  "ws_item_rev",
                  "ws_item_rev / ((ss_item_rev + cs_item_rev +"
                  " ws_item_rev) / 3.0) * 100.0 AS ws_dev",
                  "(ss_item_rev + cs_item_rev + ws_item_rev) / 3.0"
                  " AS average"])
        .order_by(["item_id", "ss_item_rev"])
        .limit(100)
    )


# ------------------------------------------------------------------
# q75: net sales (sales minus returns) year-over-year by item ids
# ------------------------------------------------------------------

def q75(year: int = 2001, category: str = "Books") -> PlanBuilder:
    """Brand/class/category/manufact cells whose current-year net unit
    sales dropped below 90% of the prior year's, across all three
    channels (spec q75)."""

    def detail(fact, pfx, rfact, rpfx, okey, rokey,
               ramt=None) -> PlanBuilder:
        ramt = ramt or f"{rpfx}_return_amt"
        it = _dim("item",
                  ["i_item_sk", "i_brand_id", "i_class_id",
                   "i_category_id", "i_manufact_id", "i_category"],
                  f"i_category = '{category}'")
        dt = _dim("date_dim", ["d_date_sk", "d_year"])
        ret = (PlanBuilder()
               .table_scan(rfact,
                           columns=[rokey, f"{rpfx}_item_sk",
                                    f"{rpfx}_return_quantity", ramt])
               .project([f"{rokey} AS r_ord",
                         f"{rpfx}_item_sk AS r_item",
                         f"{rpfx}_return_quantity AS r_qty",
                         f"{ramt} AS r_amt"]))
        return (
            PlanBuilder()
            .table_scan(fact,
                        columns=[f"{pfx}_sold_date_sk",
                                 f"{pfx}_item_sk", okey,
                                 f"{pfx}_quantity",
                                 f"{pfx}_ext_sales_price"])
            .hash_join(it, [f"{pfx}_item_sk"], ["i_item_sk"],
                       "inner",
                       output=[f"{pfx}_sold_date_sk", okey,
                               f"{pfx}_item_sk", f"{pfx}_quantity",
                               f"{pfx}_ext_sales_price",
                               "i_brand_id", "i_class_id",
                               "i_category_id", "i_manufact_id"])
            .hash_join(dt, [f"{pfx}_sold_date_sk"], ["d_date_sk"],
                       "inner",
                       output=["d_year", okey, f"{pfx}_item_sk",
                               f"{pfx}_quantity",
                               f"{pfx}_ext_sales_price",
                               "i_brand_id", "i_class_id",
                               "i_category_id", "i_manufact_id"])
            .hash_join(ret, [okey, f"{pfx}_item_sk"],
                       ["r_ord", "r_item"], "left",
                       output=["d_year", "i_brand_id", "i_class_id",
                               "i_category_id", "i_manufact_id",
                               f"{pfx}_quantity",
                               f"{pfx}_ext_sales_price", "r_qty",
                               "r_amt"])
            .project(["d_year", "i_brand_id", "i_class_id",
                      "i_category_id", "i_manufact_id",
                      f"{pfx}_quantity - coalesce(r_qty, 0)"
                      " AS sales_cnt",
                      f"{pfx}_ext_sales_price -"
                      " coalesce(r_amt, 0.0) AS sales_amt"])
        )

    legs = [
        detail("catalog_sales", "cs", "catalog_returns", "cr",
               "cs_order_number", "cr_order_number",
               ramt="cr_return_amount"),
        detail("store_sales", "ss", "store_returns", "sr",
               "ss_ticket_number", "sr_ticket_number"),
        detail("web_sales", "ws", "web_returns", "wr",
               "ws_order_number", "wr_order_number"),
    ]
    # spec uses UNION (distinct) across the three channel details
    all_sales = (
        legs[0].union_all(legs[1:])
        .distinct()
        .aggregate(["d_year", "i_brand_id", "i_class_id",
                    "i_category_id", "i_manufact_id"],
                   ["sum(sales_cnt) AS sales_cnt",
                    "sum(sales_amt) AS sales_amt"])
    )
    curr = (all_sales
            .filter(f"d_year = {year + 1}")
            .project(["i_brand_id AS cb", "i_class_id AS cc",
                      "i_category_id AS cg", "i_manufact_id AS cm",
                      "sales_cnt AS curr_cnt",
                      "sales_amt AS curr_amt"]))

    def build_prev():
        legs2 = [
            detail("catalog_sales", "cs", "catalog_returns", "cr",
                   "cs_order_number", "cr_order_number",
                   ramt="cr_return_amount"),
            detail("store_sales", "ss", "store_returns", "sr",
                   "ss_ticket_number", "sr_ticket_number"),
            detail("web_sales", "ws", "web_returns", "wr",
                   "ws_order_number", "wr_order_number"),
        ]
        return (legs2[0].union_all(legs2[1:])
                .distinct()
                .aggregate(["d_year", "i_brand_id", "i_class_id",
                            "i_category_id", "i_manufact_id"],
                           ["sum(sales_cnt) AS sales_cnt",
                            "sum(sales_amt) AS sales_amt"])
                .filter(f"d_year = {year}")
                .project(["i_brand_id AS pb", "i_class_id AS pc",
                          "i_category_id AS pg",
                          "i_manufact_id AS pm",
                          "sales_cnt AS prev_cnt",
                          "sales_amt AS prev_amt"]))

    return (
        curr
        .hash_join(build_prev(), ["cb", "cc", "cg", "cm"],
                   ["pb", "pc", "pg", "pm"], "inner",
                   output=["cb", "cc", "cg", "cm", "prev_cnt",
                           "curr_cnt", "prev_amt", "curr_amt"])
        .filter("cast(curr_cnt AS DOUBLE) / cast(prev_cnt AS DOUBLE)"
                " < 0.9")
        .project([f"{year} AS prev_year", f"{year + 1} AS year_",
                  "cb AS i_brand_id", "cc AS i_class_id",
                  "cg AS i_category_id", "cm AS i_manufact_id",
                  "prev_cnt AS prev_yr_cnt", "curr_cnt AS curr_yr_cnt",
                  "curr_cnt - prev_cnt AS sales_cnt_diff",
                  "curr_amt - prev_amt AS sales_amt_diff"])
        .order_by(["sales_cnt_diff", "sales_amt_diff"])
        .limit(100)
    )


# ------------------------------------------------------------------
# q5 / q77 / q80: channel profit-and-loss reports with ROLLUP
# ------------------------------------------------------------------

def _days_after(day: str, n: int) -> str:
    import datetime as _dt

    d = _dt.date.fromisoformat(day) + _dt.timedelta(days=n)
    return d.isoformat()


def _rollup_report(legs) -> PlanBuilder:
    """UNION ALL the channel legs (channel, id, sales, returns,
    profit), then GROUP BY ROLLUP(channel, id) (spec q5/q77/q80
    final select)."""
    return (
        legs[0].union_all(legs[1:])
        .group_id([["channel", "id"], ["channel"], []])
        .aggregate(["channel", "id", "group_id"],
                   ["sum(sales) AS sales", "sum(returns_) AS returns_",
                    "sum(profit) AS profit"])
        .project(["channel", "id", "sales", "returns_", "profit"])
        .order_by(["channel", "id"])
        .limit(100)
    )


def q5(day: str = "2000-08-23") -> PlanBuilder:
    """Channel P&L over 14 days: per-store / per-catalog-page /
    per-web-site sales, returns and profit with a channel ROLLUP
    (spec q5)."""
    d0, d1 = day, _days_after(day, 14)
    dt = _dim("date_dim", ["d_date_sk", "d_date"],
              f"d_date BETWEEN DATE '{d0}' AND DATE '{d1}'")

    def sales_returns(sales_tab, s_cols, s_proj, ret_tab, r_cols,
                      r_proj, dim, dim_keys, dim_id, label):
        sales = (PlanBuilder().table_scan(sales_tab, columns=s_cols)
                 .project(s_proj))
        rets = (PlanBuilder().table_scan(ret_tab, columns=r_cols)
                .project(r_proj))
        return (
            sales.union_all([rets])
            .hash_join(dt, ["date_sk"], ["d_date_sk"], "left_semi")
            .hash_join(dim, ["ent_sk"], [dim_keys], "inner",
                       output=[dim_id, "sales_price", "profit",
                               "return_amt", "net_loss"])
            .aggregate([dim_id],
                       ["sum(sales_price) AS sales",
                        "sum(return_amt) AS returns_",
                        "sum(profit) AS profit_raw",
                        "sum(net_loss) AS profit_loss"])
            .project([f"'{label} channel' AS channel",
                      f"concat('{label}', {dim_id}) AS id",
                      "sales", "returns_",
                      "profit_raw - profit_loss AS profit"])
        )

    st = _dim("store", ["s_store_sk", "s_store_id"])
    ssr = sales_returns(
        "store_sales",
        ["ss_store_sk", "ss_sold_date_sk", "ss_ext_sales_price",
         "ss_net_profit"],
        ["ss_store_sk AS ent_sk", "ss_sold_date_sk AS date_sk",
         "ss_ext_sales_price AS sales_price",
         "ss_net_profit AS profit", "0.0 AS return_amt",
         "0.0 AS net_loss"],
        "store_returns",
        ["sr_store_sk", "sr_returned_date_sk", "sr_return_amt",
         "sr_net_loss"],
        ["sr_store_sk AS ent_sk", "sr_returned_date_sk AS date_sk",
         "0.0 AS sales_price", "0.0 AS profit",
         "sr_return_amt AS return_amt", "sr_net_loss AS net_loss"],
        st, "s_store_sk", "s_store_id", "store")

    cp = _dim("catalog_page", ["cp_catalog_page_sk",
                               "cp_catalog_page_id"])
    csr = sales_returns(
        "catalog_sales",
        ["cs_catalog_page_sk", "cs_sold_date_sk",
         "cs_ext_sales_price", "cs_net_profit"],
        ["cs_catalog_page_sk AS ent_sk", "cs_sold_date_sk AS date_sk",
         "cs_ext_sales_price AS sales_price",
         "cs_net_profit AS profit", "0.0 AS return_amt",
         "0.0 AS net_loss"],
        "catalog_returns",
        ["cr_catalog_page_sk", "cr_returned_date_sk",
         "cr_return_amount", "cr_net_loss"],
        ["cr_catalog_page_sk AS ent_sk",
         "cr_returned_date_sk AS date_sk", "0.0 AS sales_price",
         "0.0 AS profit", "cr_return_amount AS return_amt",
         "cr_net_loss AS net_loss"],
        cp, "cp_catalog_page_sk", "cp_catalog_page_id",
        "catalog_page")

    # web returns find their site through the originating sale
    # (spec q5 wsr: web_returns LEFT OUTER JOIN web_sales on
    # item+order; an inner join here — null sites drop at the dim
    # join either way)
    ws_site = (PlanBuilder()
               .table_scan("web_sales",
                           columns=["ws_item_sk", "ws_order_number",
                                    "ws_web_site_sk"])
               .project(["ws_item_sk AS wsl_item",
                         "ws_order_number AS wsl_ord",
                         "ws_web_site_sk AS wsl_site"]))
    web_sales = (PlanBuilder()
                 .table_scan("web_sales",
                             columns=["ws_web_site_sk",
                                      "ws_sold_date_sk",
                                      "ws_ext_sales_price",
                                      "ws_net_profit"])
                 .project(["ws_web_site_sk AS ent_sk",
                           "ws_sold_date_sk AS date_sk",
                           "ws_ext_sales_price AS sales_price",
                           "ws_net_profit AS profit",
                           "0.0 AS return_amt", "0.0 AS net_loss"]))
    web_rets = (PlanBuilder()
                .table_scan("web_returns",
                            columns=["wr_item_sk", "wr_order_number",
                                     "wr_returned_date_sk",
                                     "wr_return_amt", "wr_net_loss"])
                .hash_join(ws_site,
                           ["wr_item_sk", "wr_order_number"],
                           ["wsl_item", "wsl_ord"], "inner",
                           output=["wsl_site", "wr_returned_date_sk",
                                   "wr_return_amt", "wr_net_loss"])
                .project(["wsl_site AS ent_sk",
                          "wr_returned_date_sk AS date_sk",
                          "0.0 AS sales_price", "0.0 AS profit",
                          "wr_return_amt AS return_amt",
                          "wr_net_loss AS net_loss"]))
    wsite = _dim("web_site", ["web_site_sk", "web_site_id"])
    wsr = (
        web_sales.union_all([web_rets])
        .hash_join(dt, ["date_sk"], ["d_date_sk"], "left_semi")
        .hash_join(wsite, ["ent_sk"], ["web_site_sk"], "inner",
                   output=["web_site_id", "sales_price", "profit",
                           "return_amt", "net_loss"])
        .aggregate(["web_site_id"],
                   ["sum(sales_price) AS sales",
                    "sum(return_amt) AS returns_",
                    "sum(profit) AS profit_raw",
                    "sum(net_loss) AS profit_loss"])
        .project(["'web channel' AS channel",
                  "concat('web_site', web_site_id) AS id",
                  "sales", "returns_",
                  "profit_raw - profit_loss AS profit"])
    )
    return _rollup_report([ssr, csr, wsr])


def q77(day: str = "2000-08-23") -> PlanBuilder:
    """Channel P&L over 30 days: store / call-center / web-page level
    sales vs returns, ROLLUP by channel (spec q77)."""
    d0, d1 = day, _days_after(day, 30)
    dt = _dim("date_dim", ["d_date_sk", "d_date"],
              f"d_date BETWEEN DATE '{d0}' AND DATE '{d1}'")

    def agg(fact, cols, dcol, key, sums, outs):
        return (
            PlanBuilder().table_scan(fact, columns=cols)
            .hash_join(dt, [dcol], ["d_date_sk"], "left_semi")
            .filter(f"is_not_null({key})")
            .aggregate([key],
                       [f"sum({c}) AS {o}" for c, o in
                        zip(sums, outs)])
        )

    st = _dim("store", ["s_store_sk"])
    ss = (PlanBuilder()
          .table_scan("store_sales",
                      columns=["ss_store_sk", "ss_sold_date_sk",
                               "ss_ext_sales_price",
                               "ss_net_profit"])
          .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"],
                     "left_semi")
          .hash_join(st, ["ss_store_sk"], ["s_store_sk"], "inner",
                     output=["s_store_sk", "ss_ext_sales_price",
                             "ss_net_profit"])
          .aggregate(["s_store_sk"],
                     ["sum(ss_ext_sales_price) AS sales",
                      "sum(ss_net_profit) AS profit"]))
    sr = (PlanBuilder()
          .table_scan("store_returns",
                      columns=["sr_store_sk", "sr_returned_date_sk",
                               "sr_return_amt", "sr_net_loss"])
          .hash_join(dt, ["sr_returned_date_sk"], ["d_date_sk"],
                     "left_semi")
          .hash_join(st, ["sr_store_sk"], ["s_store_sk"], "inner",
                     output=["s_store_sk", "sr_return_amt",
                             "sr_net_loss"])
          .aggregate(["s_store_sk"],
                     ["sum(sr_return_amt) AS returns_",
                      "sum(sr_net_loss) AS profit_loss"])
          .project(["s_store_sk AS sr_store_sk", "returns_",
                    "profit_loss"]))
    store_leg = (
        ss.hash_join(sr, ["s_store_sk"], ["sr_store_sk"], "left",
                     output=["s_store_sk", "sales", "profit",
                             "returns_", "profit_loss"])
        .project(["'store channel' AS channel", "s_store_sk AS id",
                  "sales", "coalesce(returns_, 0.0) AS returns_",
                  "profit - coalesce(profit_loss, 0.0) AS profit"]))

    cs = agg("catalog_sales",
             ["cs_call_center_sk", "cs_sold_date_sk",
              "cs_ext_sales_price", "cs_net_profit"],
             "cs_sold_date_sk", "cs_call_center_sk",
             ["cs_ext_sales_price", "cs_net_profit"],
             ["sales", "profit"])
    cr = (PlanBuilder()
          .table_scan("catalog_returns",
                      columns=["cr_returned_date_sk",
                               "cr_return_amount", "cr_net_loss"])
          .hash_join(dt, ["cr_returned_date_sk"], ["d_date_sk"],
                     "left_semi")
          .aggregate([], ["sum(cr_return_amount) AS returns_",
                          "sum(cr_net_loss) AS profit_loss"]))
    # spec q77: catalog sales and returns meet in a CROSS join (cr is
    # a one-row total, not keyed by call center)
    catalog_leg = (
        cs.cross_join(cr)
        .project(["'catalog channel' AS channel",
                  "cs_call_center_sk AS id", "sales", "returns_",
                  "profit - profit_loss AS profit"]))

    wp = _dim("web_page", ["wp_web_page_sk"])
    ws = (PlanBuilder()
          .table_scan("web_sales",
                      columns=["ws_web_page_sk", "ws_sold_date_sk",
                               "ws_ext_sales_price",
                               "ws_net_profit"])
          .hash_join(dt, ["ws_sold_date_sk"], ["d_date_sk"],
                     "left_semi")
          .hash_join(wp, ["ws_web_page_sk"], ["wp_web_page_sk"],
                     "inner",
                     output=["wp_web_page_sk", "ws_ext_sales_price",
                             "ws_net_profit"])
          .aggregate(["wp_web_page_sk"],
                     ["sum(ws_ext_sales_price) AS sales",
                      "sum(ws_net_profit) AS profit"]))
    wr = (PlanBuilder()
          .table_scan("web_returns",
                      columns=["wr_web_page_sk",
                               "wr_returned_date_sk",
                               "wr_return_amt", "wr_net_loss"])
          .hash_join(dt, ["wr_returned_date_sk"], ["d_date_sk"],
                     "left_semi")
          .hash_join(wp, ["wr_web_page_sk"], ["wp_web_page_sk"],
                     "inner",
                     output=["wp_web_page_sk", "wr_return_amt",
                             "wr_net_loss"])
          .aggregate(["wp_web_page_sk"],
                     ["sum(wr_return_amt) AS returns_",
                      "sum(wr_net_loss) AS profit_loss"])
          .project(["wp_web_page_sk AS wr_page_sk", "returns_",
                    "profit_loss"]))
    web_leg = (
        ws.hash_join(wr, ["wp_web_page_sk"], ["wr_page_sk"], "left",
                     output=["wp_web_page_sk", "sales", "profit",
                             "returns_", "profit_loss"])
        .project(["'web channel' AS channel",
                  "wp_web_page_sk AS id", "sales",
                  "coalesce(returns_, 0.0) AS returns_",
                  "profit - coalesce(profit_loss, 0.0) AS profit"]))

    return _rollup_report([store_leg, catalog_leg, web_leg])


def q80(day: str = "2000-08-23", price: float = 50.0) -> PlanBuilder:
    """Channel P&L over 30 days restricted to pricey non-TV-promoted
    items, sales LEFT JOIN returns at line granularity, channel ROLLUP
    (spec q80)."""
    d0, d1 = day, _days_after(day, 30)
    dt = _dim("date_dim", ["d_date_sk", "d_date"],
              f"d_date BETWEEN DATE '{d0}' AND DATE '{d1}'")
    it = _dim("item", ["i_item_sk", "i_current_price"],
              f"i_current_price > {price}")
    pr = _dim("promotion", ["p_promo_sk", "p_channel_tv"],
              "p_channel_tv = 'N'")

    def leg(fact, pfx, ikey, okey, pkey, rfact, rpfx, rokey, ramt,
            dim, dim_key, dim_id, label, entcol):
        rets = (PlanBuilder()
                .table_scan(rfact,
                            columns=[f"{rpfx}_item_sk", rokey, ramt,
                                     f"{rpfx}_net_loss"])
                .project([f"{rpfx}_item_sk AS r_item",
                          f"{rokey} AS r_ord", f"{ramt} AS r_amt",
                          f"{rpfx}_net_loss AS r_loss"]))
        return (
            PlanBuilder()
            .table_scan(fact,
                        columns=[f"{pfx}_sold_date_sk", ikey, okey,
                                 pkey, entcol,
                                 f"{pfx}_ext_sales_price",
                                 f"{pfx}_net_profit"])
            .hash_join(dt, [f"{pfx}_sold_date_sk"], ["d_date_sk"],
                       "left_semi")
            .hash_join(it, [ikey], ["i_item_sk"], "left_semi")
            .hash_join(pr, [pkey], ["p_promo_sk"], "left_semi")
            .hash_join(rets, [ikey, okey], ["r_item", "r_ord"],
                       "left",
                       output=[entcol, f"{pfx}_ext_sales_price",
                               f"{pfx}_net_profit", "r_amt",
                               "r_loss"])
            .hash_join(dim, [entcol], [dim_key], "inner",
                       output=[dim_id, f"{pfx}_ext_sales_price",
                               f"{pfx}_net_profit", "r_amt",
                               "r_loss"])
            .aggregate([dim_id],
                       [f"sum({pfx}_ext_sales_price) AS sales",
                        "sum(coalesce(r_amt, 0.0)) AS returns_",
                        f"sum({pfx}_net_profit -"
                        " coalesce(r_loss, 0.0)) AS profit"])
            .project([f"'{label} channel' AS channel",
                      f"concat('{label}', {dim_id}) AS id", "sales",
                      "returns_", "profit"])
        )

    ssr = leg("store_sales", "ss", "ss_item_sk", "ss_ticket_number",
              "ss_promo_sk", "store_returns", "sr",
              "sr_ticket_number", "sr_return_amt",
              _dim("store", ["s_store_sk", "s_store_id"]),
              "s_store_sk", "s_store_id", "store", "ss_store_sk")
    csr = leg("catalog_sales", "cs", "cs_item_sk", "cs_order_number",
              "cs_promo_sk", "catalog_returns", "cr",
              "cr_order_number", "cr_return_amount",
              _dim("catalog_page",
                   ["cp_catalog_page_sk", "cp_catalog_page_id"]),
              "cp_catalog_page_sk", "cp_catalog_page_id",
              "catalog_page", "cs_catalog_page_sk")
    wsr = leg("web_sales", "ws", "ws_item_sk", "ws_order_number",
              "ws_promo_sk", "web_returns", "wr", "wr_order_number",
              "wr_return_amt",
              _dim("web_site", ["web_site_sk", "web_site_id"]),
              "web_site_sk", "web_site_id", "web_site",
              "ws_web_site_sk")
    return _rollup_report([ssr, csr, wsr])


HARD_QUERIES = {4: q4, 5: q5, 11: q11, 58: q58, 75: q75, 77: q77,
                80: q80}
