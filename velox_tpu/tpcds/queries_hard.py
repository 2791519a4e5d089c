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


HARD_QUERIES = {4: q4, 11: q11, 58: q58, 75: q75}
