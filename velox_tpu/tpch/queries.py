"""TPC-H query plans (PlanBuilder programs).

Each ``qN()`` mirrors the reference's TpchQueryBuilder plan shapes
(velox/exec/tests/utils/TpchQueryBuilder.cpp:145-187): filters pushed into
scans, build sides chosen small-side-right, semi joins for IN subqueries.
Tables must be registered first (velox_tpu.io.tpch.register_tpch).
"""

from __future__ import annotations

from velox_tpu.plan import PlanBuilder


def q1() -> PlanBuilder:
    return (
        PlanBuilder()
        .table_scan(
            "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax",
                     "l_shipdate"],
            subfilter="l_shipdate <= DATE '1998-12-01' - INTERVAL '90' DAY")
        .project([
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
            "l_extendedprice * (1.0 - l_discount) AS disc_price",
            "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge",
        ])
        .aggregate(
            ["l_returnflag", "l_linestatus"],
            ["sum(l_quantity) AS sum_qty",
             "sum(l_extendedprice) AS sum_base_price",
             "sum(disc_price) AS sum_disc_price",
             "sum(charge) AS sum_charge",
             "avg(l_quantity) AS avg_qty",
             "avg(l_extendedprice) AS avg_price",
             "avg(l_discount) AS avg_disc",
             "count(*) AS count_order"])
        .order_by(["l_returnflag", "l_linestatus"])
    )


def q3() -> PlanBuilder:
    customers = (
        PlanBuilder()
        .table_scan("customer", columns=["c_custkey", "c_mktsegment"],
                    subfilter="c_mktsegment = 'BUILDING'")
        .project(["c_custkey"]))
    orders = (
        PlanBuilder()
        .table_scan("orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_shippriority"],
                    subfilter="o_orderdate < DATE '1995-03-15'")
        .hash_join(customers, ["o_custkey"], ["c_custkey"], "left_semi",
                   output=["o_orderkey", "o_orderdate", "o_shippriority"]))
    return (
        PlanBuilder()
        .table_scan("lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount",
                             "l_shipdate"],
                    subfilter="l_shipdate > DATE '1995-03-15'")
        .hash_join(orders, ["l_orderkey"], ["o_orderkey"], "inner",
                   output=["l_orderkey", "l_extendedprice", "l_discount",
                           "o_orderdate", "o_shippriority"])
        .project(["l_orderkey", "o_orderdate", "o_shippriority",
                  "l_extendedprice * (1.0 - l_discount) AS part_rev"])
        .aggregate(["l_orderkey", "o_orderdate", "o_shippriority"],
                   ["sum(part_rev) AS revenue"])
        .top_n(["revenue DESC", "o_orderdate"], 10)
        .project(["l_orderkey", "revenue", "o_orderdate", "o_shippriority"])
    )


def q5() -> PlanBuilder:
    nations_in_region = (
        PlanBuilder()
        .table_scan("nation",
                    columns=["n_nationkey", "n_name", "n_regionkey"])
        .hash_join(
            PlanBuilder().table_scan(
                "region", columns=["r_regionkey", "r_name"],
                subfilter="r_name = 'ASIA'").project(["r_regionkey"]),
            ["n_regionkey"], ["r_regionkey"], "left_semi",
            output=["n_nationkey", "n_name"]))
    suppliers = (
        PlanBuilder()
        .table_scan("supplier", columns=["s_suppkey", "s_nationkey"])
        .hash_join(nations_in_region, ["s_nationkey"], ["n_nationkey"],
                   "inner", output=["s_suppkey", "s_nationkey", "n_name"]))
    orders = (
        PlanBuilder()
        .table_scan(
            "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
            subfilter="o_orderdate >= DATE '1994-01-01' AND "
                      "o_orderdate < DATE '1995-01-01'")
        .hash_join(
            PlanBuilder().table_scan(
                "customer", columns=["c_custkey", "c_nationkey"]),
            ["o_custkey"], ["c_custkey"], "inner",
            output=["o_orderkey", "c_nationkey"]))
    return (
        PlanBuilder()
        .table_scan("lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])
        .hash_join(orders, ["l_orderkey"], ["o_orderkey"], "inner",
                   output=["l_suppkey", "l_extendedprice", "l_discount",
                           "c_nationkey"])
        .hash_join(suppliers, ["l_suppkey", "c_nationkey"],
                   ["s_suppkey", "s_nationkey"], "inner",
                   output=["l_extendedprice", "l_discount", "n_name"])
        .project(["n_name",
                  "l_extendedprice * (1.0 - l_discount) AS part_rev"])
        .aggregate(["n_name"], ["sum(part_rev) AS revenue"])
        .order_by(["revenue DESC"])
    )


def q6() -> PlanBuilder:
    return (
        PlanBuilder()
        .table_scan(
            "lineitem",
            columns=["l_extendedprice", "l_discount", "l_quantity",
                     "l_shipdate"],
            subfilter="l_shipdate >= DATE '1994-01-01' AND "
                      "l_shipdate < DATE '1995-01-01' AND "
                      "l_discount BETWEEN 0.05 AND 0.07 AND "
                      "l_quantity < 24.0")
        .project(["l_extendedprice * l_discount AS part_rev"])
        .aggregate([], ["sum(part_rev) AS revenue"])
    )


def q10() -> PlanBuilder:
    orders = (
        PlanBuilder()
        .table_scan(
            "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
            subfilter="o_orderdate >= DATE '1993-10-01' AND "
                      "o_orderdate < DATE '1994-01-01'")
        .project(["o_orderkey", "o_custkey"]))
    lineitem = (
        PlanBuilder()
        .table_scan("lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount",
                             "l_returnflag"],
                    subfilter="l_returnflag = 'R'")
        .hash_join(orders, ["l_orderkey"], ["o_orderkey"], "inner",
                   output=["l_extendedprice", "l_discount", "o_custkey"]))
    customer = (
        PlanBuilder()
        .table_scan("customer",
                    columns=["c_custkey", "c_name", "c_acctbal",
                             "c_nationkey", "c_address", "c_phone",
                             "c_comment"])
        .hash_join(
            PlanBuilder().table_scan(
                "nation", columns=["n_nationkey", "n_name"]),
            ["c_nationkey"], ["n_nationkey"], "inner",
            output=["c_custkey", "c_name", "c_acctbal", "c_address",
                    "c_phone", "c_comment", "n_name"]))
    return (
        lineitem
        .hash_join(customer, ["o_custkey"], ["c_custkey"], "inner",
                   output=["l_extendedprice", "l_discount", "c_custkey",
                           "c_name", "c_acctbal", "c_address", "c_phone",
                           "c_comment", "n_name"])
        .project(["c_custkey", "c_name", "c_acctbal", "c_address",
                  "c_phone", "c_comment", "n_name",
                  "l_extendedprice * (1.0 - l_discount) AS part_rev"])
        .aggregate(
            ["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
             "c_address", "c_comment"],
            ["sum(part_rev) AS revenue"])
        .top_n(["revenue DESC"], 20)
        .project(["c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
                  "c_address", "c_phone", "c_comment"])
    )


def q18() -> PlanBuilder:
    big_orders = (
        PlanBuilder()
        .table_scan("lineitem", columns=["l_orderkey", "l_quantity"])
        .aggregate(["l_orderkey"], ["sum(l_quantity) AS total_qty"])
        .filter("total_qty > 300.0")
        .project(["l_orderkey AS big_okey"]))
    orders = (
        PlanBuilder()
        .table_scan("orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate",
                             "o_totalprice"])
        .hash_join(big_orders, ["o_orderkey"], ["big_okey"], "left_semi")
        .hash_join(
            PlanBuilder().table_scan(
                "customer", columns=["c_custkey", "c_name"]),
            ["o_custkey"], ["c_custkey"], "inner",
            output=["o_orderkey", "o_orderdate", "o_totalprice",
                    "c_custkey", "c_name"]))
    return (
        PlanBuilder()
        .table_scan("lineitem", columns=["l_orderkey", "l_quantity"])
        .hash_join(orders, ["l_orderkey"], ["o_orderkey"], "inner",
                   output=["l_quantity", "o_orderkey", "o_orderdate",
                           "o_totalprice", "c_custkey", "c_name"])
        .aggregate(
            ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
             "o_totalprice"],
            ["sum(l_quantity) AS sum_qty"])
        .top_n(["o_totalprice DESC", "o_orderdate"], 100)
        .project(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                  "o_totalprice", "sum_qty"])
    )


_QUERIES = {1: q1, 3: q3, 5: q5, 6: q6, 10: q10, 18: q18}

SUPPORTED_QUERIES = sorted(_QUERIES)


def tpch_plan(n: int) -> PlanBuilder:
    try:
        return _QUERIES[n]()
    except KeyError:
        raise NotImplementedError(f"TPC-H Q{n} not implemented yet")
