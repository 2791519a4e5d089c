"""CPU reference baseline for TPC-H Q1/Q3/Q6/Q18 on dbgen-exact data.

The north-star comparison is `velox_tpch_benchmark` built from
/root/reference (velox/benchmarks/tpch/TpchBenchmark.cpp:27-60). That build
is infeasible in this image: velox requires CMake >= 3.28 (image has
3.25.1) and folly/boost/fmt/glog/gflags/xsimd, none of which are installed,
with zero network egress to fetch them (attempt recorded in BASELINE.md).

The strongest available stand-in is pyarrow's Acero engine — the same
architectural family as velox (C++ vectorized columnar engine,
multi-threaded morsel-driven hash joins/aggregations; Arrow is velox's
sister project). This script runs the four BASELINE.json queries through
Acero on the identical dbgen bytes, steady-state (tables preloaded in
memory, best of N runs), and reports rows/s over the dominant input table
— the same metric definition bench.py uses for the TPU numbers.

Usage: python tools/cpu_baseline.py [sf] [iters]
Prints one JSON object with per-query wall/rows_per_s.
"""

from __future__ import annotations

import json
import sys
import time

import pyarrow as pa
import pyarrow.acero as ac
import pyarrow.compute as pc


def _src(table: pa.Table) -> ac.Declaration:
    return ac.Declaration("table_source", ac.TableSourceNodeOptions(table))


def _agg(decl, aggs, keys):
    return ac.Declaration.from_sequence(
        [decl, ac.Declaration("aggregate",
                              ac.AggregateNodeOptions(aggs, keys=keys))])


def q6(t):
    li = t["lineitem"]
    f = ac.Declaration.from_sequence([
        _src(li),
        ac.Declaration("filter", ac.FilterNodeOptions(
            (pc.field("l_shipdate") >= pa.scalar(8766, pa.date32()))
            & (pc.field("l_shipdate") < pa.scalar(9131, pa.date32()))
            & (pc.field("l_discount") >= 0.05)
            & (pc.field("l_discount") <= 0.07)
            & (pc.field("l_quantity") < 24.0))),
        ac.Declaration("project", ac.ProjectNodeOptions(
            [pc.multiply(pc.field("l_extendedprice"),
                         pc.field("l_discount"))], ["rev"])),
        ac.Declaration("aggregate", ac.AggregateNodeOptions(
            [("rev", "sum", None, "revenue")])),
    ])
    return f.to_table(use_threads=True)


def q1(t):
    li = t["lineitem"]
    f = ac.Declaration.from_sequence([
        _src(li),
        ac.Declaration("filter", ac.FilterNodeOptions(
            pc.field("l_shipdate") <= pa.scalar(10471, pa.date32()))),
        ac.Declaration("project", ac.ProjectNodeOptions(
            [pc.field("l_returnflag"), pc.field("l_linestatus"),
             pc.field("l_quantity"), pc.field("l_extendedprice"),
             pc.field("l_discount"),
             pc.multiply(pc.field("l_extendedprice"),
                         pc.subtract(pc.scalar(1.0), pc.field("l_discount"))),
             pc.multiply(
                 pc.multiply(pc.field("l_extendedprice"),
                             pc.subtract(pc.scalar(1.0),
                                         pc.field("l_discount"))),
                 pc.add(pc.scalar(1.0), pc.field("l_tax")))],
            ["l_returnflag", "l_linestatus", "qty", "price", "disc",
             "disc_price", "charge"])),
        ac.Declaration("aggregate", ac.AggregateNodeOptions(
            [("qty", "hash_sum", None, "sum_qty"),
             ("price", "hash_sum", None, "sum_base_price"),
             ("disc_price", "hash_sum", None, "sum_disc_price"),
             ("charge", "hash_sum", None, "sum_charge"),
             ("qty", "hash_mean", None, "avg_qty"),
             ("price", "hash_mean", None, "avg_price"),
             ("disc", "hash_mean", None, "avg_disc"),
             ("qty", "hash_count", None, "count_order")],
            keys=["l_returnflag", "l_linestatus"])),
    ])
    return f.to_table(use_threads=True).sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def q3(t):
    cust = ac.Declaration.from_sequence([
        _src(t["customer"]),
        ac.Declaration("filter", ac.FilterNodeOptions(
            pc.field("c_mktsegment") == "BUILDING")),
    ])
    orders = ac.Declaration.from_sequence([
        _src(t["orders"]),
        ac.Declaration("filter", ac.FilterNodeOptions(
            pc.field("o_orderdate") < pa.scalar(9204, pa.date32()))),
    ])
    li = ac.Declaration.from_sequence([
        _src(t["lineitem"]),
        ac.Declaration("filter", ac.FilterNodeOptions(
            pc.field("l_shipdate") > pa.scalar(9204, pa.date32()))),
    ])
    j1 = ac.Declaration("hashjoin", ac.HashJoinNodeOptions(
        "inner", left_keys="c_custkey", right_keys="o_custkey"),
        inputs=[cust, orders])
    j2 = ac.Declaration("hashjoin", ac.HashJoinNodeOptions(
        "inner", left_keys="o_orderkey", right_keys="l_orderkey"),
        inputs=[j1, li])
    f = ac.Declaration.from_sequence([
        j2,
        ac.Declaration("project", ac.ProjectNodeOptions(
            [pc.field("l_orderkey"), pc.field("o_orderdate"),
             pc.field("o_shippriority"),
             pc.multiply(pc.field("l_extendedprice"),
                         pc.subtract(pc.scalar(1.0),
                                     pc.field("l_discount")))],
            ["l_orderkey", "o_orderdate", "o_shippriority", "volume"])),
        ac.Declaration("aggregate", ac.AggregateNodeOptions(
            [("volume", "hash_sum", None, "revenue")],
            keys=["l_orderkey", "o_orderdate", "o_shippriority"])),
    ])
    out = f.to_table(use_threads=True)
    out = out.sort_by([("revenue", "descending"),
                       ("o_orderdate", "ascending")]).slice(0, 10)
    return out


def q18(t):
    li = t["lineitem"]
    grouped = ac.Declaration.from_sequence([
        _src(li),
        ac.Declaration("aggregate", ac.AggregateNodeOptions(
            [("l_quantity", "hash_sum", None, "qty")], keys=["l_orderkey"])),
        ac.Declaration("filter", ac.FilterNodeOptions(
            pc.field("qty") > 300.0)),
    ])
    j1 = ac.Declaration("hashjoin", ac.HashJoinNodeOptions(
        "inner", left_keys="l_orderkey", right_keys="o_orderkey"),
        inputs=[grouped, _src(t["orders"])])
    j2 = ac.Declaration("hashjoin", ac.HashJoinNodeOptions(
        "inner", left_keys="o_custkey", right_keys="c_custkey"),
        inputs=[j1, _src(t["customer"])])
    out = ac.Declaration.from_sequence([
        j2,
        ac.Declaration("project", ac.ProjectNodeOptions(
            [pc.field("c_name"), pc.field("c_custkey"),
             pc.field("o_orderkey"), pc.field("o_orderdate"),
             pc.field("o_totalprice"), pc.field("qty")],
            ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
             "o_totalprice", "total_qty"])),
    ]).to_table(use_threads=True)
    return out.sort_by([("o_totalprice", "descending"),
                        ("o_orderdate", "ascending")]).slice(0, 100)


QUERIES = {"q1": (q1, "lineitem"), "q3": (q3, "lineitem"),
           "q6": (q6, "lineitem"), "q18": (q18, "lineitem")}


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from velox_tpu.io import dbgen
    tables = dbgen.dbgen_tables(sf)

    results = {}
    for name, (fn, dominant) in QUERIES.items():
        times = []
        rows_out = None
        for _ in range(iters):
            t0 = time.time()
            out = fn(tables)
            times.append(time.time() - t0)
            rows_out = out.num_rows
        best = min(times)
        n = tables[dominant].num_rows
        results[name] = {
            "wall_ms": round(best * 1e3, 1),
            "rows_per_s": round(n / best),
            "out_rows": rows_out,
        }
        print(f"# {name}: best {best*1e3:.1f}ms "
              f"({n/best/1e6:.1f}M rows/s, {rows_out} out)",
              file=sys.stderr)
    print(json.dumps({"engine": "pyarrow-acero", "sf": sf, **results}))


if __name__ == "__main__":
    main()
