"""Nested ROW columns via columnar shredding: struct ingest, subfield
access expressions, subfield-pruned scans, struct reassembly on output
(velox/vector/ComplexVector.h RowVector + type/Subfield.h analog)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from velox_tpu.exec import run_plan, run_plan_pydict
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.plan import PlanBuilder


def _tbl():
    return pa.table({
        "id": [1, 2, 3, 4],
        "s": [{"a": 10, "b": 1.5}, {"a": 20, "b": 2.5},
              None, {"a": 40, "b": 4.5}],
        "nested": [{"inner": {"x": 7}}, {"inner": {"x": 8}},
                   {"inner": {"x": 9}}, {"inner": None}],
    })


def test_struct_scan_and_subfield_expr():
    register_arrow("rt", _tbl(), 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("rt")
            .filter("s.a >= 20")
            .project(["id", "s.a + 1 AS a1", "s.b AS b",
                      "nested.inner.x AS x"]).build())
        assert out["id"] == [2, 4]
        assert out["a1"] == [21, 41]
        assert out["b"] == [2.5, 4.5]
        assert out["x"] == [8, None]
    finally:
        drop_table("rt")


def test_struct_column_expansion_and_reassembly():
    register_arrow("rt2", _tbl(), 128)
    try:
        t = run_plan(
            PlanBuilder().table_scan("rt2", columns=["id", "s"]).build())
        assert set(t.column_names) == {"id", "s"}
        s = t.column("s").to_pylist()
        # parent-struct nulls shred into null leaves (arrow flatten)
        assert s[0] == {"a": 10, "b": 1.5}
        assert s[2] == {"a": None, "b": None}
    finally:
        drop_table("rt2")


def test_subfield_pruned_parquet_scan(tmp_path):
    from velox_tpu.io.catalog import register_parquet

    path = tmp_path / "n.parquet"
    pq.write_table(_tbl(), path)
    register_parquet("rtp", str(path), batch_rows=64)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("rtp", columns=["id", "s.a"])
            .aggregate([], ["sum(s.a) AS t"]).build())
        assert out["t"] == [70]
    finally:
        drop_table("rtp")


def test_group_by_subfield():
    tbl = pa.table({
        "s": [{"k": "x", "v": 1}, {"k": "y", "v": 2},
              {"k": "x", "v": 3}]})
    register_arrow("rt3", tbl, 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("rt3")
            .project(["s.k AS k", "s.v AS v"])
            .aggregate(["k"], ["sum(v) AS t"])
            .order_by(["k"]).build())
        assert out["k"] == ["x", "y"]
        assert out["t"] == [4, 2]
        # un-aliased subfield keys reassemble into a struct on output
        out2 = run_plan_pydict(
            PlanBuilder().table_scan("rt3")
            .aggregate(["s.k"], ["sum(s.v) AS t"]).build())
        assert sorted(x["k"] for x in out2["s"]) == ["x", "y"]
    finally:
        drop_table("rt3")
