"""ROW-typed intermediate columns: row_constructor, field access over
ROW intermediates, map_entries / zip producing ARRAY(ROW(...)) — the
RowVector-as-intermediate half of velox/vector/ComplexVector.h:31 (the
scan side shreds structs instead, tests/test_row_columns.py)."""

import pyarrow as pa
import pytest

from velox_tpu.exec import run_plan, run_plan_pydict
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.plan import PlanBuilder


@pytest.fixture
def scalars():
    register_arrow("rc_t", pa.table({
        "id": [1, 2, 3, 4],
        "a": [10, None, 30, 40],
        "s": ["x", "y", None, "w"],
        "f": [1.5, 2.5, 3.5, 4.5],
    }), 128)
    yield
    drop_table("rc_t")


def test_row_constructor_and_output(scalars):
    out = run_plan_pydict(
        PlanBuilder().table_scan("rc_t")
        .project(["id", "row_constructor(a, s) AS r"]).build())
    assert out["r"] == [
        {"c1": 10, "c2": "x"},
        {"c1": None, "c2": "y"},
        {"c1": 30, "c2": None},
        {"c1": 40, "c2": "w"},
    ]


def test_row_constructor_exprs_and_field_access(scalars):
    out = run_plan_pydict(
        PlanBuilder().table_scan("rc_t")
        .project(["id", "row_constructor(a + 1, f * 2.0) AS r"])
        .project(["id", "r.c1 AS a1", "r.c2 AS f2"]).build())
    assert out["a1"] == [11, None, 31, 41]
    assert out["f2"] == [3.0, 5.0, 7.0, 9.0]


def test_row_field_in_filter(scalars):
    out = run_plan_pydict(
        PlanBuilder().table_scan("rc_t")
        .project(["id", "row_constructor(a, s) AS r"])
        .filter("r.c1 > 15")
        .project(["id", "r.c1 AS a"]).build())
    assert out["id"] == [3, 4]
    assert out["a"] == [30, 40]


def test_row_passthrough_and_arrow_type(scalars):
    t = run_plan(
        PlanBuilder().table_scan("rc_t")
        .project(["id", "row_constructor(a, s) AS r"])
        .project(["r", "id"]).build())
    assert pa.types.is_struct(t.schema.field("r").type)
    assert t.column("r").to_pylist()[0] == {"c1": 10, "c2": "x"}


def test_map_entries():
    register_arrow("me_t", pa.table({
        "id": [1, 2, 3],
        "m": pa.array(
            [{"a": 1, "b": 2}, {}, None],
            type=pa.map_(pa.string(), pa.int64())),
    }), 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("me_t")
            .project(["id", "map_entries(m) AS e"]).build())
        assert out["e"][0] == [{"key": "a", "value": 1},
                               {"key": "b", "value": 2}]
        assert out["e"][1] == []
        assert out["e"][2] is None
    finally:
        drop_table("me_t")


def test_zip_pads_shorter_with_nulls():
    register_arrow("z_t", pa.table({
        "id": [1, 2, 3],
        "xs": [[1, 2, 3], [4], None],
        "ys": [[10, 20], [40, 50], [60]],
    }), 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("z_t")
            .project(["id", "zip(xs, ys) AS z"]).build())
        assert out["z"][0] == [{"c1": 1, "c2": 10}, {"c1": 2, "c2": 20},
                               {"c1": 3, "c2": None}]
        assert out["z"][1] == [{"c1": 4, "c2": 40},
                               {"c1": None, "c2": 50}]
        assert out["z"][2] is None
    finally:
        drop_table("z_t")


def test_row_of_complex_child_passthrough():
    register_arrow("rx_t", pa.table({
        "id": [1, 2],
        "xs": [[1, 2], [3]],
    }), 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("rx_t")
            .project(["id", "row_constructor(id, xs) AS r"])
            .project(["id", "r.c2 AS back"]).build())
        assert out["back"] == [[1, 2], [3]]
    finally:
        drop_table("rx_t")
