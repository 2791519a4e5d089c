"""Unnest + LocalPartition operators, ArrayColumn vector layer.

Oracle = pandas explode; parity targets velox/exec/tests/UnnestTest.cpp.
"""

import pyarrow as pa

from velox_tpu.types import BIGINT, VARCHAR
from velox_tpu.types.types import array as array_type
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector import from_arrow
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import ArrayColumn


def _values_plan(data, types):
    return PlanBuilder().values([Batch.from_pydict(data, types)])


def test_array_column_roundtrip():
    b = Batch.from_pydict(
        {"id": [1, 2, 3, 4],
         "xs": [[10, 20], [], None, [30]]},
        {"id": BIGINT, "xs": array_type(BIGINT)})
    assert isinstance(b.column("xs"), ArrayColumn)
    out = b.to_pydict()
    assert out["xs"] == [[10, 20], [], None, [30]]


def test_arrow_list_roundtrip():
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "xs": pa.array([[1, 2, 3], None, [4]], pa.list_(pa.int64())),
    })
    b = from_arrow(t)
    out = b.to_pydict()
    assert out["xs"] == [[1, 2, 3], None, [4]]


def test_unnest_basic():
    plan = (_values_plan(
        {"id": [1, 2, 3, 4],
         "xs": [[10, 20], [], None, [30, 40, 50]]},
        {"id": BIGINT, "xs": array_type(BIGINT)})
        .unnest(["id"], ["xs"])
        .build())
    out = run_plan_pydict(plan)
    assert out["id"] == [1, 1, 4, 4, 4]
    assert out["xs"] == [10, 20, 30, 40, 50]


def test_unnest_ordinality():
    plan = (_values_plan(
        {"id": [7, 8], "xs": [[5], [6, 9]]},
        {"id": BIGINT, "xs": array_type(BIGINT)})
        .unnest(["id"], ["xs"], ordinality="ord")
        .build())
    out = run_plan_pydict(plan)
    assert out["id"] == [7, 8, 8]
    assert out["xs"] == [5, 6, 9]
    assert out["ord"] == [1, 1, 2]


def test_unnest_multi_column_pads_nulls():
    plan = (_values_plan(
        {"id": [1, 2],
         "a": [[1, 2, 3], [4]],
         "b": [["x"], ["y", "z"]]},
        {"id": BIGINT, "a": array_type(BIGINT), "b": array_type(VARCHAR)})
        .unnest(["id"], ["a", "b"])
        .build())
    out = run_plan_pydict(plan)
    assert out["id"] == [1, 1, 1, 2, 2]
    assert out["a"] == [1, 2, 3, 4, None]
    assert out["b"] == ["x", None, None, "y", "z"]


def test_unnest_strings_then_filter():
    plan = (_values_plan(
        {"id": [1, 2],
         "tags": [["red", "green"], ["red", "blue", "red"]]},
        {"id": BIGINT, "tags": array_type(VARCHAR)})
        .unnest(["id"], ["tags"])
        .filter("tags = 'red'")
        .build())
    out = run_plan_pydict(plan)
    assert out["id"] == [1, 2, 2]
    assert out["tags"] == ["red", "red", "red"]


def test_unnest_then_aggregate():
    plan = (_values_plan(
        {"g": [1, 1, 2], "xs": [[1, 2], [3], [10, 20]]},
        {"g": BIGINT, "xs": array_type(BIGINT)})
        .unnest(["g"], ["xs"])
        .aggregate(["g"], ["sum(xs) as s", "count(xs) as c"])
        .order_by(["g"])
        .build())
    out = run_plan_pydict(plan)
    assert out["g"] == [1, 2]
    assert out["s"] == [6, 30]
    assert out["c"] == [3, 2]


def test_local_partition_passthrough():
    plan = (_values_plan(
        {"k": [1, 2, 3, 4]}, {"k": BIGINT})
        .local_partition(["k"], 4)
        .aggregate([], ["sum(k) as s"])
        .build())
    out = run_plan_pydict(plan)
    assert out["s"] == [10]
