"""Array scalar functions over ArrayColumn derived lanes.

Parity: velox/functions/prestosql/ArrayFunctions.h (cardinality,
array_sum, array_average, contains, element_at) with Presto null rules.
"""

import pytest

from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.types.types import array as array_type
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _run(data, types, exprs, filter=None):
    pb = PlanBuilder().values([Batch.from_pydict(data, types)])
    if filter:
        pb = pb.filter(filter)
    return run_plan_pydict(pb.project(exprs).build())


ARRS = {"id": [1, 2, 3, 4],
        "xs": [[1, 2, 3], [], None, [10, None, 30]]}
TYPES = {"id": BIGINT, "xs": array_type(BIGINT)}


def test_cardinality():
    out = _run(ARRS, TYPES, ["id", "cardinality(xs) as c"])
    assert out["c"] == [3, 0, None, 3]


def test_array_sum_skips_null_elements():
    out = _run(ARRS, TYPES, ["array_sum(xs) as s"])
    assert out["s"] == [6, 0, None, 40]


def test_array_sum_double():
    out = _run({"xs": [[1.5, 2.5], [0.25]]},
               {"xs": array_type(DOUBLE)}, ["array_sum(xs) as s"])
    assert out["s"] == [4.0, 0.25]


def test_array_average():
    out = _run(ARRS, TYPES, ["array_average(xs) as a"])
    assert out["a"] == [2.0, None, None, 20.0]


def test_contains():
    out = _run(ARRS, TYPES,
               ["contains(xs, 2) as c2", "contains(xs, 99) as c99"])
    assert out["c2"] == [True, False, None, None]
    assert out["c99"] == [False, False, None, None]
    # found beats null elements (Presto rule)
    out = _run(ARRS, TYPES, ["contains(xs, 10) as c"])
    assert out["c"][3] is True


def test_element_at():
    out = _run(ARRS, TYPES, [
        "element_at(xs, 1) as e1", "element_at(xs, -1) as em1",
        "element_at(xs, 5) as e5",
    ])
    assert out["e1"] == [1, None, None, 10]
    assert out["em1"] == [3, None, None, 30]
    assert out["e5"] == [None, None, None, None]
    # null element inside bounds
    out = _run(ARRS, TYPES, ["element_at(xs, 2) as e"])
    assert out["e"] == [2, None, None, None]


def test_string_arrays():
    data = {"tags": [["red", "green"], ["blue"], ["red", None]]}
    types = {"tags": array_type(VARCHAR)}
    out = _run(data, types, [
        "contains(tags, 'red') as has_red",
        "element_at(tags, 1) as first",
        "cardinality(tags) as n",
    ])
    assert out["has_red"] == [True, False, True]
    assert out["first"] == ["red", "blue", "red"]
    assert out["n"] == [2, 1, 2]


def test_array_exprs_in_filter():
    out = _run(ARRS, TYPES, ["id"], filter="array_sum(xs) > 10")
    assert out["id"] == [4]


def test_array_fn_composed_with_scalars():
    out = _run(ARRS, TYPES,
               ["cardinality(xs) * 10 + id as z"])
    assert out["z"] == [31, 2, None, 34]


def test_project_array_passthrough():
    out = _run(ARRS, TYPES, ["xs", "id + 1 as j"])
    assert out["xs"] == ARRS["xs"]
    assert out["j"] == [2, 3, 4, 5]


def test_scan_filter_then_unnest_with_arrays_present():
    # fusion must stay disabled when ARRAY columns flow through the chain
    from velox_tpu.io.catalog import drop_table, register_table

    b = Batch.from_pydict(ARRS, TYPES)
    register_table("arr_t", [b])
    try:
        plan = (PlanBuilder().table_scan("arr_t")
                .filter("id <= 2")
                .unnest(["id"], ["xs"])
                .aggregate([], ["sum(xs) as s", "count(xs) as c"])
                .build())
        out = run_plan_pydict(plan)
        assert out == {"s": [6], "c": [3]}
    finally:
        drop_table("arr_t")


def test_sequence():
    out = _run({"a": [1, 5, 3, None], "b": [3, 4, 2, 7]},
               {"a": BIGINT, "b": BIGINT},
               ["sequence(a, b) as s"])
    assert out["s"] == [[1, 2, 3], [], [], None]


def test_sequence_then_unnest_and_sum():
    b = Batch.from_pydict({"n": [2, 4]}, {"n": BIGINT})
    plan = (PlanBuilder().values([b])
            .project(["n", "sequence(1, n) as s"])
            .project(["n", "array_sum(s) as t",
                      "cardinality(s) as c"])
            .build())
    out = run_plan_pydict(plan)
    assert out["t"] == [3, 10]
    assert out["c"] == [2, 4]
    plan2 = (PlanBuilder().values([b])
             .project(["n", "sequence(1, n) as s"])
             .unnest(["n"], ["s"])
             .aggregate(["n"], ["sum(s) as t"])
             .order_by(["n"]).build())
    out2 = run_plan_pydict(plan2)
    assert out2 == {"n": [2, 4], "t": [3, 10]}


def test_array_position():
    out = _run(ARRS, TYPES, [
        "array_position(xs, 2) as p2",
        "array_position(xs, 99) as p9",
        "array_position(xs, 30) as p30",
    ])
    assert out["p2"] == [2, 0, None, 0]
    assert out["p9"] == [0, 0, None, 0]
    assert out["p30"] == [0, 0, None, 3]
    # duplicates: first index wins
    out2 = _run({"xs": [[7, 5, 7]]}, {"xs": array_type(BIGINT)},
                ["array_position(xs, 7) as p"])
    assert out2["p"] == [1]


def test_slice():
    out = _run(ARRS, TYPES, ["slice(xs, 2, 2) as s"])
    assert out["s"] == [[2, 3], [], None, [None, 30]]
    out2 = _run({"xs": [[1, 2, 3, 4]]}, {"xs": array_type(BIGINT)},
                ["slice(xs, -2, 5) as s"])
    assert out2["s"] == [[3, 4]]


def test_repeat():
    out = _run({"v": [7, None], "n": [3, 2]},
               {"v": BIGINT, "n": BIGINT},
               ["repeat(v, n) as r"])
    assert out["r"] == [[7, 7, 7], [None, None]]


def test_slice_composes():
    b = Batch.from_pydict(ARRS, TYPES)
    plan = (PlanBuilder().values([b])
            .project(["id", "slice(xs, 1, 2) as s"])
            .project(["id", "array_sum(s) as t"])
            .build())
    out = run_plan_pydict(plan)
    assert out["t"] == [3, 0, None, 10]


def test_array_min_max():
    from velox_tpu.types.types import array as array_t

    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"a": [[3, 1, 7], [], [5], None, [2, None, -4]],
         "f": [[1.5, -2.25], [0.0], None, [9.0, 9.5], []]},
        {"a": array_t(BIGINT), "f": array_t(DOUBLE)})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project([
            "array_min(a) AS lo", "array_max(a) AS hi",
            "array_min(f) AS flo", "array_max(f) AS fhi"]).build())
    assert out["lo"] == [1, None, 5, None, -4]
    assert out["hi"] == [7, None, 5, None, 2]
    assert out["flo"] == [-2.25, 0.0, None, 9.0, None]
    assert out["fhi"] == [1.5, 0.0, None, 9.5, None]


def test_array_sort_and_distinct():
    from velox_tpu.types.types import array as array_t

    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"a": [[3, 1, 2, 1], [], [9, 9], None, [5, -1]]},
        {"a": array_t(BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project([
            "array_sort(a) AS s", "array_distinct(a) AS d",
            "cardinality(a) AS n"]).build())
    assert out["s"] == [[1, 1, 2, 3], [], [9, 9], None, [-1, 5]]
    # distinct preserves FIRST-occurrence (arrival) order
    assert out["d"] == [[3, 1, 2], [], [9], None, [5, -1]]
    assert out["n"] == [4, 0, 2, None, 2]


def test_array_set_ops():
    from velox_tpu.types.types import array as array_t

    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"a": [[1, 2, 2, 3], [], [5, 6], None, [7]],
         "b": [[2, 3, 4], [1], [6, 6, 5], [1], None]},
        {"a": array_t(BIGINT), "b": array_t(BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project([
            "array_intersect(a, b) AS i", "array_except(a, b) AS e",
            "array_union(a, b) AS u", "arrays_overlap(a, b) AS o"])
        .build())
    assert out["i"] == [[2, 3], [], [5, 6], None, None]
    assert out["e"] == [[1], [], [], None, None]
    # union keeps first-seen order (a side first)
    assert out["u"] == [[1, 2, 3, 4], [1], [5, 6], None, None]
    assert out["o"] == [True, False, True, None, None]


def test_array_set_ops_doubles_with_null_elements():
    from velox_tpu.types.types import array as array_t

    from velox_tpu.types import DOUBLE
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"a": [[1.5, None, 2.5]], "b": [[None, 3.5, 1.5]]},
        {"a": array_t(DOUBLE), "b": array_t(DOUBLE)})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project([
            "array_intersect(a, b) AS i",
            "array_union(a, b) AS u"]).build())
    # null element matches null element (presto array_intersect)
    assert out["i"] == [[1.5, None]]
    assert out["u"] == [[1.5, None, 2.5, 3.5]]


def test_split():
    from velox_tpu.types import VARCHAR
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"s": ["a,b,c", "", "x", None, "a,,b"]}, {"s": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project(["split(s, ',') AS p"])
        .project(["p", "cardinality(p) AS n"]).build())
    assert out["p"] == [["a", "b", "c"], [""], ["x"], None, ["a", "", "b"]]
    assert out["n"] == [3, 1, 1, None, 3]


def test_split_with_limit():
    from velox_tpu.types import VARCHAR
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict({"s": ["a,b,c,d"]}, {"s": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project(
            ["split(s, ',', 2) AS p"]).build())
    # limit keeps the remainder in the last piece (SplitFunctions.cpp)
    assert out["p"] == [["a", "b,c,d"]]


def test_filter_lambda_and_array_remove():
    from velox_tpu.types.types import array as array_t

    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"a": [[1, -2, 3, None], [], None, [-5, -6]]},
        {"a": array_t(BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project([
            "filter(a, x -> x > 0) AS f",
            "array_remove(a, 3) AS r"]).build())
    assert out["f"] == [[1, 3], [], None, []]
    # array_remove keeps null elements (presto semantics)
    assert out["r"] == [[1, -2, None], [], None, [-5, -6]]


def test_transform_keys():
    from velox_tpu.types import BIGINT
    from velox_tpu.types.types import map_
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"m": [{1: 10, 2: 20}, None, {}]},
        {"m": map_(BIGINT, BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .project(["transform_keys(m, (k, v) -> k * 100) AS t"])
        .build())
    assert [None if x is None else dict(x) for x in out["t"]] == [
        {100: 10, 200: 20}, None, {}]


def test_zip_with_concat_reverse():
    from velox_tpu.types.types import array as array_t

    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"a": [[1, 2, 3], [10], None, []],
         "b": [[100, 200], [1, 2, 3], [5], [7]]},
        {"a": array_t(BIGINT), "b": array_t(BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b]).project([
            "zip_with(a, b, (x, y) -> x + y) AS z",
            "concat(a, b) AS c",
            "reverse(a) AS r"]).build())
    # shorter side null-padded -> null results at the tail
    assert out["z"] == [[101, 202, None], [11, None, None], None,
                        [None]]
    assert out["c"] == [[1, 2, 3, 100, 200], [10, 1, 2, 3], None,
                        [7]]
    assert out["r"] == [[3, 2, 1], [10], None, []]
