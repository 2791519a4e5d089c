"""Map lambdas + concat (velox/functions/prestosql/MapFunctions.h,
MapConcat.cpp): transform_values / map_filter / map_concat."""

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.types.types import map_
from velox_tpu.vector.batch import Batch


def _mb():
    return Batch.from_pydict(
        {"m": [{"a": 1, "b": 2}, {}, None, {"c": -3}],
         "n": [{"a": 10, "z": 9}, {"q": 1}, {"x": 5}, None]},
        {"m": map_(VARCHAR, BIGINT), "n": map_(VARCHAR, BIGINT)})


def test_transform_values():
    out = run_plan_pydict(
        PlanBuilder().values([_mb()])
        .project(["transform_values(m, (k, v) -> v * 2) AS t"])
        .build())
    assert [None if x is None else dict(x) for x in out["t"]] == [
        {"a": 2, "b": 4}, {}, None, {"c": -6}]


def test_map_filter():
    out = run_plan_pydict(
        PlanBuilder().values([_mb()])
        .project(["map_filter(m, (k, v) -> v > 0) AS f"]).build())
    assert [None if x is None else dict(x) for x in out["f"]] == [
        {"a": 1, "b": 2}, {}, None, {}]


def test_map_concat():
    out = run_plan_pydict(
        PlanBuilder().values([_mb()])
        .project(["map_concat(m, n) AS c"]).build())
    # later map wins duplicate keys; null map -> null result
    assert [None if x is None else dict(x) for x in out["c"]] == [
        {"a": 10, "b": 2, "z": 9}, {"q": 1}, None, None]


def test_map_concat_bigint_keys():
    import numpy as np

    rng = np.random.default_rng(9)
    rows_m = [{int(k): float(v) for k, v in
               zip(rng.integers(0, 10, rng.integers(0, 5)),
                   rng.normal(size=5))} for _ in range(300)]
    rows_n = [{int(k): float(v) for k, v in
               zip(rng.integers(0, 10, rng.integers(0, 5)),
                   rng.normal(size=5))} for _ in range(300)]
    b = Batch.from_pydict({"m": rows_m, "n": rows_n},
                          {"m": map_(BIGINT, DOUBLE),
                           "n": map_(BIGINT, DOUBLE)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .project(["map_concat(m, n) AS c"]).build())
    for got, m, n in zip(out["c"], rows_m, rows_n):
        assert dict(got) == {**m, **n}
