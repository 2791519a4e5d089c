"""array/set/map_agg partial+final page forms.

The reference generates companions for every aggregate and spills
serialized ValueList accumulators (velox/exec/
AggregateCompanionAdapter.h:24; Aggregate.h:47). Here the partial page
IS the engine's native collected ARRAY/MAP column (name$0); FINAL
expands it back to element rows and re-runs the single-step collect
kernels (addIntermediateResults analog, Aggregate.h:227)."""

import numpy as np
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch

TYPES = {"k": BIGINT, "v": DOUBLE, "mk": BIGINT, "m": BIGINT}


def _batches(seed=0, n=400, parts=2):
    rng = np.random.default_rng(seed)
    data = {
        "k": rng.integers(0, 6, n).tolist(),
        "v": [None if rng.random() < 0.1 else
              float(np.round(x, 3)) for x in rng.normal(size=n)],
        "mk": rng.integers(0, 9, n).tolist(),
        "m": rng.integers(0, 2, n).tolist(),
    }
    cut = n // parts
    return [Batch.from_pydict(
        {c: data[c][i: i + cut] for c in data}, TYPES)
        for i in range(0, n, cut)]


def _nsort(xs):
    return sorted(xs, key=lambda x: (x is None, x))


@pytest.mark.parametrize("agg,cmp", [
    ("array_agg(v) AS a", "multiset"),
    ("set_agg(mk) AS a", "set"),
    ("map_agg(mk, v) AS a", "map"),
])
def test_partial_final_matches_single(agg, cmp):
    bs = _batches()
    single = run_plan_pydict(
        PlanBuilder().values(bs).aggregate(["k"], [agg])
        .order_by(["k"]).build())
    pf = run_plan_pydict(
        PlanBuilder().values(bs).partial_aggregation(["k"], [agg])
        .final_aggregation().order_by(["k"]).build())
    assert single["k"] == pf["k"]
    for a, b in zip(single["a"], pf["a"]):
        if cmp == "map":
            assert dict(a) == dict(b)
        else:
            assert _nsort(a) == _nsort(b)


def test_partial_page_schema():
    bs = _batches(parts=1)
    part = run_plan_pydict(
        PlanBuilder().values(bs)
        .partial_aggregation(["k"], ["array_agg(v) AS a"]).build())
    assert set(part) == {"k", "a$0"}
    assert all(isinstance(x, list) for x in part["a$0"])


def test_partial_final_with_mask():
    bs = _batches()
    single = run_plan_pydict(
        PlanBuilder().values(bs)
        .aggregate(["k"], ["array_agg(v) AS a"], masks={"a": "m"})
        .order_by(["k"]).build())
    pf = run_plan_pydict(
        PlanBuilder().values(bs)
        .partial_aggregation(["k"], ["array_agg(v) AS a"],
                             masks={"a": "m"})
        .final_aggregation().order_by(["k"]).build())
    assert single["k"] == pf["k"]
    for a, b in zip(single["a"], pf["a"]):
        assert _nsort(a) == _nsort(b)


def test_keyless_partial_final():
    bs = _batches()
    single = run_plan_pydict(
        PlanBuilder().values(bs)
        .aggregate([], ["set_agg(mk) AS a"]).build())
    pf = run_plan_pydict(
        PlanBuilder().values(bs)
        .partial_aggregation([], ["set_agg(mk) AS a"])
        .final_aggregation().build())
    assert _nsort(single["a"][0]) == _nsort(pf["a"][0])


def test_mixed_collect_and_lane_aggs_rejected():
    bs = _batches(parts=1)
    with pytest.raises(NotImplementedError):
        run_plan_pydict(
            PlanBuilder().values(bs)
            .partial_aggregation(["k"], ["array_agg(v) AS a",
                                         "sum(v) AS s"])
            .final_aggregation().build())
