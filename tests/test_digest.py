"""tdigest_agg / qdigest_agg / merge + value_at_quantile scalars.

Reference behavior: velox/functions/prestosql/aggregates/
TDigestAggregate.cpp, TDigestFunctions.h. Accuracy assertions compare
against exact numpy percentiles (digests here are built from exact
sorted runs, so mid-range quantiles land within a couple of percent).
"""

import numpy as np
import pytest

from velox_tpu.exec import run_plan
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.vector.batch import Batch


def _run(plan):
    return run_plan(plan.build()).to_pydict()


def test_tdigest_value_at_quantile_global():
    rng = np.random.default_rng(3)
    x = rng.normal(size=5000)
    b = Batch.from_pydict({"x": [float(v) for v in x]}, {"x": DOUBLE})
    out = _run(PlanBuilder().values([b])
               .aggregate([], ["tdigest_agg(x) AS d"])
               .project(["value_at_quantile(d, 0.5) AS med",
                         "value_at_quantile(d, 0.9) AS p90",
                         "value_at_quantile(d, 0.0) AS lo",
                         "value_at_quantile(d, 1.0) AS hi"]))
    assert abs(out["med"][0] - np.quantile(x, 0.5)) < 0.05
    assert abs(out["p90"][0] - np.quantile(x, 0.9)) < 0.05
    assert out["lo"][0] == pytest.approx(x.min())
    assert out["hi"][0] == pytest.approx(x.max())


def test_tdigest_grouped_and_quantile_at_value():
    rng = np.random.default_rng(4)
    k = rng.integers(0, 4, 4000)
    x = rng.normal(loc=k * 10.0, size=4000)
    b = Batch.from_pydict(
        {"k": [int(v) for v in k], "x": [float(v) for v in x]},
        {"k": BIGINT, "x": DOUBLE})
    out = _run(PlanBuilder().values([b])
               .aggregate(["k"], ["tdigest_agg(x) AS d"])
               .project(["k", "value_at_quantile(d, 0.5) AS med",
                         "quantile_at_value(d, 0.0) AS q0"]))
    for kk, med, q0 in zip(out["k"], out["med"], out["q0"]):
        ex = np.quantile(x[k == kk], 0.5)
        assert abs(med - ex) < 0.15, (kk, med, ex)
        # rank of 0.0 under N(10k, 1): ~0.5 for k=0, ~0 for k>=1
        assert abs(q0 - float(np.mean(x[k == kk] <= 0.0))) < 0.05


def test_qdigest_integral_rounds():
    b = Batch.from_pydict({"x": list(range(1, 101))}, {"x": BIGINT})
    out = _run(PlanBuilder().values([b])
               .aggregate([], ["qdigest_agg(x) AS d"])
               .project(["value_at_quantile(d, 0.25) AS q1"]))
    v = out["q1"][0]
    assert v == round(v)          # integral source -> rounded answer
    assert abs(v - 25.5) <= 2.0


def test_merge_matches_global_digest():
    rng = np.random.default_rng(5)
    x = rng.exponential(size=6000)
    part = rng.integers(0, 3, 6000)
    b = Batch.from_pydict(
        {"p": [int(v) for v in part], "x": [float(v) for v in x]},
        {"p": BIGINT, "x": DOUBLE})
    # per-partition digests, then merge() back to one
    out = _run(PlanBuilder().values([b])
               .aggregate(["p"], ["tdigest_agg(x) AS d"])
               .aggregate([], ["merge(d) AS m"])
               .project(["value_at_quantile(m, 0.5) AS med",
                         "value_at_quantile(m, 0.99) AS p99"]))
    assert abs(out["med"][0] - np.quantile(x, 0.5)) < 0.05
    assert abs(out["p99"][0] - np.quantile(x, 0.99)) < 0.3


def test_tdigest_null_inputs_and_empty_group():
    b = Batch.from_pydict(
        {"k": [0, 0, 1], "x": [1.0, None, None]},
        {"k": BIGINT, "x": DOUBLE})
    out = _run(PlanBuilder().values([b])
               .aggregate(["k"], ["tdigest_agg(x) AS d"]))
    d = dict(zip(out["k"], out["d"]))
    assert d[0] is not None and d[0].startswith("TD1|")
    assert d[1] is None          # all-null group -> null digest
