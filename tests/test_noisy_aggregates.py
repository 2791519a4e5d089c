"""noisy_*_gaussian aggregates (NoisyCountGaussianAggregate.cpp etc).

noise_scale=0 -> exact (the reference's own test convention); scale>0
with explicit seed -> deterministic, and statistically centered.
"""

import numpy as np

from velox_tpu.exec import run_plan
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, BOOLEAN, DOUBLE
from velox_tpu.vector.batch import Batch


def _run(plan):
    return run_plan(plan.build()).to_pydict()


def _batch(n=500, seed=0):
    rng = np.random.default_rng(seed)
    return Batch.from_pydict(
        {"k": [int(v) for v in rng.integers(0, 5, n)],
         "x": [None if rng.random() < 0.1 else float(np.round(v, 3))
               for v in rng.normal(size=n)],
         "b": [bool(v) for v in rng.random(n) < 0.4]},
        {"k": BIGINT, "x": DOUBLE, "b": BOOLEAN})


def test_noise_scale_zero_is_exact():
    b = _batch()
    out = _run(PlanBuilder().values([b]).aggregate(
        ["k"], ["noisy_count_gaussian(x, 0.0) AS nc",
                "noisy_count_if_gaussian(b, 0.0) AS ni",
                "noisy_sum_gaussian(x, 0.0) AS ns",
                "noisy_avg_gaussian(x, 0.0) AS na",
                "count(x) AS c", "count_if(b) AS ci",
                "sum(x) AS s", "avg(x) AS a"]))
    assert out["nc"] == out["c"]
    assert out["ni"] == out["ci"]
    for g in range(len(out["k"])):
        assert abs(out["ns"][g] - out["s"][g]) < 1e-9
        assert abs(out["na"][g] - out["a"][g]) < 1e-9


def test_seeded_noise_is_deterministic_and_centered():
    b = _batch(2000, seed=1)
    plan = (PlanBuilder().values([b]).aggregate(
        ["k"], ["noisy_sum_gaussian(x, 2.0, 7) AS ns",
                "sum(x) AS s"]))
    o1, o2 = _run(plan), _run(plan)
    assert o1["ns"] == o2["ns"]          # same seed -> same draw
    diffs = np.array(o1["ns"]) - np.array(o1["s"])
    assert np.all(diffs != 0)            # noise actually applied
    assert np.all(np.abs(diffs) < 2.0 * 6)   # within 6 sigma
    # different seed -> different draw
    o3 = _run(PlanBuilder().values([b]).aggregate(
        ["k"], ["noisy_sum_gaussian(x, 2.0, 8) AS ns"]))
    assert o3["ns"] != o1["ns"]


def test_noisy_count_clips_at_zero():
    b = Batch.from_pydict({"x": [1.0]}, {"x": DOUBLE})
    # huge negative-capable noise, many seeds: never below zero
    for seed in range(6):
        out = _run(PlanBuilder().values([b]).aggregate(
            [], [f"noisy_count_gaussian(x, 50.0, {seed}) AS nc"]))
        assert out["nc"][0] >= 0


def test_partial_final_split_matches_single():
    b = _batch(800, seed=2)
    single = _run(PlanBuilder().values([b]).aggregate(
        ["k"], ["noisy_sum_gaussian(x, 1.5, 3) AS ns"]))
    split = _run(PlanBuilder().values([b])
                 .partial_aggregation(
                     ["k"], ["noisy_sum_gaussian(x, 1.5, 3) AS ns"])
                 .final_aggregation())
    assert dict(zip(single["k"], single["ns"])) == dict(
        zip(split["k"], split["ns"]))
