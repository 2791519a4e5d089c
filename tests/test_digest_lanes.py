"""approx_percentile digest-lane companions (partial/final/spill).

velox parity: ApproxPercentileAggregate.cpp's KLL-sketch accumulator
(serialized partial form, velox/exec/Aggregate.h:47) re-designed as
fixed-width merging-digest matrix lanes
(functions/aggregates_digest.py). While every group holds <= K=64 rows
the digest is exact, so small-group results must equal the exact
SINGLE-step path; larger groups stay within the uniform-bin error
bound (~1/(2K) in quantile space).
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch

TYPES = {"k": BIGINT, "v": DOUBLE}


def _plans(batches, q):
    single = (PlanBuilder().values(batches)
              .aggregate(["k"], [f"approx_percentile(v, {q}) AS p"])
              .order_by(["k"]))
    pf = (PlanBuilder().values(batches)
          .partial_aggregation(
              ["k"], [f"approx_percentile(v, {q}) AS p"])
          .final_aggregation().order_by(["k"]))
    return single, pf


def test_small_groups_exact():
    rng = np.random.default_rng(2)
    n = 360  # 6 groups x 60 rows < K
    data = {"k": (np.arange(n) % 6).tolist(),
            "v": rng.normal(size=n).round(4).tolist()}
    for q in (0.1, 0.5, 0.9):
        for cut in (n, n // 3):
            batches = [
                Batch.from_pydict(
                    {c: data[c][i: i + cut] for c in data}, TYPES)
                for i in range(0, n, cut)]
            single, pf = _plans(batches, q)
            a = run_plan_pydict(single.build())
            b = run_plan_pydict(pf.build())
            assert a["k"] == b["k"]
            for x, y in zip(a["p"], b["p"]):
                assert x == pytest.approx(y, abs=1e-9), (q, cut)


def test_large_groups_error_bound():
    rng = np.random.default_rng(3)
    n = 40_000
    data = {"k": rng.integers(0, 4, n).tolist(),
            "v": rng.normal(size=n).round(5).tolist()}
    df = pd.DataFrame(data)
    b = Batch.from_pydict(data, TYPES)
    for q in (0.25, 0.75):
        _, pf = _plans([b], q)
        got = run_plan_pydict(pf.build())
        lo = df.groupby("k").v.quantile(q - 0.03)
        hi = df.groupby("k").v.quantile(q + 0.03)
        for p, l, h in zip(got["p"], lo, hi):
            assert l - 1e-9 <= p <= h + 1e-9, (q, p, l, h)


def test_nulls_and_masks():
    data = {"k": [0, 0, 0, 1, 1, 2],
            "v": [1.0, None, 3.0, 5.0, None, None]}
    b = Batch.from_pydict(data, TYPES)
    _, pf = _plans([b], 0.5)
    got = run_plan_pydict(pf.build())
    assert got["k"] == [0, 1, 2]
    assert got["p"][0] == pytest.approx(1.0)  # floor(0.5*(2-1)) = idx 0
    assert got["p"][1] == pytest.approx(5.0)
    assert got["p"][2] is None  # all-null group


def test_digest_spill_roundtrip():
    from velox_tpu.utils.config import config

    rng = np.random.default_rng(4)
    n = 3000
    data = {"k": rng.integers(0, 5, n).tolist(),
            "v": rng.normal(size=n).round(4).tolist()}
    b = Batch.from_pydict(data, TYPES)
    _, pf = _plans([b], 0.5)
    base = run_plan_pydict(pf.build())
    old = config.spill_memory_budget_bytes
    config.spill_memory_budget_bytes = 1 << 11
    try:
        spilled = run_plan_pydict(pf.build())
    finally:
        config.spill_memory_budget_bytes = old
    assert spilled["k"] == base["k"]
    for x, y in zip(base["p"], spilled["p"]):
        assert x == pytest.approx(y, abs=1e-9)
