"""Adaptive partial aggregation: a non-reducing partial abandons the
per-batch sort and forwards singleton-group partials; the final step
still produces correct totals.

Parity: velox/exec/HashAggregation.cpp abandonPartialAggregationEarly +
QueryConfig abandon_partial_aggregation_min_{rows,pct}.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.plan import PlanBuilder
from velox_tpu.plan.nodes import AggStep
from velox_tpu.exec import run_plan_pydict
from velox_tpu.exec.task import Task
from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch


@pytest.fixture
def small_threshold():
    old = (config.abandon_partial_agg_min_rows,
           config.abandon_partial_agg_min_pct)
    config.abandon_partial_agg_min_rows = 256
    config.abandon_partial_agg_min_pct = 0.8
    yield
    (config.abandon_partial_agg_min_rows,
     config.abandon_partial_agg_min_pct) = old


def _run_partial_final(ks, vs, n_batches=4):
    per = len(ks) // n_batches
    batches = [
        Batch.from_pydict(
            {"k": ks[i * per:(i + 1) * per],
             "v": vs[i * per:(i + 1) * per]},
            {"k": BIGINT, "v": DOUBLE})
        for i in range(n_batches)]
    plan = (PlanBuilder().values(batches)
            .aggregate(["k"], ["sum(v) as s", "count(v) as c"],
                       step=AggStep.PARTIAL)
            .final_aggregation()
            .build())
    task = Task(plan)
    outs = list(task.run())
    agg_ops = [op for p in task.planner.pipelines for op in p.operators
               if type(op).__name__ == "HashAggregationOp"
               and op.step == AggStep.PARTIAL]
    out = {}
    for b in outs:
        d = b.to_pydict()
        for k, v in d.items():
            out.setdefault(k, []).extend(v)
    return out, agg_ops[0].abandoned


def test_high_cardinality_abandons(small_threshold):
    n = 2048
    rng = np.random.default_rng(5)
    ks = [int(x) for x in rng.permutation(n)]     # all-distinct keys
    vs = [float(x) for x in rng.normal(size=n)]
    out, abandoned = _run_partial_final(ks, vs)
    assert abandoned
    orc = (pd.DataFrame({"k": ks, "v": vs}).groupby("k")
           .agg(s=("v", "sum"), c=("v", "count")).reset_index())
    d = pd.DataFrame(out).sort_values("k").reset_index(drop=True)
    assert d["k"].tolist() == orc["k"].tolist()
    assert d["c"].tolist() == orc["c"].tolist()
    np.testing.assert_allclose(d["s"], orc["s"], rtol=1e-9)


def test_low_cardinality_keeps_aggregating(small_threshold):
    n = 2048
    rng = np.random.default_rng(6)
    ks = [int(x) for x in rng.integers(0, 8, n)]
    vs = [float(x) for x in rng.normal(size=n)]
    out, abandoned = _run_partial_final(ks, vs)
    assert not abandoned
    orc = (pd.DataFrame({"k": ks, "v": vs}).groupby("k")
           .agg(s=("v", "sum"), c=("v", "count")).reset_index())
    d = pd.DataFrame(out).sort_values("k").reset_index(drop=True)
    assert d["k"].tolist() == orc["k"].tolist()
    assert d["c"].tolist() == orc["c"].tolist()
    np.testing.assert_allclose(d["s"], orc["s"], rtol=1e-9)
