"""Fused HAVING in streaming aggregation (StreamingAggregationNode
.having, folded by the optimizer from filter-over-aggregation): groups
failing the predicate never materialize. Verified against the unfused
plan (optimizer off) on single- and multi-batch clustered inputs,
including carry merges across batch boundaries and the final open-group
flush."""

import numpy as np
import pyarrow as pa
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.plan import PlanBuilder
from velox_tpu.plan.nodes import StreamingAggregationNode
from velox_tpu.plan.optimizer import optimize_plan
from velox_tpu.utils.config import config


def _register(name, keys, vals, batch_rows):
    register_arrow(name, pa.table({"k": keys, "v": vals}), batch_rows)


def _plan():
    return (PlanBuilder().table_scan("hv_t")
            .aggregate(["k"], ["sum(v) AS total", "count(v) AS cnt"])
            .filter("total > 10").build())


def test_optimizer_folds_having():
    _register("hv_t", [1, 1, 2, 3, 3, 3], [5, 6, 2, 4, 4, 4], 128)
    try:
        opt = optimize_plan(_plan())
        assert isinstance(opt, StreamingAggregationNode)
        assert opt.having is not None
    finally:
        drop_table("hv_t")


@pytest.mark.parametrize("batch_rows", [1 << 20, 4])
def test_having_matches_unfused(batch_rows):
    rng = np.random.default_rng(7)
    # clustered keys with runs crossing batch boundaries
    keys = np.repeat(np.arange(50), rng.integers(1, 6, size=50))
    vals = rng.integers(0, 8, size=len(keys))
    _register("hv_t", keys.tolist(), vals.tolist(), batch_rows)
    try:
        out = run_plan_pydict(_plan())
        old = config.optimize_plans
        config.optimize_plans = False
        try:
            ref = run_plan_pydict(_plan())
        finally:
            config.optimize_plans = old
        got = sorted(zip(out["k"], out["total"], out["cnt"]))
        want = sorted(zip(ref["k"], ref["total"], ref["cnt"]))
        assert got == want
        # non-vacuity: the predicate actually cut groups
        assert 0 < len(got) < 50
    finally:
        drop_table("hv_t")


def test_having_last_group_flush():
    # the final open group passes / fails the predicate
    _register("hv_t", [1, 1, 2, 2], [6, 6, 1, 1], 128)
    try:
        out = run_plan_pydict(_plan())
        assert out["k"] == [1]
        assert out["total"] == [12]
    finally:
        drop_table("hv_t")


def test_having_carry_alone_across_batches():
    # group 1 closes exactly at a batch boundary (carry never merges)
    _register("hv_t", [1, 1, 2, 2], [6, 6, 9, 9], 2)
    try:
        out = run_plan_pydict(_plan())
        assert sorted(zip(out["k"], out["total"])) == [(1, 12), (2, 18)]
    finally:
        drop_table("hv_t")


def test_having_fallback_on_minmax_predicate():
    # predicate over a min/max (acc-lane) aggregate -> post-emit mask
    _register("hv_t", [1, 1, 2, 2, 3], [5, 6, 2, 4, 9], 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("hv_t")
            .aggregate(["k"], ["max(v) AS mx"])
            .filter("mx >= 6").build())
        assert sorted(zip(out["k"], out["mx"])) == [(1, 6), (3, 9)]
    finally:
        drop_table("hv_t")


def test_having_with_null_keys():
    register_arrow("hv_t", pa.table({
        "k": pa.array([1, 1, None, None, 2], type=pa.int64()),
        "v": [6, 6, 8, 8, 1],
    }), 128)
    try:
        out = run_plan_pydict(_plan())
        rows = sorted(zip(out["k"], out["total"]),
                      key=lambda t: (t[0] is None, t[0]))
        assert rows == [(1, 12), (None, 16)]
    finally:
        drop_table("hv_t")
