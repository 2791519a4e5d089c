"""VectorSaver round-trip + query trace/replay tests
(velox/docs/develop/debugging/vector-saver.rst + tool/trace analogs)."""

import tempfile

import numpy as np
import pyarrow as pa

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec.task import Task
from velox_tpu.vector import from_arrow
from velox_tpu.utils.trace import (
    QueryTracer, load_batch, replay_operator, save_batch,
)


def test_save_load_batch_roundtrip():
    import decimal

    b = from_arrow(pa.table({
        "a": [1, None, 3],
        "s": ["x", "y", None],
        "d": pa.array([decimal.Decimal("1.50"), None,
                       decimal.Decimal("-2.25")],
                      type=pa.decimal128(9, 2)),
    }))
    with tempfile.TemporaryDirectory() as td:
        save_batch(b, f"{td}/dump")
        b2 = load_batch(f"{td}/dump")
        assert b2.to_pydict() == b.to_pydict()
        assert b2.columns["s"].dictionary is not None


def test_query_trace_and_replay():
    rng = np.random.default_rng(5)
    b = from_arrow(pa.table({
        "k": rng.integers(0, 5, 200), "v": rng.normal(size=200)}))
    plan = (PlanBuilder().values([b]).filter("v > 0.0")
            .aggregate(["k"], ["sum(v) AS s", "count(*) AS c"]).build())
    agg_node = plan
    with tempfile.TemporaryDirectory() as td:
        tracer = QueryTracer(td, [agg_node.id])
        t = Task(plan, tracer=tracer)
        original = [bb.to_pydict() for bb in t.run()]
        assert tracer.recorded_inputs(agg_node.id)
        replayed = [bb.to_pydict() for bb in
                    replay_operator(td, agg_node)]
        # same groups and aggregates
        def norm(outs):
            rows = []
            for o in outs:
                rows.extend(zip(o["k"], o["s"], o["c"]))
            return sorted(rows)
        assert norm(replayed) == norm(original)
