"""Multi-fragment exchange tests (velox MultiFragmentTest.cpp:52 analog):
full shuffle protocol across plan fragments in one process."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan
from velox_tpu.exec.fragments import (
    Fragment, partitioned_output, run_fragments,
)
from velox_tpu.io import register_arrow, drop_table


def test_two_fragment_distributed_aggregation():
    rng = np.random.default_rng(9)
    n = 5000
    k = rng.integers(0, 37, n)
    v = rng.normal(size=n)
    register_arrow("frag_t", pa.table({"k": k, "v": v}), batch_rows=512)
    try:
        # fragment A: scan -> partial agg -> shuffle by key
        a = (PlanBuilder().table_scan("frag_t")
             .partial_aggregation(["k"], ["sum(v) AS s", "count(*) AS c"]))
        a = partitioned_output(a, ["k"], num_partitions=4)
        a_plan = a.build()

        # fragment B (4 tasks): exchange -> final agg
        b = (PlanBuilder()
             .exchange(a_plan.source.output_type)
             .final_aggregation(
                 ["k"], ["sum(s) AS s", "count(c) AS c"]))
        b_plan = b.build()
        exchange_node = b_plan.source

        out = run_fragments([
            Fragment("A", a_plan, num_tasks=1),
            Fragment("B", b_plan, num_tasks=4,
                     exchange_sources={exchange_node.id: "A"}),
        ])
        got = out.to_pandas().sort_values("k").reset_index(drop=True)
        df = pd.DataFrame({"k": k, "v": v})
        e = df.groupby("k").agg(s=("v", "sum"), c=("v", "count")).reset_index()
        assert got["k"].tolist() == e["k"].tolist()
        np.testing.assert_allclose(got["s"], e["s"], rtol=1e-12)
        assert got["c"].tolist() == e["c"].tolist()
    finally:
        drop_table("frag_t")


def test_broadcast_output():
    rng = np.random.default_rng(10)
    register_arrow("frag_b", pa.table({
        "x": rng.integers(0, 10, 100)}), batch_rows=64)
    try:
        a = PlanBuilder().table_scan("frag_b")
        a = partitioned_output(a, [], num_partitions=3, broadcast=True)
        a_plan = a.build()
        b = (PlanBuilder().exchange(a_plan.source.output_type)
             .aggregate([], ["count(*) AS c"]))
        b_plan = b.build()
        out = run_fragments([
            Fragment("A", a_plan),
            Fragment("B", b_plan, num_tasks=3,
                     exchange_sources={b_plan.source.id: "A"}),
        ])
        # every consumer saw all 100 rows
        assert out.column("c").to_pylist() == [100, 100, 100]
    finally:
        drop_table("frag_b")


def test_round_robin_and_hive_bucket_partitioning():
    """PartitionFunction family (velox RoundRobinPartitionFunction +
    HivePartitionFunction)."""
    import numpy as np

    from velox_tpu.exec.fragments import (
        OutputBufferManager, PartitionedOutputNode, PartitionedOutputOp)
    from velox_tpu.plan.nodes import new_id
    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    rng = np.random.default_rng(2)
    vals = [int(x) for x in rng.integers(0, 1000, 400)]
    b = Batch.from_pydict({"k": vals}, {"k": BIGINT})

    for kind in ("round_robin", "hive_bucket"):
        node = PartitionedOutputNode(
            new_id(), b.schema, None, ("k",), 4, False, kind)
        mgr = OutputBufferManager()
        op = PartitionedOutputOp(node, mgr, "f")
        op.add_input(b)
        parts = []
        rows_by_part = []
        for p in range(4):
            got = mgr.drain("f", p)
            n = sum(x.selected_count() for x in got)
            parts.append(n)
            rows_by_part.append([
                v for x in got for v in x.to_pydict()["k"]])
        assert sum(parts) == 400, (kind, parts)
        if kind == "round_robin":
            assert max(parts) - min(parts) <= 1, parts
        else:
            for p in range(4):
                assert all((v & 0x7FFFFFFF) % 4 == p
                           for v in rows_by_part[p]), (kind, p)
