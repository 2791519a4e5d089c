"""Plan JSON serde: round-trip plans (incl. ValuesNode pages, typed
exprs, joins, window/agg specs) and re-execute the deserialized plan.

Parity: velox PlanNode::serialize/create (velox/core/PlanNode.h).
"""

import pandas as pd

from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.plan import PlanBuilder
from velox_tpu.plan.serde import plan_from_json, plan_to_json
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _b():
    return Batch.from_pydict(
        {"k": [1, 2, 2, 3, None], "v": [1.5, 2.0, -1.0, 4.0, 0.5],
         "s": ["a", "b", "a", None, "c"]},
        {"k": BIGINT, "v": DOUBLE, "s": VARCHAR})


def _roundtrip_and_compare(plan):
    s = plan_to_json(plan)
    plan2 = plan_from_json(s)
    a = run_plan_pydict(plan)
    b = run_plan_pydict(plan2)
    pd.testing.assert_frame_equal(pd.DataFrame(a), pd.DataFrame(b))
    # stable serialization
    assert plan_to_json(plan2) == s
    return a


def test_filter_project_agg():
    plan = (PlanBuilder().values([_b()])
            .filter("v > 0.0 AND s IS NOT NULL")
            .project(["k", "v * 2.0 as v2"])
            .aggregate(["k"], ["sum(v2) as s2", "count(*) as c"])
            .order_by(["k"])
            .build())
    out = _roundtrip_and_compare(plan)
    assert out["c"] == [1, 1, 1]


def test_join_and_window():
    right = PlanBuilder().values([Batch.from_pydict(
        {"rk": [1, 2], "rv": [10.0, 20.0]},
        {"rk": BIGINT, "rv": DOUBLE})])
    plan = (PlanBuilder().values([_b()])
            .hash_join(right, ["k"], ["rk"], "left",
                       output=["k", "v", "rv"])
            .window(["k"], ["v"], ["row_number() as rn"])
            .top_n(["v DESC"], 3)
            .build())
    _roundtrip_and_compare(plan)


def test_table_scan_subfilter(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from velox_tpu.io.catalog import drop_table, register_parquet

    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": list(range(100))}), path)
    register_parquet("serde_t", path, lazy=True)
    try:
        plan = (PlanBuilder().table_scan("serde_t", subfilter="x >= 90")
                .aggregate([], ["count(x) as c"]).build())
        out = _roundtrip_and_compare(plan)
        assert out["c"] == [10]
    finally:
        drop_table("serde_t")


def test_all_tpch_plans_roundtrip(tmp_path):
    from velox_tpu.io.tpch import register_tpch
    from velox_tpu.tpch import tpch_plan
    from velox_tpu.tpch.queries import SUPPORTED_QUERIES

    register_tpch(0.001, batch_rows=1 << 12)
    for n in SUPPORTED_QUERIES:
        plan = tpch_plan(n, 0.001).build()
        s = plan_to_json(plan)
        plan2 = plan_from_json(s)
        assert plan_to_json(plan2) == s, f"Q{n} serde not stable"
    for n in (3, 18):
        plan = tpch_plan(n, 0.001, clustered=True).build()
        assert plan_to_json(plan_from_json(plan_to_json(plan))) \
            == plan_to_json(plan), f"Q{n}c serde not stable"
