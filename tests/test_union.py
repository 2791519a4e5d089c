"""UnionAll + LocalMerge operators.

Parity: velox MixedUnion / LocalMergeNode (core/PlanNode.h:1459,
exec/Merge.h:33).
"""

import numpy as np
import pandas as pd

from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _vb(ks, vs):
    return PlanBuilder().values([Batch.from_pydict(
        {"k": ks, "v": vs}, {"k": BIGINT, "v": DOUBLE})])


def test_union_all():
    plan = (_vb([1, 2], [1.0, 2.0])
            .union_all([_vb([3], [3.0]), _vb([4, 5], [4.0, 5.0])])
            .aggregate([], ["sum(v) as s", "count(k) as c"])
            .build())
    out = run_plan_pydict(plan)
    assert out == {"s": [15.0], "c": [5]}


def test_union_duplicates_kept():
    plan = (_vb([1, 1], [1.0, 1.0])
            .union_all([_vb([1], [1.0])])
            .aggregate(["k"], ["count(*) as c"])
            .build())
    out = run_plan_pydict(plan)
    assert out == {"k": [1], "c": [3]}


def test_union_then_transforms():
    plan = (_vb([1, 2], [1.0, -2.0])
            .union_all([_vb([3, 4], [3.0, -4.0])])
            .filter("v > 0.0")
            .project(["k", "v * 10.0 as w"])
            .order_by(["k"])
            .build())
    out = run_plan_pydict(plan)
    assert out["k"] == [1, 3]
    assert out["w"] == [10.0, 30.0]


def test_local_merge_ordered():
    rng = np.random.default_rng(4)
    data = []
    allk = []
    for i in range(3):
        ks = sorted(int(x) for x in rng.integers(0, 100, 20))
        vs = [float(x) for x in rng.normal(size=20)]
        allk.extend(zip(ks, vs))
        data.append((ks, vs))

    def streams():
        return [_vb(ks, vs) for ks, vs in data]

    s = streams()
    plan = s[0].local_merge(s[1:], ["k"]).build()
    out = run_plan_pydict(plan)
    exp = sorted(k for k, _ in allk)
    assert out["k"] == exp
    # merged output feeds streaming aggregation (the point of the merge)
    s = streams()
    plan2 = (s[0].local_merge(s[1:], ["k"])
             .streaming_aggregate(["k"], ["sum(v) as s"])
             .build())
    out2 = run_plan_pydict(plan2)
    orc = (pd.DataFrame(allk, columns=["k", "v"]).groupby("k")
           .agg(s=("v", "sum")).reset_index())
    d = pd.DataFrame(out2).sort_values("k").reset_index(drop=True)
    assert d["k"].tolist() == orc["k"].tolist()
    np.testing.assert_allclose(d["s"], orc["s"], rtol=1e-9)
