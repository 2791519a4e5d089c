"""StreamingAggregationOp: key-clustered input, groups close on key
change, carry across batches. Oracle = HashAggregationOp on same data.

Parity: velox/exec/StreamingAggregation.h:21 / tests/
StreamingAggregationTest.cpp.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _batches(ks, vs, split):
    out = []
    for lo, hi in zip([0] + split, split + [len(ks)]):
        out.append(Batch.from_pydict(
            {"k": ks[lo:hi], "v": vs[lo:hi]}, {"k": BIGINT, "v": DOUBLE}))
    return out


def _sorted_df(out):
    return pd.DataFrame(out).sort_values("k").reset_index(drop=True)


@pytest.mark.parametrize("split", [[4], [1], [3, 6], [2, 2, 7]])
def test_matches_hash_agg(split):
    rng = np.random.default_rng(2)
    ks = sorted(int(x) for x in rng.integers(0, 5, 9))
    vs = [float(x) for x in rng.normal(size=9)]
    b = _batches(ks, vs, split)
    stream = run_plan_pydict(
        PlanBuilder().values(b)
        .streaming_aggregate(
            ["k"], ["sum(v) as s", "count(v) as c", "min(v) as mn",
                    "max(v) as mx", "avg(v) as a"])
        .build())
    hashed = run_plan_pydict(
        PlanBuilder().values(b)
        .aggregate(["k"], ["sum(v) as s", "count(v) as c", "min(v) as mn",
                           "max(v) as mx", "avg(v) as a"])
        .build())
    sd, hd = _sorted_df(stream), _sorted_df(hashed)
    assert sd["k"].tolist() == hd["k"].tolist()
    for col in ("s", "c", "mn", "mx", "a"):
        assert sd[col].tolist() == pytest.approx(hd[col].tolist())


def test_group_spanning_batches():
    # one group spans all three batches
    b = _batches([7, 7, 7, 7, 7], [1.0, 2.0, 3.0, 4.0, 5.0], [2, 4])
    out = run_plan_pydict(
        PlanBuilder().values(b)
        .streaming_aggregate(["k"], ["sum(v) as s", "count(v) as c"])
        .build())
    assert out == {"k": [7], "s": [15.0], "c": [5]}


def test_single_rows_per_group():
    b = _batches([1, 2, 3, 4], [10.0, 20.0, 30.0, 40.0], [2])
    out = run_plan_pydict(
        PlanBuilder().values(b)
        .streaming_aggregate(["k"], ["sum(v) as s"]).build())
    d = _sorted_df(out)
    assert d["k"].tolist() == [1, 2, 3, 4]
    assert d["s"].tolist() == [10.0, 20.0, 30.0, 40.0]


def test_null_keys_group_together():
    b = [Batch.from_pydict(
        {"k": [None, None, 3], "v": [1.0, 2.0, 3.0]},
        {"k": BIGINT, "v": DOUBLE})]
    out = run_plan_pydict(
        PlanBuilder().values(b)
        .streaming_aggregate(["k"], ["sum(v) as s"]).build())
    d = pd.DataFrame(out)
    assert len(d) == 2
    assert sorted(d["s"].tolist()) == [3.0, 3.0]


def test_count_star_and_mask():
    b = _batches([1, 1, 2, 2, 2], [1.0, -1.0, 2.0, -2.0, 3.0], [3])
    out = run_plan_pydict(
        PlanBuilder().values(b)
        .project(["k", "v", "v > 0 as pos"])
        .streaming_aggregate(["k"], ["count() as c", "sum(v) as s"],
                             masks={"s": "pos"})
        .build())
    d = _sorted_df(out)
    assert d["c"].tolist() == [2, 3]
    assert d["s"].tolist() == [1.0, 5.0]


def test_two_keys():
    ks1 = [1, 1, 1, 2, 2]
    ks2 = [10, 10, 11, 10, 10]
    vs = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [Batch.from_pydict(
        {"a": ks1[:2], "b": ks2[:2], "v": vs[:2]},
        {"a": BIGINT, "b": BIGINT, "v": DOUBLE}),
        Batch.from_pydict(
        {"a": ks1[2:], "b": ks2[2:], "v": vs[2:]},
        {"a": BIGINT, "b": BIGINT, "v": DOUBLE})]
    out = run_plan_pydict(
        PlanBuilder().values(b)
        .streaming_aggregate(["a", "b"], ["sum(v) as s"]).build())
    d = pd.DataFrame(out).sort_values(["a", "b"]).reset_index(drop=True)
    assert d["a"].tolist() == [1, 1, 2]
    assert d["b"].tolist() == [10, 11, 10]
    assert d["s"].tolist() == [3.0, 3.0, 9.0]


def test_after_orderby_large():
    rng = np.random.default_rng(9)
    n = 2000
    ks = [int(x) for x in rng.integers(0, 40, n)]
    vs = [float(x) for x in rng.normal(size=n)]
    b = Batch.from_pydict({"k": ks, "v": vs}, {"k": BIGINT, "v": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b]).order_by(["k"])
        .streaming_aggregate(["k"], ["sum(v) as s", "count(v) as c"])
        .build())
    orc = (pd.DataFrame({"k": ks, "v": vs}).groupby("k")
           .agg(s=("v", "sum"), c=("v", "count")).reset_index())
    d = _sorted_df(out)
    assert d["k"].tolist() == orc["k"].tolist()
    assert d["c"].tolist() == orc["c"].tolist()
    assert d["s"].tolist() == pytest.approx(orc["s"].tolist())
