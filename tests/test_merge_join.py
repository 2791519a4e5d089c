"""MergeJoin over key-sorted inputs: no build sort, binary-search probe.

Oracle = hash_join on identical data. Parity: velox/exec/MergeJoin.h:47
/ tests/MergeJoinTest.cpp.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _sorted_batch(data, types, key):
    order = sorted(range(len(data[key])),
                   key=lambda i: (data[key][i] is None, data[key][i]))
    return Batch.from_pydict(
        {n: [v[i] for i in order] for n, v in data.items()}, types)


def _pair(join, seed=0, n=60, nulls=False, filter=None, output=None):
    rng = np.random.default_rng(seed)
    left = {"lk": [None if nulls and rng.random() < 0.1 else int(x)
                   for x in rng.integers(0, 15, n)],
            "lv": [float(x) for x in rng.normal(size=n)]}
    right = {"rk": [None if nulls and rng.random() < 0.1 else int(x)
                    for x in rng.integers(0, 15, n // 2)],
             "rv": [float(x) for x in rng.normal(size=n // 2)]}
    lt = {"lk": BIGINT, "lv": DOUBLE}
    rt = {"rk": BIGINT, "rv": DOUBLE}
    lb = _sorted_batch(left, lt, "lk")
    rb = _sorted_batch(right, rt, "rk")

    def plan(merge):
        r = PlanBuilder().values([rb])
        pb = PlanBuilder().values([lb])
        m = pb.hash_join(r, ["lk"], ["rk"], join_type=join, merge=merge,
                         filter=filter, output=output)
        return m.build()

    return (run_plan_pydict(plan(True)), run_plan_pydict(plan(False)))


def _norm(d):
    df = pd.DataFrame(d)
    return df.sort_values(list(df.columns), na_position="last") \
        .reset_index(drop=True)


@pytest.mark.parametrize("join", [
    "inner", "left", "right", "full", "left_semi", "right_semi",
    "anti", "anti_simple",
])
def test_matches_hash_join(join):
    m, h = _pair(join, seed=1)
    pd.testing.assert_frame_equal(_norm(m), _norm(h))


@pytest.mark.parametrize("join", ["inner", "left", "anti"])
def test_null_keys(join):
    m, h = _pair(join, seed=2, nulls=True)
    pd.testing.assert_frame_equal(_norm(m), _norm(h))


def test_join_filter():
    m, h = _pair("inner", seed=3, filter="lv < rv")
    pd.testing.assert_frame_equal(_norm(m), _norm(h))


def test_vs_pandas_oracle():
    m, _ = _pair("inner", seed=4, output=["lk", "lv", "rv"])
    rng = np.random.default_rng(4)
    n = 60
    left = pd.DataFrame({
        "lk": [int(x) for x in rng.integers(0, 15, n)],
        "lv": [float(x) for x in rng.normal(size=n)]})
    right = pd.DataFrame({
        "rk": [int(x) for x in rng.integers(0, 15, n // 2)],
        "rv": [float(x) for x in rng.normal(size=n // 2)]})
    orc = left.merge(right, left_on="lk", right_on="rk")[
        ["lk", "lv", "rv"]]
    pd.testing.assert_frame_equal(_norm(m), _norm(orc.to_dict("list")))


def test_multi_key():
    lb = Batch.from_pydict(
        {"a": [1, 1, 1, 2, 2], "b": [1, 2, 2, 1, 3],
         "lv": [1.0, 2.0, 3.0, 4.0, 5.0]},
        {"a": BIGINT, "b": BIGINT, "lv": DOUBLE})
    rb = Batch.from_pydict(
        {"c": [1, 1, 2], "d": [2, 3, 3], "rv": [10.0, 20.0, 30.0]},
        {"c": BIGINT, "d": BIGINT, "rv": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([lb])
        .merge_join(PlanBuilder().values([rb]), ["a", "b"], ["c", "d"],
                    output=["a", "b", "lv", "rv"])
        .build())
    d = _norm(out)
    assert d["a"].tolist() == [1, 1, 2]
    assert d["b"].tolist() == [2, 2, 3]
    assert sorted(d["lv"].tolist()) == [2.0, 3.0, 5.0]
    assert d["rv"].tolist() == [10.0, 10.0, 30.0]
