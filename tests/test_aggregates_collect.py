"""Collect aggregates (array_agg/map_agg/map_union/approx_percentile)
vs pandas/python oracles (velox/functions/prestosql/aggregates/tests/
ArrayAggTest.cpp, MapAggTest.cpp, MapUnionTest.cpp analogs)."""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.types.types import map_
from velox_tpu.vector.batch import Batch


def test_array_agg_groups_and_nulls():
    g = [0, 0, 1, 1, 1, 2]
    v = [1, None, 3, 4, None, 6]
    b = Batch.from_pydict({"g": g, "v": v}, {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["array_agg(v) as av"]).order_by(["g"]).build())
    assert out["av"] == [[1, None], [3, 4, None], [6]]


def test_array_agg_multi_batch_and_strings():
    rng = np.random.default_rng(4)
    g = [int(x) for x in rng.integers(0, 3, 40)]
    v = [int(x) for x in rng.integers(0, 100, 40)]
    b1 = Batch.from_pydict({"g": g[:20], "v": v[:20]},
                           {"g": BIGINT, "v": BIGINT})
    b2 = Batch.from_pydict({"g": g[20:], "v": v[20:]},
                           {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b1, b2])
        .aggregate(["g"], ["array_agg(v) as av", "count(*) as n"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        assert sorted(out["av"][i]) == sorted(sub["v"])
        assert out["n"][i] == len(sub)
    # strings: one batch (dictionaries are table-global by engine
    # invariant — cross-batch dictionary identity is the ingest contract)
    words = ["alpha", "beta", "gamma", "delta"]
    sv = [words[int(x)] for x in rng.integers(0, 4, 40)]
    bs = Batch.from_pydict({"g": g, "v": sv},
                           {"g": BIGINT, "v": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([bs])
        .aggregate(["g"], ["array_agg(v) as av"]).order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": sv})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        assert sorted(out["av"][i]) == sorted(sub["v"])


def test_array_agg_empty_group_is_null():
    b = Batch.from_pydict(
        {"g": [0, 1], "v": [1, 2], "keep": [True, False]},
        {"g": BIGINT, "v": BIGINT,
         "keep": __import__("velox_tpu.types", fromlist=["BOOLEAN"]
                            ).BOOLEAN})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["array_agg(v) as av"], masks={"av": "keep"})
        .order_by(["g"]).build())
    assert out["av"] == [[1], None]


def test_map_agg_dedupes_keys():
    g = [0, 0, 0, 1]
    k = ["a", "b", "a", "z"]
    v = [1, 2, 3, 9]
    b = Batch.from_pydict({"g": g, "k": k, "v": v},
                          {"g": BIGINT, "k": VARCHAR, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["map_agg(k, v) as m"]).order_by(["g"]).build())
    # duplicate key "a": first occurrence wins (deterministic arbitrary)
    assert dict(out["m"][0]) == {"a": 1, "b": 2}
    assert dict(out["m"][1]) == {"z": 9}


def test_map_union():
    g = [0, 0, 1, 1]
    m = [{"a": 1, "b": 2}, {"b": 5, "c": 3}, {"x": 7}, None]
    b = Batch.from_pydict(
        {"g": g, "m": m}, {"g": BIGINT, "m": map_(VARCHAR, BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["map_union(m) as u"]).order_by(["g"]).build())
    u0 = dict(out["u"][0])
    assert u0["a"] == 1 and u0["c"] == 3
    assert u0["b"] in (2, 5)  # arbitrary input map wins
    assert dict(out["u"][1]) == {"x": 7}


def test_approx_percentile_exact():
    rng = np.random.default_rng(8)
    g = [int(x) for x in rng.integers(0, 4, 400)]
    v = [float(x) for x in rng.normal(size=400)]
    b = Batch.from_pydict({"g": g, "v": v}, {"g": BIGINT, "v": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["approx_percentile(v, 0.25) as q1",
                           "approx_percentile(v, 0.9) as q9"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        x = np.sort(sub["v"].to_numpy())
        assert out["q1"][i] == pytest.approx(
            x[int(np.floor(0.25 * (len(x) - 1)))])
        assert out["q9"][i] == pytest.approx(
            x[int(np.floor(0.9 * (len(x) - 1)))])


def test_array_agg_global():
    b = Batch.from_pydict({"v": [3, 1, 2]}, {"v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate([], ["array_agg(v) as av", "sum(v) as s"]).build())
    assert out["av"] == [[3, 1, 2]]
    assert out["s"] == [6]


def test_collect_partial_step_supported():
    # r3: array_agg gained partial/final page companions
    # (tests/test_collect_partial.py has the full coverage); kinds
    # without a page form still reject loudly
    b = Batch.from_pydict({"g": [0, 0], "v": [1, 2]},
                          {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .partial_aggregation(["g"], ["array_agg(v) as av"])
        .final_aggregation().build())
    assert out["av"] == [[1, 2]]
    with pytest.raises(Exception):
        run_plan_pydict(
            PlanBuilder().values([b])
            .partial_aggregation(["g"], ["histogram(v) as h"])
            .final_aggregation().build())


def test_set_agg_and_set_union():
    from velox_tpu.types.types import array as array_t

    g = [0, 0, 0, 1, 1]
    v = [3, 1, 3, 7, 7]
    arrs = [[1, 2], [2, 3], None, [9], []]
    b = Batch.from_pydict(
        {"g": g, "v": v, "a": arrs},
        {"g": BIGINT, "v": BIGINT, "a": array_t(BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["set_agg(v) as sv", "set_union(a) as su"])
        .order_by(["g"]).build())
    assert sorted(out["sv"][0]) == [1, 3]
    assert sorted(out["sv"][1]) == [7]
    assert sorted(out["su"][0]) == [1, 2, 3]
    assert sorted(out["su"][1]) == [9]


def test_histogram():
    g = [0, 0, 0, 0, 1, 1]
    v = ["a", "b", "a", "a", "z", None]
    b = Batch.from_pydict({"g": g, "v": v}, {"g": BIGINT, "v": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["histogram(v) as h"]).order_by(["g"]).build())
    assert dict(out["h"][0]) == {"a": 3, "b": 1}
    assert dict(out["h"][1]) == {"z": 1}


def test_map_union_sum():
    g = [0, 0, 1]
    m = [{"a": 1, "b": 2}, {"b": 5, "c": 3}, {"x": 7}]
    b = Batch.from_pydict(
        {"g": g, "m": m}, {"g": BIGINT, "m": map_(VARCHAR, BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["map_union_sum(m) as u"])
        .order_by(["g"]).build())
    assert dict(out["u"][0]) == {"a": 1, "b": 7, "c": 3}
    assert dict(out["u"][1]) == {"x": 7}


def test_approx_most_frequent_exact():
    rng = np.random.default_rng(5)
    g = [0] * 100 + [1] * 50
    v = ([7] * 40 + [3] * 30 + [9] * 20 + [1] * 10
         + [5] * 30 + [2] * 15 + [8] * 5)
    b = Batch.from_pydict({"g": g, "v": v}, {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["approx_most_frequent(2, v) as f"])
        .order_by(["g"]).build())
    assert dict(out["f"][0]) == {7: 40, 3: 30}
    assert dict(out["f"][1]) == {5: 30, 2: 15}


def test_reduce_agg():
    g = [0, 0, 0, 1, 1, 2]
    v = [3, 5, 2, 7, 1, 4]
    b = Batch.from_pydict({"g": g, "v": v}, {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], [
            "reduce_agg(v, 0, (a, b) -> a + b) as s",
            "reduce_agg(v, 1, (a, b) -> a * b) as p",
            "reduce_agg(v, 0, (a, b) -> if(a > b, a, b)) as mx"])
        .order_by(["g"]).build())
    assert out["s"] == [10, 8, 4]
    assert out["p"] == [30, 7, 4]
    assert out["mx"] == [5, 7, 4]


def test_approx_winsorized_mean():
    import numpy as np

    rng = np.random.default_rng(8)
    g = [int(v) for v in rng.integers(0, 4, 600)]
    x = [float(np.round(v, 4)) for v in rng.normal(size=600)]
    out = run_plan_pydict(
        PlanBuilder().values([Batch.from_pydict({"g": g, "x": x},
                                   {"g": BIGINT, "x": DOUBLE})])
        .aggregate(["g"], ["approx_winsorized_mean(x, 0.1, 0.9) AS w"])
        .order_by(["g"]).build())
    ga, xa = np.array(g), np.array(x)
    for i, gid in enumerate(sorted(set(g))):
        vals = np.sort(xa[ga == gid])
        n = len(vals)
        lo = vals[int(np.floor(0.1 * (n - 1)))]
        hi = vals[int(np.floor(0.9 * (n - 1)))]
        exp = float(np.clip(vals, lo, hi).mean())
        assert abs(out["w"][i] - exp) < 1e-9, (gid, out["w"][i], exp)


def test_numeric_histogram():
    import numpy as np

    x = [float(v) for v in range(100)]          # uniform 0..99
    out = run_plan_pydict(
        PlanBuilder().values([Batch.from_pydict({"x": x}, {"x": DOUBLE})])
        .aggregate([], ["numeric_histogram(4, x) AS h"]).build())
    h = dict(out["h"][0])        # maps surface as key/value pair lists
    assert sum(h.values()) == 100.0
    assert len(h) == 4                           # 4 equal-width bins
    # bucket centers are the bin means; uniform data -> 12, 37, 62, 87.5
    centers = sorted(h)
    assert abs(centers[0] - 12.0) < 1.0
    assert abs(centers[-1] - 87.0) < 1.0
    assert all(v == 25.0 for v in h.values())


def test_vector_sum():
    import numpy as np

    from velox_tpu.types.types import array as array_t

    b = Batch.from_pydict(
        {"g": [0, 0, 0, 1, 1, 2],
         "a": [[1.0, 2.0, 3.0], [10.0, 20.0], [100.0], [5.0], None,
               [7.0, None]]},
        {"g": BIGINT, "a": array_t(DOUBLE)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["vector_sum(a) AS s"])
        .order_by(["g"]).build())
    # shorter arrays zero-padded; null arrays skipped; null elems = 0
    assert out["s"][0] == [111.0, 22.0, 3.0]
    assert out["s"][1] == [5.0]
    assert out["s"][2] == [7.0, 0.0]


def test_vector_sum_bigint():
    from velox_tpu.types.types import array as array_t

    b = Batch.from_pydict(
        {"a": [[1, 2], [3], [10, 20, 30]]}, {"a": array_t(BIGINT)})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate([], ["vector_sum(a) AS s"]).build())
    assert out["s"][0] == [14, 22, 30]


def test_multimap_agg():
    b = Batch.from_pydict(
        {"g": [0, 0, 0, 0, 1, 1],
         "k": ["a", "b", "a", None, "a", "a"],
         "v": [1, 2, 3, 4, 5, None]},
        {"g": BIGINT, "k": VARCHAR, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["multimap_agg(k, v) AS m"])
        .order_by(["g"]).build())
    # values keep arrival order per key; null keys dropped;
    # null VALUES kept (presto multimap_agg keeps them)
    assert dict(out["m"][0]) == {"a": [1, 3], "b": [2]}
    assert dict(out["m"][1]) == {"a": [5, None]}


def test_multimap_agg_bigint_keys():
    import numpy as np

    rng = np.random.default_rng(6)
    n = 500
    g = [int(v) for v in rng.integers(0, 3, n)]
    k = [int(v) for v in rng.integers(0, 5, n)]
    v = [float(np.round(x, 3)) for x in rng.normal(size=n)]
    out = run_plan_pydict(
        PlanBuilder().values([Batch.from_pydict(
            {"g": g, "k": k, "v": v},
            {"g": BIGINT, "k": BIGINT, "v": DOUBLE})])
        .aggregate(["g"], ["multimap_agg(k, v) AS m"])
        .order_by(["g"]).build())
    for i, gid in enumerate(sorted(set(g))):
        exp = {}
        for gg, kk, vv in zip(g, k, v):
            if gg == gid:
                exp.setdefault(kk, []).append(vv)
        assert dict(out["m"][i]) == exp, (gid, out["m"][i], exp)
