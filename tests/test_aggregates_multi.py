"""Multi-argument / bitwise / sketch aggregates vs pandas oracles.

Covers the functions/aggregates_multi.py tranche: min_by/max_by
(velox/functions/prestosql/aggregates/MinMaxByAggregates.cpp),
covariance/correlation/regression (CovarianceAggregates.cpp), bitwise
aggregates (BitwiseAggregates.cpp), approx_distinct
(HyperLogLogAggregate.h), product, entropy (EntropyAggregates.cpp).
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch


def _batch(d, types):
    return Batch.from_pydict(d, types)


def _rand_groups(rng, n, ng=4):
    return [int(x) for x in rng.integers(0, ng, n)]


def test_min_by_max_by_basic():
    rng = np.random.default_rng(7)
    n = 120
    g = _rand_groups(rng, n)
    v = [int(x) for x in rng.integers(-50, 50, n)]
    c = [float(x) for x in rng.normal(size=n)]
    b = _batch({"g": g, "v": v, "c": c},
               {"g": BIGINT, "v": BIGINT, "c": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["min_by(v, c) as lo", "max_by(v, c) as hi"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v, "c": c})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        assert out["g"][i] == gid
        assert out["lo"][i] == int(sub.loc[sub["c"].idxmin(), "v"])
        assert out["hi"][i] == int(sub.loc[sub["c"].idxmax(), "v"])


def test_min_by_null_comparisons_ignored():
    g = [0, 0, 0, 1, 1]
    v = [10, 20, 30, 40, 50]
    c = [5.0, None, 1.0, None, None]
    b = _batch({"g": g, "v": v, "c": c},
               {"g": BIGINT, "v": BIGINT, "c": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["min_by(v, c) as lo"])
        .order_by(["g"]).build())
    assert out["lo"] == [30, None]


def test_min_by_null_payload_survives():
    # the elected row's payload may itself be null
    g = [0, 0]
    v = [None, 9]
    c = [1.0, 2.0]
    b = _batch({"g": g, "v": v, "c": c},
               {"g": BIGINT, "v": BIGINT, "c": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["min_by(v, c) as lo", "max_by(v, c) as hi"])
        .build())
    assert out["lo"] == [None]
    assert out["hi"] == [9]


def test_min_by_partial_final():
    rng = np.random.default_rng(11)
    n = 200
    g = _rand_groups(rng, n, 5)
    v = [float(x) for x in rng.normal(size=n)]
    c = [int(x) for x in rng.integers(0, 1000, n)]
    batches = [
        _batch({"g": g[:100], "v": v[:100], "c": c[:100]},
               {"g": BIGINT, "v": DOUBLE, "c": BIGINT}),
        _batch({"g": g[100:], "v": v[100:], "c": c[100:]},
               {"g": BIGINT, "v": DOUBLE, "c": BIGINT}),
    ]
    out = run_plan_pydict(
        PlanBuilder().values(batches)
        .partial_aggregation(["g"], ["max_by(v, c) as hi"])
        .final_aggregation().order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v, "c": c})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        assert out["hi"][i] == pytest.approx(
            float(sub.loc[sub["c"].idxmax(), "v"]))


def test_covar_corr_regr():
    rng = np.random.default_rng(3)
    n = 300
    g = _rand_groups(rng, n, 3)
    x = rng.normal(size=n)
    y = 2.0 * x + rng.normal(size=n)
    b = _batch({"g": g, "x": [float(v) for v in x],
                "y": [float(v) for v in y]},
               {"g": BIGINT, "x": DOUBLE, "y": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], [
            "covar_samp(y, x) as cs", "covar_pop(y, x) as cp",
            "corr(y, x) as r", "regr_slope(y, x) as m",
            "regr_intercept(y, x) as b0"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        cov_s = float(np.cov(sub["x"], sub["y"], ddof=1)[0, 1])
        cov_p = float(np.cov(sub["x"], sub["y"], ddof=0)[0, 1])
        r = float(np.corrcoef(sub["x"], sub["y"])[0, 1])
        m, b0 = np.polyfit(sub["x"], sub["y"], 1)
        assert out["cs"][i] == pytest.approx(cov_s, rel=1e-9)
        assert out["cp"][i] == pytest.approx(cov_p, rel=1e-9)
        assert out["r"][i] == pytest.approx(r, rel=1e-9)
        assert out["m"][i] == pytest.approx(float(m), rel=1e-9)
        assert out["b0"][i] == pytest.approx(float(b0), rel=1e-9)


def test_covar_nulls_pairwise():
    # a pair contributes only when BOTH args are non-null
    g = [0] * 5
    x = [1.0, 2.0, None, 4.0, 5.0]
    y = [2.0, None, 6.0, 8.0, 10.0]
    b = _batch({"g": g, "x": x, "y": y},
               {"g": BIGINT, "x": DOUBLE, "y": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["covar_samp(y, x) as cs"]).build())
    xs = np.array([1.0, 4.0, 5.0])
    ys = np.array([2.0, 8.0, 10.0])
    assert out["cs"][0] == pytest.approx(
        float(np.cov(xs, ys, ddof=1)[0, 1]), rel=1e-9)


def test_covar_partial_final():
    rng = np.random.default_rng(5)
    n = 160
    g = _rand_groups(rng, n, 3)
    x = [float(v) for v in rng.normal(size=n)]
    y = [float(v) for v in rng.normal(size=n)]
    bs = [
        _batch({"g": g[:80], "x": x[:80], "y": y[:80]},
               {"g": BIGINT, "x": DOUBLE, "y": DOUBLE}),
        _batch({"g": g[80:], "x": x[80:], "y": y[80:]},
               {"g": BIGINT, "x": DOUBLE, "y": DOUBLE}),
    ]
    out = run_plan_pydict(
        PlanBuilder().values(bs)
        .partial_aggregation(["g"], ["corr(y, x) as r"])
        .final_aggregation().order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        assert out["r"][i] == pytest.approx(
            float(np.corrcoef(sub["x"], sub["y"])[0, 1]), rel=1e-9)


def test_bitwise_aggregates():
    rng = np.random.default_rng(9)
    n = 90
    g = _rand_groups(rng, n, 4)
    v = [int(x) for x in rng.integers(-2**40, 2**40, n)]
    b = _batch({"g": g, "v": v}, {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["bitwise_and_agg(v) as a",
                           "bitwise_or_agg(v) as o",
                           "bitwise_xor_agg(v) as x"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        a = o = -1 & 0, 0
        av, ov, xv = -1, 0, 0
        for val in sub["v"]:
            av &= int(val)
            ov |= int(val)
            xv ^= int(val)
        # wrap to signed 64-bit
        def s64(z):
            z &= (1 << 64) - 1
            return z - (1 << 64) if z >= (1 << 63) else z
        assert out["a"][i] == s64(av)
        assert out["o"][i] == s64(ov)
        assert out["x"][i] == s64(xv)


def test_approx_distinct():
    rng = np.random.default_rng(21)
    n = 5000
    g = [int(x) for x in rng.integers(0, 3, n)]
    # group 0: low cardinality; 1: medium; 2: high
    v = []
    for gi in g:
        if gi == 0:
            v.append(int(rng.integers(0, 20)))
        elif gi == 1:
            v.append(int(rng.integers(0, 500)))
        else:
            v.append(int(rng.integers(0, 100000)))
    b = _batch({"g": g, "v": v}, {"g": BIGINT, "v": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["approx_distinct(v) as d"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v})
    for i, (gid, sub) in enumerate(df.groupby("g")):
        true = sub["v"].nunique()
        got = out["d"][i]
        # HLL with m=1024: ~3.25% standard error; allow 5 sigma
        assert abs(got - true) <= max(3, 0.17 * true), (gid, got, true)


def test_product_and_entropy():
    g = [0, 0, 0, 1, 1]
    v = [2.0, 3.0, 4.0, 0.5, 8.0]
    c = [1, 1, 2, 3, 1]
    b = _batch({"g": g, "v": v, "c": c},
               {"g": BIGINT, "v": DOUBLE, "c": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["product(v) as p", "entropy(c) as e"])
        .order_by(["g"]).build())
    assert out["p"] == [pytest.approx(24.0), pytest.approx(4.0)]

    def ent(counts):
        s = sum(counts)
        return sum(-c / s * np.log2(c / s) for c in counts)
    assert out["e"][0] == pytest.approx(ent([1, 1, 2]), rel=1e-5)
    assert out["e"][1] == pytest.approx(ent([3, 1]), rel=1e-5)


def test_min_by_with_mask():
    g = [0, 0, 0, 0]
    v = [1, 2, 3, 4]
    c = [4.0, 3.0, 2.0, 1.0]
    keep = [True, True, False, False]
    b = _batch({"g": g, "v": v, "c": c, "keep": keep},
               {"g": BIGINT, "v": BIGINT, "c": DOUBLE,
                "keep": __import__("velox_tpu.types", fromlist=["BOOLEAN"]
                                   ).BOOLEAN})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["min_by(v, c) as lo"], masks={"lo": "keep"})
        .build())
    assert out["lo"] == [2]


def test_multi_arg_distinct_rejected():
    b = _batch({"g": [0], "v": [1], "c": [1.0]},
               {"g": BIGINT, "v": BIGINT, "c": DOUBLE})
    with pytest.raises(Exception):
        run_plan_pydict(
            PlanBuilder().values([b])
            .aggregate(["g"], ["min_by(distinct v, c) as lo"]).build())


def test_data_size_for_stats():
    """MaxSizeForStatsAggregate.cpp / SumDataSizeForStatsAggregate.cpp:
    varchar = 4-byte length prefix + utf-8 bytes; fixed-width = width."""
    from velox_tpu.types import VARCHAR

    b = _batch(
        {"g": [0, 0, 1, 1], "s": ["abc", "de", None, "é"],
         "x": [1.0, 2.0, 3.0, 4.0], "i": [1, 2, 3, 4]},
        {"g": BIGINT, "s": VARCHAR, "x": DOUBLE, "i": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b]).aggregate(
            ["g"], ["max_data_size_for_stats(s) AS ms",
                    "sum_data_size_for_stats(s) AS ss",
                    "sum_data_size_for_stats(x) AS sx",
                    "max_data_size_for_stats(i) AS mi"])
        .order_by(["g"]).build())
    assert out["ms"] == [7, 6]      # "abc"+4, "é"(2 bytes)+4
    assert out["ss"] == [13, 6]
    assert out["sx"] == [16, 16]
    assert out["mi"] == [8, 8]


def test_octet_length_scalar():
    from velox_tpu.types import VARCHAR

    b = _batch({"s": ["a", "é", "héllo", None]}, {"s": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .project(["octet_length(s) AS n", "length(s) AS c"]).build())
    assert out["n"] == [1, 2, 6, None]
    assert out["c"] == [1, 1, 5, None]
