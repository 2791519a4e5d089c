"""Set-membership sketches: approx_set / make_set_digest /
khyperloglog_agg / merge / reservoir_sample and the blob readers
(cardinality, intersection_cardinality, jaccard_index, hash_counts,
uniqueness_distribution, reidentification_potential).

Reference behavior: velox/functions/prestosql/aggregates/
HyperLogLogAggregate.cpp, SetDigestFunctions, KHyperLogLog; blobs here
are this engine's own format (functions/sketch.py — documented
deviation: not Presto wire-compatible)."""

import json

import numpy as np
import pandas as pd
import pytest

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.types import BIGINT, VARCHAR
from velox_tpu.vector.batch import Batch


def _mkbatch(n=4000, seed=1, gmod=4, overlap=True):
    rng = np.random.default_rng(seed)
    g = [int(v) for v in rng.integers(0, gmod, n)]
    x = [int(v) + (200 * (gg % 2) if overlap else 0)
         for v, gg in zip(rng.integers(0, 400, n), g)]
    u = [int(v) for v in rng.integers(0, 8, n)]
    return g, x, u, Batch.from_pydict(
        {"g": g, "x": x, "u": u},
        {"g": BIGINT, "x": BIGINT, "u": BIGINT})


def test_approx_set_cardinality_close_to_exact():
    g, x, _, b = _mkbatch()
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["approx_set(x) as hs"])
        .project(["g", "cardinality(hs) as c"])
        .order_by(["g"]).build())
    exact = pd.DataFrame({"g": g, "x": x}).groupby("g")["x"].nunique()
    for gid, c in zip(out["g"], out["c"]):
        # HLL with 2048 registers: stderr ~2.3%; allow 4 sigma
        assert abs(c - exact[gid]) <= max(4, 0.1 * exact[gid])


def test_set_digest_exact_below_capacity_and_jaccard():
    g, x, _, b = _mkbatch()
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["make_set_digest(x) as sd"])
        .project(["g", "cardinality(sd) as c",
                  "jaccard_index(sd, sd) as jself",
                  "intersection_cardinality(sd, sd) as iself"])
        .order_by(["g"]).build())
    exact = pd.DataFrame({"g": g, "x": x}).groupby("g")["x"].nunique()
    for gid, c, js, isf in zip(out["g"], out["c"], out["jself"],
                               out["iself"]):
        assert c == exact[gid]          # below SD_K capacity -> exact
        assert js == 1.0
        assert isf == c


def test_set_digest_cross_group_jaccard():
    # groups 0/2 share value space [0,400); 1/3 live in [200,600):
    # J(0,1) ~ 200/600, J(0,2) ~ 1
    g, x, _, b = _mkbatch()
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["make_set_digest(x) as sd"])
        .order_by(["g"]).build())
    from velox_tpu.functions import sketch as SK

    sds = out["sd"]
    j_same = SK.jaccard_index(sds[0], sds[2])
    j_diff = SK.jaccard_index(sds[0], sds[1])
    assert j_same > 0.75
    assert 0.15 < j_diff < 0.5
    inter = SK.intersection_cardinality(sds[0], sds[1])
    df = pd.DataFrame({"g": g, "x": x})
    s0 = set(df[df.g == 0]["x"])
    s1 = set(df[df.g == 1]["x"])
    true_inter = len(s0 & s1)
    assert abs(inter - true_inter) <= 0.25 * true_inter + 10


def test_merge_aggregate_over_blobs():
    # partial sketches per (g, h) then merge() to per-g: cardinality
    # must match a one-shot sketch of the union
    g, x, _, b = _mkbatch()
    h = [i % 2 for i in range(len(g))]
    b2 = Batch.from_pydict(
        {"g": g, "h": h, "x": x},
        {"g": BIGINT, "h": BIGINT, "x": BIGINT})
    two_level = run_plan_pydict(
        PlanBuilder().values([b2])
        .aggregate(["g", "h"], ["approx_set(x) as hs",
                                "make_set_digest(x) as sd"])
        .aggregate(["g"], ["merge(hs) as hs", "merge_set_digest(sd) as sd"])
        .project(["g", "cardinality(hs) as chs",
                  "cardinality(sd) as csd"])
        .order_by(["g"]).build())
    one_level = run_plan_pydict(
        PlanBuilder().values([b2])
        .aggregate(["g"], ["approx_set(x) as hs",
                           "make_set_digest(x) as sd"])
        .project(["g", "cardinality(hs) as chs",
                  "cardinality(sd) as csd"])
        .order_by(["g"]).build())
    # HLL merge is exactly register-max: identical estimates
    assert two_level["chs"] == one_level["chs"]
    assert two_level["csd"] == one_level["csd"]


def test_khyperloglog_uniqueness_and_reid():
    rng = np.random.default_rng(7)
    n = 3000
    g = [0] * n
    # values 0..99 each appear with ~1 distinct uii; 100..109 with many
    x, u = [], []
    for _ in range(n):
        if rng.random() < 0.5:
            v = int(rng.integers(0, 100))
            x.append(v)
            u.append(v * 7)          # exactly one uii per value
        else:
            x.append(int(100 + rng.integers(0, 10)))
            u.append(int(rng.integers(0, 1000)))
    b = Batch.from_pydict({"g": g, "x": x, "u": u},
                          {"g": BIGINT, "x": BIGINT, "u": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["khyperloglog_agg(x, u) as kh"])
        .project(["cardinality(kh) as c",
                  "uniqueness_distribution(kh) as ud",
                  "reidentification_potential(kh, 1) as rp"]).build())
    assert out["c"][0] == 110
    ud = json.loads(out["ud"][0])
    assert ud["1"] == 100            # the 100 single-uii values
    assert 0.85 <= out["rp"][0] <= 0.95   # 100/110


def test_merge_khll_matches_one_shot():
    g, x, u, b = _mkbatch(gmod=2)
    h = [i % 3 for i in range(len(g))]
    b2 = Batch.from_pydict(
        {"g": g, "h": h, "x": x, "u": u},
        {"g": BIGINT, "h": BIGINT, "x": BIGINT, "u": BIGINT})
    merged = run_plan_pydict(
        PlanBuilder().values([b2])
        .aggregate(["g", "h"], ["khyperloglog_agg(x, u) as kh"])
        .aggregate(["g"], ["merge_khll(kh) as kh"])
        .project(["g", "cardinality(kh) as c"])
        .order_by(["g"]).build())
    exact = pd.DataFrame({"g": g, "x": x}).groupby("g")["x"].nunique()
    for gid, c in zip(merged["g"], merged["c"]):
        assert abs(c - exact[gid]) <= max(4, 0.1 * exact[gid])


def test_hash_counts_json():
    _, x, _, b = _mkbatch(n=50, gmod=1)
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate([], ["make_set_digest(x) as sd"])
        .project(["hash_counts(sd) as hc"]).build())
    hc = json.loads(out["hc"][0])
    assert len(hc) == len(set(x))
    assert all(v == 1 for v in hc.values())


def test_reservoir_sample_uniform_and_exact_small():
    rng = np.random.default_rng(3)
    n = 6000
    g = [int(v) for v in rng.integers(0, 3, n)]
    x = [int(v) for v in rng.integers(0, 1000, n)]
    b = Batch.from_pydict({"g": g, "x": x},
                          {"g": BIGINT, "x": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["reservoir_sample(x, 100) as rs",
                           "count(*) as n"])
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "x": x})
    for gid, rs, cnt in zip(out["g"], out["rs"], out["n"]):
        assert len(rs) == 100
        vals = set(df[df.g == gid]["x"])
        assert all(v in vals for v in rs)
        # uniform sample mean ~ population mean (binomial bound)
        pm = df[df.g == gid]["x"].mean()
        assert abs(np.mean(rs) - pm) < 100
    # k >= group size: the whole group comes back
    small = Batch.from_pydict({"g": [0, 0, 1], "x": [5, 6, 7]},
                              {"g": BIGINT, "x": BIGINT})
    out2 = run_plan_pydict(
        PlanBuilder().values([small])
        .aggregate(["g"], ["reservoir_sample(x, 10) as rs"])
        .order_by(["g"]).build())
    assert sorted(out2["rs"][0]) == [5, 6]
    assert out2["rs"][1] == [7]


def test_sketches_over_strings_share_hash_domain():
    words = ["w%03d" % i for i in range(300)]
    rng = np.random.default_rng(5)
    g = [int(v) for v in rng.integers(0, 2, 2000)]
    s = [words[int(v)] for v in rng.integers(0, 300, 2000)]
    b = Batch.from_pydict({"g": g, "s": s},
                          {"g": BIGINT, "s": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .aggregate(["g"], ["make_set_digest(s) as sd"])
        .order_by(["g"]).build())
    from velox_tpu.functions import sketch as SK

    # both groups draw from the same 300 words -> jaccard near 1
    assert SK.jaccard_index(out["sd"][0], out["sd"][1]) > 0.8
