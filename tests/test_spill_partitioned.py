"""Partitioned aggregation spill: hash-partitioned host staging with
one-partition-at-a-time merge restore (velox/exec/GroupingSet.cpp:1116
spill + mergeRestore analog)."""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.exec import run_plan, run_plan_pydict
from velox_tpu.exec.spill import PartitionedEntryStore, memory_manager
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.utils.config import config
from velox_tpu.utils.metrics import reporter
from velox_tpu.vector.batch import Batch


@pytest.fixture
def tiny_budget():
    old = config.spill_memory_budget_bytes
    config.spill_memory_budget_bytes = 1 << 12  # 4KB: every batch spills
    yield
    config.spill_memory_budget_bytes = old


def _data(n=3000, ng=400, seed=5):
    rng = np.random.default_rng(seed)
    g = [int(x) for x in rng.integers(0, ng, n)]
    v = [float(x) for x in rng.normal(size=n)]
    return g, v


def test_group_by_spills_and_matches_oracle(tiny_budget):
    g, v = _data()
    batches = [
        Batch.from_pydict(
            {"g": g[i:i + 500], "v": v[i:i + 500]},
            {"g": BIGINT, "v": DOUBLE})
        for i in range(0, len(g), 500)]
    before = reporter.counters["velox_tpu.spilled_bytes"]
    out = run_plan_pydict(
        PlanBuilder().values(batches)
        .aggregate(["g"], ["sum(v) AS s", "count(*) AS c",
                           "min(v) AS lo"])
        .order_by(["g"]).build())
    assert reporter.counters["velox_tpu.spilled_bytes"] > before, \
        "budget was not hit — test is vacuous"
    df = pd.DataFrame({"g": g, "v": v})
    exp = df.groupby("g").agg(s=("v", "sum"), c=("v", "size"),
                              lo=("v", "min")).reset_index()
    assert out["g"] == exp["g"].tolist()
    for a, b in zip(out["s"], exp["s"]):
        assert a == pytest.approx(b, rel=1e-9)
    assert out["c"] == exp["c"].tolist()
    for a, b in zip(out["lo"], exp["lo"]):
        assert a == pytest.approx(b)


def test_spilled_finish_streams_partitions(tiny_budget):
    # the finish path must NOT materialize all restored state at once:
    # each call to the aggregation's output yields one partition's merge
    g, v = _data(4000, 1000, seed=9)
    b = Batch.from_pydict({"g": g, "v": v}, {"g": BIGINT, "v": DOUBLE})
    table = run_plan(
        PlanBuilder().values([b])
        .aggregate(["g"], ["sum(v) AS s"]).build())
    # partitions stream as separate output batches -> arrow chunks > 1
    assert table.column("g").num_chunks > 1
    got = dict(zip(table.column("g").to_pylist(),
                   table.column("s").to_pylist()))
    df = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].sum()
    assert len(got) == len(df)
    for k, s in df.items():
        assert got[k] == pytest.approx(s, rel=1e-9)


def test_spill_with_distinct_and_masks(tiny_budget):
    rng = np.random.default_rng(11)
    n = 2000
    g = [int(x) for x in rng.integers(0, 300, n)]
    v = [int(x) for x in rng.integers(0, 20, n)]
    keep = [bool(x) for x in rng.integers(0, 2, n)]
    from velox_tpu.types import BOOLEAN

    batches = [
        Batch.from_pydict(
            {"g": g[i:i + 250], "v": v[i:i + 250],
             "keep": keep[i:i + 250]},
            {"g": BIGINT, "v": BIGINT, "keep": BOOLEAN})
        for i in range(0, n, 250)]
    out = run_plan_pydict(
        PlanBuilder().values(batches)
        .aggregate(["g"], ["count(distinct v) AS d", "sum(v) AS s"],
                   masks={"s": "keep"})
        .order_by(["g"]).build())
    df = pd.DataFrame({"g": g, "v": v, "keep": keep})
    exp_d = df.groupby("g")["v"].nunique()
    exp_s = df[df["keep"]].groupby("g")["v"].sum()
    assert out["g"] == sorted(set(g))
    for gid, d in zip(out["g"], out["d"]):
        assert d == exp_d[gid]
    for gid, s in zip(out["g"], out["s"]):
        assert s == exp_s.get(gid, None) or (
            s is None and gid not in exp_s.index)


def test_store_partition_disjointness():
    store = PartitionedEntryStore("t", num_parts=4, mm=memory_manager)
    import jax.numpy as jnp

    for seed in range(3):
        rng = np.random.default_rng(seed)
        keys = jnp.asarray(rng.integers(0, 50, 128))
        lanes = (jnp.asarray(rng.normal(size=128)),)
        store.append({
            "keys": [(keys, None)], "lanes": [lanes],
            "sel": jnp.ones(128, dtype=bool), "distinct": [None]})
    store.spill_all()
    parts = store.partitions()
    seen = {}
    for pi, entries in enumerate(parts):
        for e in entries:
            for k in np.asarray(e["keys"][0][0])[e["sel"]]:
                assert seen.setdefault(int(k), pi) == pi, \
                    f"key {k} in two partitions"
    assert len(parts) > 1


# ------------------------------------------------- partitioned join spill

def _join_data(seed=7, n=3000, nb=600):
    rng = np.random.default_rng(seed)
    pk = [int(x) for x in rng.integers(0, 800, n)]
    pv = [float(x) for x in rng.normal(size=n)]
    bk = [int(x) for x in rng.integers(0, 800, nb)]
    bw = [float(x) for x in rng.normal(size=nb)]
    return pk, pv, bk, bw


@pytest.mark.parametrize("jt", ["inner", "left", "left_semi", "anti"])
def test_join_build_spill_matches_oracle(tiny_budget, jt):
    pk, pv, bk, bw = _join_data()
    probe_batches = [
        Batch.from_pydict({"k": pk[i:i + 500], "v": pv[i:i + 500]},
                          {"k": BIGINT, "v": DOUBLE})
        for i in range(0, len(pk), 500)]
    build_batches = [
        Batch.from_pydict({"bk": bk[i:i + 200], "w": bw[i:i + 200]},
                          {"bk": BIGINT, "w": DOUBLE})
        for i in range(0, len(bk), 200)]
    out_cols = (["k", "v"] if jt in ("left_semi", "anti")
                else ["k", "v", "w"])
    out = run_plan_pydict(
        PlanBuilder().values(probe_batches)
        .hash_join(PlanBuilder().values(build_batches), ["k"], ["bk"],
                   jt, output=out_cols)
        .order_by(["k", "v"] + (["w"] if "w" in out_cols else []))
        .build())

    left = pd.DataFrame({"k": pk, "v": pv})
    right = pd.DataFrame({"bk": bk, "w": bw})
    if jt == "inner":
        exp = left.merge(right, left_on="k", right_on="bk")
    elif jt == "left":
        exp = left.merge(right, left_on="k", right_on="bk", how="left")
    elif jt == "left_semi":
        exp = left[left["k"].isin(set(bk))]
    else:  # anti (null-aware; no nulls here -> not-in semantics)
        exp = left[~left["k"].isin(set(bk))]
    assert len(out["k"]) == len(exp), (jt, len(out["k"]), len(exp))
    srt = exp.sort_values(
        ["k", "v"] + (["w"] if "w" in out_cols else []))
    assert out["k"] == srt["k"].tolist()
    for a, b in zip(out["v"], srt["v"]):
        assert a == pytest.approx(b)
    if "w" in out_cols:
        for a, b in zip(out["w"], srt["w"]):
            if b != b:  # NaN marks left-outer null in pandas
                assert a is None
            else:
                assert a == pytest.approx(b)


def test_join_build_spill_right_outer(tiny_budget):
    pk, pv, bk, bw = _join_data(seed=13, n=1500, nb=900)
    probe_batches = [
        Batch.from_pydict({"k": pk[i:i + 300], "v": pv[i:i + 300]},
                          {"k": BIGINT, "v": DOUBLE})
        for i in range(0, len(pk), 300)]
    build_batches = [
        Batch.from_pydict({"bk": bk[i:i + 150], "w": bw[i:i + 150]},
                          {"bk": BIGINT, "w": DOUBLE})
        for i in range(0, len(bk), 150)]
    out = run_plan_pydict(
        PlanBuilder().values(probe_batches)
        .hash_join(PlanBuilder().values(build_batches), ["k"], ["bk"],
                   "right", output=["k", "v", "bk", "w"])
        .build())
    exp = pd.DataFrame({"k": pk, "v": pv}).merge(
        pd.DataFrame({"bk": bk, "w": bw}),
        left_on="k", right_on="bk", how="right")
    assert len(out["k"]) == len(exp)
    assert sorted(x for x in out["bk"]) == sorted(exp["bk"].tolist())


def test_disk_spill_tier(tmp_path):
    """HBM -> host RAM -> SerializedPage files (velox SpillFile): both
    budgets tiny, the query still matches the oracle and spill files
    were actually written."""
    from velox_tpu.utils.metrics import reporter

    old_dev = config.spill_memory_budget_bytes
    old_host = config.spill_host_budget_bytes
    old_dir = config.spill_dir
    config.spill_memory_budget_bytes = 1 << 11
    config.spill_host_budget_bytes = 1 << 12
    config.spill_dir = str(tmp_path)
    try:
        rng = np.random.default_rng(3)
        pk = [int(x) for x in rng.integers(0, 200, 1200)]
        pv = [float(x) for x in rng.normal(size=1200)]
        bk = [int(x) for x in rng.integers(0, 200, 600)]
        probe = [Batch.from_pydict(
            {"k": pk[i:i + 200], "v": pv[i:i + 200]},
            {"k": BIGINT, "v": DOUBLE}) for i in range(0, 1200, 200)]
        build = [Batch.from_pydict(
            {"bk": bk[i:i + 100]}, {"bk": BIGINT})
            for i in range(0, 600, 100)]
        before = reporter.counters["velox_tpu.spill_file_bytes"]
        out = run_plan_pydict(
            PlanBuilder().values(probe)
            .hash_join(PlanBuilder().values(build), ["k"], ["bk"],
                       "left_semi")
            .aggregate(["k"], ["sum(v) AS s"]).order_by(["k"]).build())
        assert reporter.counters["velox_tpu.spill_file_bytes"] > before,\
            "disk tier never engaged"
        df = pd.DataFrame({"k": pk, "v": pv})
        exp = df[df["k"].isin(set(bk))].groupby("k")["v"].sum()
        assert out["k"] == list(exp.index)
        for a, b in zip(out["s"], exp):
            assert a == pytest.approx(b, rel=1e-9)
    finally:
        config.spill_memory_budget_bytes = old_dev
        config.spill_host_budget_bytes = old_host
        config.spill_dir = old_dir


def test_async_spill_io_roundtrip():
    """Async host->disk spill (config.spill_io_threads > 0): writes
    overlap compute; restore joins the pending write. Sync (0) and
    async results must be identical."""
    import numpy as np

    from velox_tpu.exec.spill import SpillableBuffer
    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    rng = np.random.default_rng(5)

    def roundtrip(threads):
        old = config.spill_io_threads
        config.spill_io_threads = threads
        try:
            buf = SpillableBuffer("async_io_test")
            for s in range(3):
                buf.append(Batch.from_pydict(
                    {"x": [int(v) for v in rng.integers(0, 99, 500)],
                     "g": [s] * 500}, {"x": BIGINT, "g": BIGINT}))
            # rng must not diverge between runs
            buf.spill_all()
            buf.spill_to_disk()
            assert buf.has_spilled()
            out = buf.drain()
            return sorted(
                (int(g), int(x))
                for b in out
                for g, x in zip(*[np.asarray(b.columns[c].values)
                                  [np.asarray(b.sel)]
                                  for c in ("g", "x")]))
        finally:
            config.spill_io_threads = old

    rng = np.random.default_rng(5)
    sync = roundtrip(0)
    rng = np.random.default_rng(5)
    asy = roundtrip(2)
    assert sync == asy
    assert len(sync) == 1500
