"""Window / RowNumber / TopNRowNumber / MarkDistinct tests vs pandas.

Mirrors velox/exec/tests/WindowTest.cpp + RowNumberTest.cpp style with a
pandas oracle.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector import from_arrow


def make_batch(d):
    return from_arrow(pa.table(d))


@pytest.fixture
def df():
    rng = np.random.default_rng(42)
    return pd.DataFrame({
        "p": rng.integers(0, 5, 200),
        "o": rng.integers(0, 50, 200),
        "v": rng.normal(size=200).round(3),
    })


def _run(df, partition, order, functions):
    b = make_batch({c: df[c].tolist() for c in df.columns})
    return run_plan_pydict(
        PlanBuilder().values([b]).window(partition, order, functions))


def test_row_number_rank_dense_rank(df):
    got = pd.DataFrame(_run(
        df, ["p"], ["o"],
        ["row_number() AS rn", "rank() AS r", "dense_rank() AS dr"]))
    g = df.groupby("p")["o"]
    exp_rn = g.cumcount() + 1  # arrival order within equal o not defined
    # rank/dense_rank are well-defined
    exp_r = g.rank(method="min").astype(int)
    exp_dr = g.rank(method="dense").astype(int)
    assert got["r"].tolist() == exp_r.tolist()
    assert got["dr"].tolist() == exp_dr.tolist()
    # row_number: a permutation of 1..n within each partition,
    # consistent with the order key
    for p, grp in got.groupby("p"):
        assert sorted(grp["rn"]) == list(range(1, len(grp) + 1))
        s = grp.sort_values("rn")
        assert s["o"].is_monotonic_increasing


def test_percent_rank_cume_dist(df):
    got = pd.DataFrame(_run(
        df, ["p"], ["o"],
        ["percent_rank() AS pr", "cume_dist() AS cd"]))
    g = df.groupby("p")["o"]
    n = df.groupby("p")["o"].transform("count")
    exp_pr = (g.rank(method="min") - 1) / (n - 1).clip(lower=1)
    exp_cd = g.rank(method="max") / n
    np.testing.assert_allclose(got["pr"], exp_pr, rtol=1e-12)
    np.testing.assert_allclose(got["cd"], exp_cd, rtol=1e-12)


def test_running_sum_min_max_count_avg(df):
    got = pd.DataFrame(_run(
        df, ["p"], ["o"],
        ["sum(v) AS s", "count(v) AS c", "min(v) AS lo",
         "max(v) AS hi", "avg(v) AS m"]))
    # default frame: range unbounded preceding..current row (peers incl.)
    d = df.copy().reset_index()
    d = d.sort_values(["p", "o", "index"])
    for p, grp in d.groupby("p"):
        run_s = 0.0
        by_o = grp.groupby("o")
        for o_val, og in by_o:
            pass
    # oracle: for each row, aggregate over rows in partition with o <= o_i
    for col, fn in [("s", "sum"), ("c", "count"), ("lo", "min"),
                    ("hi", "max"), ("m", "mean")]:
        exp = []
        for i, row in df.iterrows():
            sub = df[(df["p"] == row["p"]) & (df["o"] <= row["o"])]["v"]
            exp.append(getattr(sub, fn)())
        if col == "c":
            assert got[col].tolist() == exp
        else:
            np.testing.assert_allclose(got[col], exp, rtol=1e-9,
                                       err_msg=col)


def test_lead_lag_first_last(df):
    got = pd.DataFrame(_run(
        df, ["p"], ["o", "v"],
        ["lead(v) AS ld", "lag(v) AS lg", "first_value(v) AS fv",
         "lag(v, 2) AS lg2"]))
    d = df.sort_values(["p", "o", "v"], kind="stable")
    g = d.groupby("p")["v"]
    exp = d.copy()
    exp["ld"] = g.shift(-1)
    exp["lg"] = g.shift(1)
    exp["lg2"] = g.shift(2)
    exp["fv"] = g.transform("first")
    merged = exp.sort_index()
    for c in ["ld", "lg", "lg2", "fv"]:
        for a, b in zip(got[c], merged[c]):
            a_null = a is None or (isinstance(a, float) and pd.isna(a))
            if a_null or pd.isna(b):
                assert a_null and pd.isna(b), (c, a, b)
            else:
                assert abs(a - b) < 1e-9, (c, a, b)


def test_ntile(df):
    got = pd.DataFrame(_run(df, ["p"], ["o", "v"], ["ntile(4) AS nt"]))
    for p, grp in got.groupby("p"):
        n = len(grp)
        counts = grp["nt"].value_counts().sort_index()
        size, rem = divmod(n, 4)
        expected_counts = [size + 1] * rem + [size] * (4 - rem)
        expected_counts = [c for c in expected_counts if c > 0]
        assert counts.tolist() == expected_counts


def test_row_number_operator_with_limit(df):
    b = make_batch({c: df[c].tolist() for c in df.columns})
    got = pd.DataFrame(run_plan_pydict(
        PlanBuilder().values([b]).row_number(["p"], "rn", limit=3)))
    for p, grp in got.groupby("p"):
        assert len(grp) == min(3, len(df[df["p"] == p]))
        assert sorted(grp["rn"]) == list(range(1, len(grp) + 1))


def test_top_n_row_number(df):
    b = make_batch({c: df[c].tolist() for c in df.columns})
    got = pd.DataFrame(run_plan_pydict(
        PlanBuilder().values([b])
        .top_n_row_number(["p"], ["v DESC"], 2, "rn")))
    for p, grp in df.groupby("p"):
        top2 = set(grp.sort_values("v", ascending=False).head(2)["v"])
        sel = got[got["p"] == p]
        assert set(sel["v"]) == top2


def test_mark_distinct(df):
    b = make_batch({c: df[c].tolist() for c in df.columns})
    got = pd.DataFrame(run_plan_pydict(
        PlanBuilder().values([b]).mark_distinct("is_first", ["p", "o"])))
    exp = ~df.duplicated(["p", "o"])
    assert got["is_first"].tolist() == exp.tolist()


def test_group_id_grouping_sets(df):
    got = pd.DataFrame(run_plan_pydict(
        PlanBuilder().values([make_batch(
            {c: df[c].tolist() for c in df.columns})])
        .group_id([["p"], ["o"], []])
        .aggregate(["p", "o", "group_id"], ["sum(v) AS s"])))
    # set 0: by p (o null); set 1: by o (p null); set 2: grand total
    s0 = got[got["group_id"] == 0]
    e0 = df.groupby("p")["v"].sum()
    assert sorted(s0["p"]) == sorted(e0.index)
    np.testing.assert_allclose(
        s0.sort_values("p")["s"].to_numpy(), e0.sort_index().to_numpy(),
        rtol=1e-9)
    assert s0["o"].isna().all()
    s2 = got[got["group_id"] == 2]
    assert len(s2) == 1
    assert s2["s"].iloc[0] == pytest.approx(df["v"].sum())


def test_rows_frame_sliding_sum():
    import pandas as pd

    rng = np.random.default_rng(8)
    g = [int(x) for x in rng.integers(0, 4, 40)]
    o = list(range(40))
    v = [float(x) for x in rng.normal(size=40)]
    b = make_batch({"g": g, "o": o, "v": v})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .window(["g"], ["o"], [
            "sum(v) ROWS BETWEEN 2 PRECEDING AND CURRENT ROW as s",
            "avg(v) ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING as a",
            "count(v) ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 FOLLOWING as c",
        ])
        .order_by(["g", "o"]).build())
    df = pd.DataFrame({"g": g, "o": o, "v": v}).sort_values(
        ["g", "o"]).reset_index(drop=True)
    exp_s = df.groupby("g")["v"].rolling(3, min_periods=1).sum() \
        .reset_index(drop=True)
    exp_a = (df.groupby("g")["v"]
             .rolling(3, min_periods=1, center=True).mean()
             .reset_index(drop=True))
    np.testing.assert_allclose(out["s"], exp_s, rtol=1e-9)
    np.testing.assert_allclose(out["a"], exp_a, rtol=1e-9)
    exp_c = df.groupby("g").cumcount() + 2
    last = df.groupby("g")["v"].transform("size")
    exp_c = np.minimum(exp_c, last)
    assert out["c"] == [int(x) for x in exp_c]


def test_rows_frame_value_functions():
    import pandas as pd

    g = [1] * 6 + [2] * 4
    o = list(range(10))
    v = [float(x) for x in [5, 1, 4, 2, 9, 7, 3, 8, 6, 0]]
    b = make_batch({"g": g, "o": o, "v": v})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .window(["g"], ["o"], [
            "first_value(v) ROWS BETWEEN 2 PRECEDING AND CURRENT ROW as f",
            "last_value(v) ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING as l",
        ])
        .order_by(["g", "o"]).build())
    df = pd.DataFrame({"g": g, "o": o, "v": v})
    exp_f, exp_l = [], []
    for _, sub in df.groupby("g"):
        vals = sub["v"].tolist()
        for i in range(len(vals)):
            exp_f.append(vals[max(i - 2, 0)])
            exp_l.append(vals[min(i + 1, len(vals) - 1)])
    assert out["f"] == exp_f
    assert out["l"] == exp_l


def test_range_frame_value_offsets():
    # k-range frames (velox/exec/window/KRangeFrameBound.h analog):
    # bounds by ORDER-BY value, not row position
    g = [0] * 6 + [1] * 4
    o = [1, 3, 4, 8, 9, 15, 2, 4, 5, 9]
    v = [float(x) for x in [10, 20, 30, 40, 50, 60, 1, 2, 3, 4]]
    b = make_batch({"g": g, "o": o, "v": v})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .window(["g"], ["o"], [
            "sum(v) RANGE BETWEEN 2 PRECEDING AND CURRENT ROW as s",
            "count(v) RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING as c",
            "min(v) RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING as lo",
            "max(v) RANGE BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW as hi",
        ])
        .order_by(["g", "o"]).build())
    df = pd.DataFrame({"g": g, "o": o, "v": v}).sort_values(
        ["g", "o"]).reset_index(drop=True)

    def frame(row, lo, hi):
        sub = df[df["g"] == row["g"]]
        if lo is None:
            m = sub["o"] <= row["o"] + (hi or 0)
        else:
            m = (sub["o"] >= row["o"] - lo) & (sub["o"] <= row["o"] + hi)
        return sub[m]["v"]

    for i, row in df.iterrows():
        assert out["s"][i] == pytest.approx(frame(row, 2, 0).sum())
        assert out["c"][i] == len(frame(row, 1, 1))
        assert out["lo"][i] == pytest.approx(frame(row, 3, 3).min())
        assert out["hi"][i] == pytest.approx(frame(row, None, 0).max())


def test_range_frame_current_row_is_peers():
    # CURRENT ROW in RANGE mode includes the whole peer group
    g = [0] * 5
    o = [1, 2, 2, 2, 3]
    v = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = make_batch({"g": g, "o": o, "v": v})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .window(["g"], ["o"], [
            "sum(v) RANGE BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW as s"])
        .order_by(["o", "v"]).build())
    # rows with o=2 all see sum(1+2+3+4) = 10 (peers included)
    assert out["s"] == [1.0, 10.0, 10.0, 10.0, 15.0]


def test_rows_frame_min_max():
    rng = np.random.default_rng(3)
    g = [int(x) for x in rng.integers(0, 3, 60)]
    o = list(range(60))
    v = [float(x) for x in rng.normal(size=60)]
    b = make_batch({"g": g, "o": o, "v": v})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .window(["g"], ["o"], [
            "min(v) ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING as lo",
            "max(v) ROWS BETWEEN 4 PRECEDING AND CURRENT ROW as hi"])
        .order_by(["g", "o"]).build())
    df = pd.DataFrame({"g": g, "o": o, "v": v}).sort_values(
        ["g", "o"]).reset_index(drop=True)
    exp_lo = (df.groupby("g")["v"]
              .rolling(5, min_periods=1, center=True).min()
              .reset_index(drop=True))
    exp_hi = df.groupby("g")["v"].rolling(5, min_periods=1).max() \
        .reset_index(drop=True)
    np.testing.assert_allclose(out["lo"], exp_lo, rtol=1e-9)
    np.testing.assert_allclose(out["hi"], exp_hi, rtol=1e-9)


def test_rows_frame_descending_order():
    g = [0] * 6
    o = [5, 3, 8, 1, 9, 2]
    v = [float(x) for x in [1, 2, 3, 4, 5, 6]]
    b = make_batch({"g": g, "o": o, "v": v})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .window(["g"], ["o DESC"], [
            "sum(v) RANGE BETWEEN 2 PRECEDING AND CURRENT ROW as s"])
        .order_by(["o"]).build())
    df = pd.DataFrame({"g": g, "o": o, "v": v})
    for i, row in df.sort_values("o").iterrows():
        # DESC: "2 preceding" = o values up to row.o + 2
        m = (df["o"] >= row["o"]) & (df["o"] <= row["o"] + 2)
        exp = df[m]["v"].sum()
        got = out["s"][out["o"].index(row["o"])]
        assert got == pytest.approx(exp), (row["o"], got, exp)


def test_streaming_window_matches_blocking():
    """StreamingWindowOp (partition-clustered input) == blocking WindowOp
    (velox RowsStreamingWindowBuild analog)."""
    import dataclasses

    from velox_tpu.exec.task import Task
    from velox_tpu.plan.nodes import StreamingWindowNode, WindowNode

    rng = np.random.default_rng(6)
    # clustered by p across 3 batches; partitions span batch boundaries
    p = sorted(int(x) for x in rng.integers(0, 12, 300))
    o = [int(x) for x in rng.integers(0, 50, 300)]
    v = [float(np.round(x, 3)) for x in rng.normal(size=300)]
    rid = list(range(300))
    batches = [
        make_batch({"p": p[i:i + 100], "o": o[i:i + 100],
                    "v": v[i:i + 100], "rid": rid[i:i + 100]})
        for i in range(0, 300, 100)]

    def build(streaming):
        # rid tiebreaker: ROWS frames depend on order among peers, which
        # is otherwise unstable-sort nondeterminism
        pb = (PlanBuilder().values(batches)
              .window(["p"], ["o", "rid"], [
                  "row_number() AS rn", "rank() AS r",
                  "sum(v) ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING "
                  "AS s",
                  "min(v) RANGE BETWEEN 2 PRECEDING AND CURRENT ROW "
                  "AS lo"])
              .order_by(["p", "o", "v"]))
        node = pb.build()
        if streaming:
            # retype the WindowNode inside the tree
            def retype(n):
                srcs = tuple(retype(s) for s in n.sources)
                if srcs != tuple(n.sources):
                    n = dataclasses.replace(n, **(
                        {"source": srcs[0]} if hasattr(n, "source")
                        else {}))
                if type(n) is WindowNode:
                    n = StreamingWindowNode(**{
                        f.name: getattr(n, f.name)
                        for f in dataclasses.fields(n)})
                return n
            node = retype(node)
        return node

    a = run_plan_pydict(build(False))
    b = run_plan_pydict(build(True))
    assert set(a) == set(b)
    for col in a:
        for x, y in zip(a[col], b[col]):
            if isinstance(x, float):
                # prefix-sum association differs between whole-input and
                # per-partition evaluation; equality is to float tolerance
                assert y == pytest.approx(x, rel=1e-9, abs=1e-9)
            else:
                assert x == y, col


def test_optimizer_picks_streaming_window():
    import pyarrow as pa

    from velox_tpu.io import drop_table, register_arrow
    from velox_tpu.plan.nodes import StreamingWindowNode
    from velox_tpu.plan.optimizer import optimize_plan

    rng = np.random.default_rng(3)
    n = 400
    register_arrow("swin_t", pa.table({
        "p": np.sort(rng.integers(0, 20, n)),
        "o": rng.integers(0, 9, n),
        "v": rng.normal(size=n)}), 128)
    try:
        plan = (PlanBuilder().table_scan("swin_t")
                .window(["p"], ["o"], ["sum(v) AS s", "rank() AS r"])
                .build())
        opt = optimize_plan(plan)

        def find(node):
            if isinstance(node, StreamingWindowNode):
                return True
            return any(find(s) for s in node.sources)

        assert find(opt), "optimizer did not pick the streaming window"
        out = run_plan_pydict(
            PlanBuilder().table_scan("swin_t")
            .window(["p"], ["o"], ["sum(v) AS s"])
            .order_by(["p", "o", "v"]).build())
        df = (pd.DataFrame({"p": np.asarray(np.sort(
            rng.integers(0, 0, 0))), }) if False else None)
        assert len(out["s"]) == n
    finally:
        drop_table("swin_t")
