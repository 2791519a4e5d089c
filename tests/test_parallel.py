"""Distributed shuffle + aggregation on the 8-virtual-device CPU mesh.

The multi-node-without-a-cluster strategy (velox/exec/tests/
MultiFragmentTest.cpp:52 analog): full SPMD semantics in one process.
"""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from velox_tpu.types import DOUBLE
from velox_tpu.parallel import make_mesh
from velox_tpu.parallel.aggregate import make_distributed_aggregate
from velox_tpu.parallel.shuffle import hash_repartition


N_DEV = 8
ROWS_PER_DEV = 256


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV
    return make_mesh(N_DEV)


def test_hash_repartition_conserves_rows_and_colocates_keys(mesh):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 40, N_DEV * ROWS_PER_DEV).astype(np.int64)
    vals = rng.normal(size=N_DEV * ROWS_PER_DEV)
    sel = np.ones(N_DEV * ROWS_PER_DEV, dtype=bool)
    sel[::13] = False

    def step(k, v, s):
        recv, rsel, overflow = hash_repartition(
            [k, v], [(k, None)], s, "d", N_DEV)
        return recv[0], recv[1], rsel, overflow[None]

    f = shard_map(
        step, mesh=mesh, in_specs=(P("d"), P("d"), P("d")),
        out_specs=(P("d"), P("d"), P("d"), P("d")))
    rk, rv, rsel, overflow = jax.jit(f)(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(sel))
    rk, rv, rsel = map(np.asarray, (rk, rv, rsel))
    assert int(np.asarray(overflow).sum()) == 0
    # row conservation
    assert rsel.sum() == sel.sum()
    assert sorted(rv[rsel].tolist()) == sorted(vals[sel].tolist())
    # key colocation: each key appears on exactly one device shard
    per_dev = rsel.shape[0] // N_DEV
    key_devices = {}
    for i in np.nonzero(rsel)[0]:
        d = i // per_dev
        key_devices.setdefault(int(rk[i]), set()).add(d)
    assert all(len(s) == 1 for s in key_devices.values())


def test_distributed_group_by_matches_pandas(mesh):
    rng = np.random.default_rng(1)
    n = N_DEV * ROWS_PER_DEV
    keys = rng.integers(0, 50, n).astype(np.int64)
    vals = rng.normal(size=n)
    sel = np.ones(n, dtype=bool)

    step = make_distributed_aggregate(
        "d", N_DEV, num_keys=1,
        specs=[("sum", DOUBLE), ("count", None), ("min", DOUBLE)])

    def run(k, v, s):
        return step([k], [None], [v, None, v], s)

    f = shard_map(
        run, mesh=mesh, in_specs=(P("d"), P("d"), P("d")),
        out_specs=(
            [P("d")], [None], [P("d")] * 3, [P("d")] * 3, P("d")))
    out_keys, _, results, rvalids, gsel = jax.jit(f)(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(sel))
    gsel = np.asarray(gsel)
    k = np.asarray(out_keys[0])[gsel]
    s = np.asarray(results[0])[gsel]
    c = np.asarray(results[1])[gsel]
    lo = np.asarray(results[2])[gsel]

    df = pd.DataFrame({"k": keys, "v": vals})
    e = df.groupby("k").agg(
        s=("v", "sum"), c=("v", "count"), lo=("v", "min"))
    got = pd.DataFrame({"k": k, "s": s, "c": c, "lo": lo}).sort_values(
        "k").set_index("k")
    assert list(got.index) == list(e.index)
    np.testing.assert_allclose(got["s"], e["s"], rtol=1e-12)
    np.testing.assert_array_equal(got["c"], e["c"])
    np.testing.assert_allclose(got["lo"], e["lo"], rtol=1e-12)


def test_distributed_keyless_aggregate(mesh):
    rng = np.random.default_rng(2)
    n = N_DEV * ROWS_PER_DEV
    vals = rng.normal(size=n)
    sel = np.ones(n, dtype=bool)
    sel[: n // 4] = False

    step = make_distributed_aggregate(
        "d", N_DEV, num_keys=0,
        specs=[("sum", DOUBLE), ("count", None), ("max", DOUBLE)])

    def run(v, s):
        return step([], [], [v, None, v], s)

    f = shard_map(
        run, mesh=mesh, in_specs=(P("d"), P("d")),
        out_specs=([], [], [P(None)] * 3, [P(None)] * 3, P(None)),
        check_vma=False)
    _, _, results, rvalids, gsel = jax.jit(f)(
        jnp.asarray(vals), jnp.asarray(sel))
    assert np.asarray(results[0])[0] == pytest.approx(vals[sel].sum())
    assert int(np.asarray(results[1])[0]) == int(sel.sum())
    assert np.asarray(results[2])[0] == pytest.approx(vals[sel].max())


def test_run_plan_distributed_matches_serial(mesh):
    import pyarrow as pa

    from velox_tpu.io import register_arrow, drop_table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan
    from velox_tpu.parallel.runner import run_plan_distributed

    rng = np.random.default_rng(7)
    n = 4096
    register_arrow("dist_t", pa.table({
        "k": rng.integers(0, 23, n), "v": rng.normal(size=n),
        "w": rng.integers(0, 100, n)}), batch_rows=512)
    try:
        def plan():
            return (PlanBuilder().table_scan("dist_t")
                    .filter("w < 80")
                    .project(["k", "v * 2.0 AS v2"])
                    .aggregate(["k"], ["sum(v2) AS s", "count(*) AS c",
                                       "min(v2) AS lo"]))

        serial = run_plan(plan()).to_pandas().sort_values(
            "k").reset_index(drop=True)
        dist = run_plan_distributed(plan(), mesh).to_pandas().sort_values(
            "k").reset_index(drop=True)
        assert serial["k"].tolist() == dist["k"].tolist()
        np.testing.assert_allclose(serial["s"], dist["s"], rtol=1e-12)
        assert serial["c"].tolist() == dist["c"].tolist()
        np.testing.assert_allclose(serial["lo"], dist["lo"], rtol=1e-12)
    finally:
        drop_table("dist_t")


def test_run_plan_distributed_keyless(mesh):
    import pyarrow as pa

    from velox_tpu.io import register_arrow, drop_table
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan
    from velox_tpu.parallel.runner import run_plan_distributed

    rng = np.random.default_rng(8)
    register_arrow("dist_g", pa.table({
        "v": rng.normal(size=3000)}), batch_rows=500)
    try:
        p = (PlanBuilder().table_scan("dist_g")
             .aggregate([], ["sum(v) AS s", "count(*) AS c"]))
        serial = run_plan(p).to_pydict()
        p2 = (PlanBuilder().table_scan("dist_g")
              .aggregate([], ["sum(v) AS s", "count(*) AS c"]))
        dist = run_plan_distributed(p2, mesh).to_pydict()
        assert dist["c"] == serial["c"]
        assert dist["s"][0] == pytest.approx(serial["s"][0], rel=1e-12)
    finally:
        drop_table("dist_g")


def test_broadcast_semi_join_distributed():
    import pandas as pd
    import pyarrow as pa

    from velox_tpu.plan import PlanBuilder

    from velox_tpu.io.catalog import drop_table, register_arrow
    from velox_tpu.parallel.runner import run_plan_distributed

    rng = np.random.default_rng(15)
    n = 5000
    lk = [int(x) for x in rng.integers(0, 400, n)]
    lv = [float(x) for x in rng.normal(size=n)]
    register_arrow("bj_left", pa.table({"k": lk, "v": lv}),
                   batch_rows=700)
    rk = sorted(set(int(x) for x in rng.integers(0, 400, 120)))
    register_arrow("bj_right", pa.table({"rk": rk}))
    try:
        for jt, keep in (("left_semi", True), ("anti_simple", False)):
            plan = (PlanBuilder().table_scan("bj_left")
                    .hash_join(PlanBuilder().table_scan("bj_right"),
                               ["k"], ["rk"], jt)
                    .build())
            out = run_plan_distributed(plan).to_pydict()
            df = pd.DataFrame({"k": lk, "v": lv})
            exp = df[df.k.isin(rk) == keep]
            got = pd.DataFrame(out).sort_values(
                ["k", "v"]).reset_index(drop=True)
            exps = exp.sort_values(["k", "v"]).reset_index(drop=True)
            assert got["k"].tolist() == exps["k"].tolist()
            np.testing.assert_allclose(got["v"], exps["v"], rtol=1e-12)
    finally:
        drop_table("bj_left")
        drop_table("bj_right")


# ------------------------------------------ distributed probe pipelines

def _mk_tables(seed=0):
    import pyarrow as pa
    from velox_tpu.io import register_arrow

    rng = np.random.default_rng(seed)
    n = 4000
    register_arrow("dp_probe", pa.table(
        {"k": rng.integers(0, 200, n),
         "k2": rng.integers(0, 50, n),
         "v": rng.normal(size=n)}), 512)
    return n


def test_distributed_inner_join_pipeline_matches_serial(mesh):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(3)
    build = Batch.from_pydict(
        {"bk": list(range(0, 200, 2)),
         "w": [float(i) / 7 for i in range(100)]},
        {"bk": BIGINT, "w": DOUBLE})
    semi = Batch.from_pydict(
        {"sk": list(range(0, 50, 3))}, {"sk": BIGINT})

    def plan():
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k", "k2", "v"])
                .hash_join(PlanBuilder().values([semi]), ["k2"], ["sk"],
                           "left_semi")
                .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                           "inner", output=["k", "v", "w"])
                .project(["k", "v * 2.0 + w AS x"])
                .aggregate(["k"], ["sum(x) AS s", "count(*) AS c",
                                   "min(x) AS lo"])
                .order_by(["k"]))

    try:
        serial = run_plan(plan().build()).to_pydict()
        dist = run_plan_distributed(
            plan().build(), mesh=mesh).to_pydict()
        assert serial["k"] == dist["k"]
        assert serial["c"] == dist["c"]
        for a, b in zip(serial["s"], dist["s"]):
            assert a == pytest.approx(b, rel=1e-12)
        for a, b in zip(serial["lo"], dist["lo"]):
            assert a == pytest.approx(b, rel=1e-12)
    finally:
        drop_table("dp_probe")


def test_distributed_join_no_agg_matches_serial(mesh):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(4)
    build = Batch.from_pydict(
        {"bk": [0, 1, 2, 3, 4, 5], "w": [0.5, 1.5, 2.5, 3.5, 4.5, 5.5]},
        {"bk": BIGINT, "w": DOUBLE})

    def plan():
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k2", "v"])
                .hash_join(PlanBuilder().values([build]), ["k2"], ["bk"],
                           "inner", output=["k2", "v", "w"])
                .top_n(["v DESC"], 17))

    try:
        serial = run_plan(plan().build()).to_pydict()
        dist = run_plan_distributed(
            plan().build(), mesh=mesh).to_pydict()
        assert serial["v"] == dist["v"]
        assert serial["k2"] == dist["k2"]
    finally:
        drop_table("dp_probe")


def test_distributed_q3_matches_serial(mesh):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.io.tpch import register_tpch
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.tpch import tpch_plan

    register_tpch(0.005, batch_rows=1 << 13)
    try:
        serial = run_plan(tpch_plan(3).build()).to_pydict()
        import velox_tpu.parallel.pipeline as pl

        hits = []
        orig = pl.try_distributed_pipeline

        def spy(*a, **k):
            r = orig(*a, **k)
            hits.append(r is not None)
            return r

        pl.try_distributed_pipeline = spy
        try:
            dist = run_plan_distributed(
                tpch_plan(3).build(), mesh=mesh).to_pydict()
        finally:
            pl.try_distributed_pipeline = orig
        assert hits == [True], "distributed path not taken for Q3"
        assert set(serial) == set(dist)
        for c in serial:
            if c == "revenue":  # f64 summation order differs per device
                assert dist[c] == pytest.approx(serial[c], rel=1e-9)
            else:
                assert dist[c] == serial[c], c
    finally:
        for t in ("lineitem", "orders", "customer", "part", "supplier",
                  "partsupp", "nation", "region"):
            try:
                drop_table(t)
            except KeyError:
                pass


# ----------------- r3: outer joins / sorts / partial-final on the mesh

def _df_cmp(serial, dist, float_cols=(), sort_by=None):
    import pandas as pd

    a, b = pd.DataFrame(serial), pd.DataFrame(dist)
    if sort_by:
        a = a.sort_values(sort_by).reset_index(drop=True)
        b = b.sort_values(sort_by).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        if c in float_cols:
            np.testing.assert_allclose(
                a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float),
                rtol=1e-9, equal_nan=True)
        else:
            av, bv = a[c].fillna(-987654321), b[c].fillna(-987654321)
            assert av.tolist() == bv.tolist(), c


@pytest.mark.parametrize("jt", ["right", "full"])
def test_distributed_outer_join_matches_serial(mesh, jt):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(11)
    # build keys 0..59: some never probed (k2 in 0..49) -> unmatched
    # build rows must appear exactly once globally
    build = Batch.from_pydict(
        {"bk": list(range(0, 60)),
         "w": [float(i) / 3 for i in range(60)]},
        {"bk": BIGINT, "w": DOUBLE})

    def plan():
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k2", "v"])
                .hash_join(PlanBuilder().values([build]), ["k2"],
                           ["bk"], jt,
                           output=["k2", "v", "bk", "w"]))

    try:
        serial = run_plan(plan().build()).to_pydict()
        dist = run_plan_distributed(
            plan().build(), mesh=mesh).to_pydict()
        _df_cmp(serial, dist, float_cols=("v", "w"),
                sort_by=["bk", "v"] if jt == "right" else ["k2", "v"])
    finally:
        drop_table("dp_probe")


def test_distributed_order_by_matches_serial(mesh):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(12)
    build = Batch.from_pydict(
        {"bk": list(range(0, 50)),
         "w": [float(i) * 1.25 for i in range(50)]},
        {"bk": BIGINT, "w": DOUBLE})

    def plan(desc):
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k", "k2", "v"])
                .hash_join(PlanBuilder().values([build]), ["k2"],
                           ["bk"], "inner",
                           output=["k", "v", "w"])
                .order_by([f"v{' DESC' if desc else ''}", "k"]))

    try:
        for desc in (False, True):
            serial = run_plan(plan(desc).build()).to_pydict()
            dist = run_plan_distributed(
                plan(desc).build(), mesh=mesh).to_pydict()
            # ORDER BY contract: exact global order
            assert dist["v"] == serial["v"]
            assert dist["k"] == serial["k"]
            assert dist["w"] == serial["w"]
    finally:
        drop_table("dp_probe")


def test_distributed_order_by_limit_matches_serial(mesh):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(13)
    build = Batch.from_pydict(
        {"bk": list(range(0, 50)), "w": [float(i) for i in range(50)]},
        {"bk": BIGINT, "w": DOUBLE})

    def plan():
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k2", "v"])
                .hash_join(PlanBuilder().values([build]), ["k2"],
                           ["bk"], "inner", output=["k2", "v"])
                .order_by(["v DESC", "k2"])
                .limit(23))

    try:
        serial = run_plan(plan().build()).to_pydict()
        dist = run_plan_distributed(
            plan().build(), mesh=mesh).to_pydict()
        assert dist == serial
    finally:
        drop_table("dp_probe")


def test_distributed_partial_final_agg_matches_serial(mesh):
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(14)
    build = Batch.from_pydict(
        {"bk": list(range(0, 200, 2)),
         "w": [float(i) / 7 for i in range(100)]},
        {"bk": BIGINT, "w": DOUBLE})

    def plan():
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k", "v"])
                .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                           "inner", output=["k", "v", "w"])
                .partial_aggregation(
                    ["k"], ["sum(v) AS s", "count(*) AS c",
                            "max(w) AS hi"])
                .final_aggregation()
                .order_by(["k"]))

    try:
        serial = run_plan(plan().build()).to_pydict()
        dist = run_plan_distributed(
            plan().build(), mesh=mesh).to_pydict()
        assert serial["k"] == dist["k"]
        assert serial["c"] == dist["c"]
        for a, b in zip(serial["s"], dist["s"]):
            assert a == pytest.approx(b, rel=1e-12)
        assert serial["hi"] == dist["hi"]
    finally:
        drop_table("dp_probe")


def test_distributed_window_matches_serial(mesh):
    """Window over PARTITION BY distributes: hash shuffle co-locates
    partitions, the serial window kernel runs per shard
    (parallel/pipeline.py _window_flush)."""
    from velox_tpu.exec import run_plan
    from velox_tpu.io import drop_table
    from velox_tpu.parallel.runner import run_plan_distributed
    from velox_tpu.parallel import pipeline as pl
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    _mk_tables(21)
    build = Batch.from_pydict(
        {"bk": list(range(0, 50)),
         "w": [float(i) * 0.5 for i in range(50)]},
        {"bk": BIGINT, "w": DOUBLE})

    def plan():
        return (PlanBuilder()
                .table_scan("dp_probe", columns=["k", "k2", "v"])
                .hash_join(PlanBuilder().values([build]), ["k2"],
                           ["bk"], "inner",
                           output=["k", "k2", "v", "w"])
                .window(["k2"], ["v", "k"],
                        ["row_number() AS rn", "rank() AS r",
                         "sum(v) AS sv", "lag(v) AS pv"])
                .order_by(["k2", "v", "k"]))

    flushed = []
    orig = pl._window_flush

    def spy(*a, **kw):
        out = orig(*a, **kw)
        flushed.append(out is not None)
        return out

    pl._window_flush = spy
    try:
        serial = run_plan(plan().build()).to_pydict()
        dist = run_plan_distributed(plan().build(),
                                    mesh=mesh).to_pydict()
        assert flushed == [True], "distributed window did not engage"
        assert dist["rn"] == serial["rn"]
        assert dist["r"] == serial["r"]
        for a, b in zip(dist["sv"], serial["sv"]):
            assert a == pytest.approx(b, rel=1e-9)
        assert [(x is None) for x in dist["pv"]] == \
            [(x is None) for x in serial["pv"]]
    finally:
        pl._window_flush = orig
        drop_table("dp_probe")
