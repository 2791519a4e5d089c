"""Count-replay execution (utils/replay.py): repeat runs of a plan elide
mid-run control-value syncs and validate with one deferred fetch.

The velox analog is adaptive output sizing (velox/exec/Operator.cpp
outputBatchRows) — re-designed for a remote accelerator where a blocking
scalar read costs a full RPC round trip.
"""

import numpy as np
import pyarrow as pa
import pytest

from velox_tpu.exec import run_plan, run_plan_pydict
from velox_tpu.io.catalog import drop_table, register_arrow
from velox_tpu.plan import PlanBuilder
from velox_tpu.utils import replay
from velox_tpu.utils.config import config


@pytest.fixture(autouse=True)
def _fresh():
    replay.clear_recordings()
    yield
    replay.clear_recordings()


def _tbl(n=5000, seed=7, name="rp_t"):
    rng = np.random.default_rng(seed)
    register_arrow(name, pa.table({
        "k": rng.integers(0, 50, n),
        "g": np.sort(rng.integers(0, 400, n)),
        "v": rng.integers(-100, 100, n),
    }))


def _plan():
    return (PlanBuilder()
            .table_scan("rp_t", columns=["k", "g", "v"])
            .filter("v > -50")
            .aggregate(["g"], ["sum(v) AS s", "count(v) AS c"])
            .filter("c > 2")
            .top_n(["s DESC"], 17)
            .build())


def test_replay_hit_same_results():
    _tbl()
    plan = _plan()
    first = run_plan(plan).to_pydict()
    s0 = replay.replay_stats()
    second = run_plan(plan).to_pydict()
    s1 = replay.replay_stats()
    assert second == first
    assert s1["replay_runs"] == s0["replay_runs"] + 1
    assert s1["replay_hits"] == s0["replay_hits"] + 1
    assert s1["elided_syncs"] > s0["elided_syncs"]
    drop_table("rp_t")


def test_replay_detects_data_change():
    # same plan SHAPE over re-registered (different) data must not leak
    # stale counts: re-registration bumps the catalog epoch, so the
    # recording is never even consulted
    _tbl(seed=1)
    plan = _plan()
    run_plan(plan)
    run_plan(plan)  # replay warm
    _tbl(seed=2)   # re-register: epoch bump
    plan2 = _plan()
    got = run_plan(plan2).to_pydict()
    # oracle: blocking run with replay disabled
    old = config.replay_counts
    config.replay_counts = False
    try:
        want = run_plan(plan2).to_pydict()
    finally:
        config.replay_counts = old
    assert got == want
    drop_table("rp_t")


def test_replay_divergence_falls_back():
    """Force a stale recording (bypassing the epoch guard) and check the
    validation catches it and the rerun returns correct results."""
    _tbl(seed=3)
    plan = _plan()
    want = run_plan(plan).to_pydict()
    run_plan(plan)
    # corrupt the recording's values: replay must fail validation or
    # diverge, then fall back to a blocking rerun
    assert replay._RECORDINGS, "expected a recording"
    for fp, log in replay._RECORDINGS.items():
        replay._RECORDINGS[fp] = [
            (tag, (val + 1 if isinstance(val, int) else val), dev)
            for tag, val, dev in log]
    s0 = replay.replay_stats()
    got = run_plan(plan).to_pydict()
    s1 = replay.replay_stats()
    assert got == want
    assert s1["replay_misses"] >= s0["replay_misses"]
    drop_table("rp_t")


def test_replay_join_pipeline():
    _tbl(seed=11, name="rp_a")
    _tbl(seed=12, name="rp_b")
    plan = (PlanBuilder()
            .table_scan("rp_a", columns=["k", "v"])
            .hash_join(
                PlanBuilder().table_scan("rp_b", columns=["g", "v"])
                .filter("v > 60").project(["g AS bk"]),
                ["k"], ["bk"], "inner")
            .aggregate(["k"], ["count(v) AS c"])
            .build())
    first = run_plan(plan).to_pydict()
    second = run_plan(plan).to_pydict()
    assert second == first
    drop_table("rp_a")
    drop_table("rp_b")


def test_values_plans_do_not_collide():
    # two same-shaped values plans over different data: identity-based
    # fingerprints must keep their recordings apart
    from velox_tpu.types import BIGINT
    from velox_tpu.vector.batch import Batch

    def values_plan(data):
        b = Batch.from_pydict({"x": data}, {"x": BIGINT})
        return (PlanBuilder().values([b])
                .filter("x > 2").project(["x + 1 AS y"]).build())

    p1 = values_plan([1, 2, 3, 4, 5])
    p2 = values_plan([10, 20])
    assert run_plan_pydict(p1)["y"] == [4, 5, 6]
    assert run_plan_pydict(p2)["y"] == [11, 21]
    # repeat runs of the same objects replay correctly
    assert run_plan_pydict(p1)["y"] == [4, 5, 6]
    assert run_plan_pydict(p2)["y"] == [11, 21]
