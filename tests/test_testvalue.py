"""Fault injection via TestValue (velox/common/testutil/TestValue.h:33
+ FaultyFileSystem analog): spill, exchange, and scan paths behave
correctly under injected failures."""

import numpy as np
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.utils.config import config
from velox_tpu.utils.testvalue import TestValue
from velox_tpu.vector.batch import Batch


def teardown_function(_fn):
    TestValue.disable()


def _plan(n=500):
    rng = np.random.default_rng(1)
    b = Batch.from_pydict(
        {"g": [int(x) for x in rng.integers(0, 40, n)],
         "v": [float(x) for x in rng.normal(size=n)]},
        {"g": BIGINT, "v": DOUBLE})
    return (PlanBuilder().values([b])
            .aggregate(["g"], ["sum(v) AS s"]).order_by(["g"]))


def test_spill_point_fires_and_can_fail():
    hits = []
    old = config.spill_memory_budget_bytes
    config.spill_memory_budget_bytes = 1 << 10
    try:
        with TestValue.scoped("velox_tpu.spill.spill_all",
                              lambda buf: hits.append(buf.label)):
            run_plan_pydict(_plan().build())
        assert hits, "spill injection point never fired"

        class Boom(RuntimeError):
            pass

        def fail(_):
            raise Boom("injected spill failure")

        with TestValue.scoped("velox_tpu.spill.spill_all", fail):
            with pytest.raises(Boom):
                run_plan_pydict(_plan().build())
        # after the injected failure, the engine still works
        out = run_plan_pydict(_plan().build())
        assert len(out["g"]) == 40
    finally:
        config.spill_memory_budget_bytes = old


def test_scan_read_failure_surfaces_and_recovers(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from velox_tpu.io import drop_table
    from velox_tpu.io.catalog import register_parquet

    path = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": list(range(100))}), path)
    register_parquet("faulty_t", str(path), batch_rows=32)

    class IOBoom(IOError):
        pass

    calls = {"n": 0}

    def flaky(_tbl):
        calls["n"] += 1
        if calls["n"] == 1:
            raise IOBoom("injected read failure")

    try:
        with TestValue.scoped("velox_tpu.scan.read_split", flaky):
            with pytest.raises(IOBoom):
                run_plan_pydict(
                    PlanBuilder().table_scan("faulty_t", columns=["x"])
                    .aggregate([], ["sum(x) AS s"]).build())
            # retry succeeds (fault cleared after first call)
            out = run_plan_pydict(
                PlanBuilder().table_scan("faulty_t", columns=["x"])
                .aggregate([], ["sum(x) AS s"]).build())
            assert out["s"] == [sum(range(100))]
    finally:
        drop_table("faulty_t")


def test_exchange_faults():
    from velox_tpu.exec.exchange_net import (
        LocalExchangeSource, StreamingBufferManager, consume_source)
    from velox_tpu.serial import serialize_page

    b = Batch.from_pydict({"x": [1, 2, 3]}, {"x": BIGINT})
    mgr = StreamingBufferManager()

    seen = []
    with TestValue.scoped("velox_tpu.exchange.enqueue",
                          lambda t: seen.append(t[:2])):
        mgr.enqueue("f", 0, serialize_page(b))
        mgr.no_more_data("f", [0])
    assert seen == [("f", 0)]

    class NetBoom(ConnectionError):
        pass

    def drop_first(t):
        if t[2] == 0 and not getattr(drop_first, "hit", False):
            drop_first.hit = True
            raise NetBoom("injected fetch failure")

    with TestValue.scoped("velox_tpu.exchange.get_data", drop_first):
        src = LocalExchangeSource(mgr, "f", 0)
        with pytest.raises(NetBoom):
            list(consume_source(src))
        # retry from the same sequence: pages were retained (un-acked)
        got = list(consume_source(src))
        assert len(got) == 1
        assert got[0].to_pydict()["x"] == [1, 2, 3]
