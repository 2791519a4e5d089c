"""Hierarchical memory pools + cross-query arbitration
(velox/common/memory/Memory.h MemoryPool tree and
SharedArbitrator.cpp victim policy analogs — exec/memory.py)."""

import numpy as np
import pytest

from velox_tpu.exec import memory as mem
from velox_tpu.exec.spill import SpillableBuffer
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.types import BIGINT
from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch


def _batch(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return Batch.from_pydict(
        {"g": [int(x) for x in rng.integers(0, 50, n)],
         "v": [int(x) for x in rng.integers(0, 1000, n)]},
        {"g": BIGINT, "v": BIGINT})


@pytest.fixture(autouse=True)
def _clean_root():
    yield
    # tests create query pools directly; drop leftovers
    for name in list(mem.root_pool.children):
        mem.root_pool.children.pop(name, None)
    config.spill_memory_budget_bytes = None
    config.query_memory_cap_bytes = None


def test_usage_bubbles_to_root():
    q = mem.MemoryPool("q1", mem.root_pool, kind="query")
    with mem.scoped_pool(q):
        buf = SpillableBuffer("op1")
    b = _batch()
    buf.append(b)
    used = buf.device_bytes()
    assert used > 0
    assert q.used() == used
    assert mem.root_pool.used() >= used
    assert q.children["op1"].used() == used
    buf.close()
    assert q.used() == 0
    assert "op1" not in q.children


def test_tree_usage_rendering():
    q = mem.MemoryPool("q2", mem.root_pool, kind="query")
    with mem.scoped_pool(q):
        buf = SpillableBuffer("orderby")
    buf.append(_batch())
    txt = mem.root_pool.tree_usage()
    assert "root [root]" in txt
    assert "q2 [query]" in txt
    assert "orderby [operator]" in txt
    assert "used=" in txt and "peak=" in txt
    buf.close()


def test_per_query_cap_spills_own_buffers():
    config.query_memory_cap_bytes = 1  # everything spills
    q = mem.MemoryPool("q3", mem.root_pool, kind="query")
    with mem.scoped_pool(q):
        buf = SpillableBuffer("agg")
    buf.append(_batch())
    assert buf.device_bytes() == 0      # spilled to host
    assert buf.has_spilled()
    assert q.used() == 0
    assert len(buf) == 1                # data intact on host
    out = buf.drain()
    assert out[0].num_rows == 1000


def test_cross_query_arbitration_picks_fattest_other_query():
    # root capacity fits one buffer; the SECOND query's reserve must
    # reclaim from the FIRST (the fattest OTHER query), not itself
    b1, b2 = _batch(4000, 1), _batch(100, 2)
    q1 = mem.MemoryPool("qa", mem.root_pool, kind="query")
    q2 = mem.MemoryPool("qb", mem.root_pool, kind="query")
    with mem.scoped_pool(q1):
        big = SpillableBuffer("big")
    big.append(b1)
    fat = big.device_bytes()
    config.spill_memory_budget_bytes = fat + 100
    with mem.scoped_pool(q2):
        small = SpillableBuffer("small")
    small.append(b2)
    # q1's buffer was the victim; q2's stayed on device
    assert big.device_bytes() == 0 and big.has_spilled()
    assert small.device_bytes() > 0 and not small.has_spilled()
    big.close()
    small.close()


def test_peak_tracks_high_water():
    q = mem.MemoryPool("q4", mem.root_pool, kind="query")
    with mem.scoped_pool(q):
        buf = SpillableBuffer("win")
    buf.append(_batch())
    high = q.used()
    buf.spill_all()
    assert q.used() == 0
    assert q.peak >= high
    buf.close()


def test_manual_reservations():
    q = mem.MemoryPool("q5", mem.root_pool, kind="query")
    op = mem.MemoryPool("exchange", q)
    op.reserve(1 << 20)
    assert q.used() == 1 << 20
    op.release(1 << 20)
    assert q.used() == 0


def test_query_execution_creates_and_closes_pool():
    before = set(mem.root_pool.children)
    out = run_plan_pydict(
        PlanBuilder().values([_batch()])
        .aggregate(["g"], ["sum(v) as s"]).order_by(["g"]).build())
    assert len(out["g"]) == 50
    # the task's query pool is gone after the run
    assert set(mem.root_pool.children) == before


def test_query_under_cap_still_correct():
    # force aggressive spilling through a real query: results identical
    config.query_memory_cap_bytes = 1
    b = _batch(5000, 3)
    got = run_plan_pydict(
        PlanBuilder().values([b])
        .order_by(["v", "g"]).limit(10).build())
    config.query_memory_cap_bytes = None
    want = run_plan_pydict(
        PlanBuilder().values([b])
        .order_by(["v", "g"]).limit(10).build())
    assert got == want


def test_concurrent_queries_under_arbitration():
    """Two queries racing on separate host threads under one shared
    root budget (velox/exec/fuzzer/MemoryArbitrationFuzzer.cpp at mini
    scale): arbitration may spill either side at any point, but both
    queries' results must match their serial runs, neither thread may
    deadlock, and root accounting must settle to zero."""
    import threading

    b1, b2 = _batch(20000, 7), _batch(20000, 8)

    def q(b):
        return (PlanBuilder().values([b])
                .aggregate(["g"], ["sum(v) as s"])
                .order_by(["g"]))

    want1 = run_plan_pydict(q(b1).build())
    want2 = run_plan_pydict(q(b2).build())

    config.spill_memory_budget_bytes = 200_000
    results = {}
    errors = []

    def run(idx, b):
        try:
            for _ in range(5):
                results[idx] = run_plan_pydict(q(b).build())
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errors.append((idx, e))

    t1 = threading.Thread(target=run, args=(1, b1))
    t2 = threading.Thread(target=run, args=(2, b2))
    t1.start()
    t2.start()
    t1.join(timeout=180)
    t2.join(timeout=180)
    alive = t1.is_alive() or t2.is_alive()
    config.spill_memory_budget_bytes = None
    assert not alive, "arbitration deadlock"
    assert not errors, errors
    assert results[1] == want1
    assert results[2] == want2
    assert mem.root_pool.used() == 0
