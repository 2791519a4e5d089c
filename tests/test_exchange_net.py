"""Streaming exchange: backpressure, ack windows, socket transport
(velox/exec/OutputBufferManager.h + ExchangeSource.h contract tests;
MultiFragmentTest with a real second process)."""

import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from velox_tpu.exec.exchange_net import (
    ExchangeServer, LocalExchangeSource, RemoteExchangeSource,
    StreamingBufferManager, consume_source,
)
from velox_tpu.serial import serialize_page
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch


def _page(i, rows=64):
    rng = np.random.default_rng(i)
    b = Batch.from_pydict(
        {"k": [int(x) for x in rng.integers(0, 100, rows)],
         "v": [float(x) for x in rng.normal(size=rows)]},
        {"k": BIGINT, "v": DOUBLE})
    return serialize_page(b), b


def test_streaming_backpressure_and_order():
    pages = [_page(i) for i in range(30)]
    one = len(pages[0][0])
    # room for ~3 pages: the producer MUST block until acks release
    mgr = StreamingBufferManager(max_buffered_bytes=3 * one + 10)

    def produce():
        for p, _ in pages:
            mgr.enqueue("f", 0, p)
        mgr.no_more_data("f", [0])

    t = threading.Thread(target=produce)
    t.start()
    time.sleep(0.2)
    # producer cannot have buffered everything
    assert mgr.buffered_bytes("f", 0) <= 3 * one + 10

    got = list(consume_source(LocalExchangeSource(mgr, "f", 0),
                              max_bytes=one))
    t.join(timeout=10)
    assert not t.is_alive()
    assert mgr.blocked_count > 0, "backpressure never engaged"
    assert len(got) == len(pages)
    for g, (_, b) in zip(got, pages):
        assert g.to_pydict() == b.to_pydict()


def test_unacked_pages_can_be_refetched():
    p0, b0 = _page(0)
    p1, b1 = _page(1)
    mgr = StreamingBufferManager()
    mgr.enqueue("f", 0, p0)
    mgr.enqueue("f", 0, p1)
    mgr.no_more_data("f", [0])
    pages, nxt, end = mgr.get_data("f", 0, 0, max_bytes=1 << 30)
    assert len(pages) == 2 and end
    # lost response: re-fetch the same sequence succeeds until acked
    pages2, _, _ = mgr.get_data("f", 0, 0, max_bytes=1 << 30)
    assert pages2 == pages
    mgr.ack("f", 0, 2)
    with pytest.raises(AssertionError):
        mgr.get_data("f", 0, 0)


_PRODUCER = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from velox_tpu.exec.exchange_net import (
    ExchangeServer, StreamingBufferManager)
from velox_tpu.serial import serialize_page
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch

mgr = StreamingBufferManager(max_buffered_bytes=1 << 16)
srv = ExchangeServer(mgr, port=0)
print(srv.port, flush=True)

def page(i):
    rng = np.random.default_rng(i)
    return serialize_page(Batch.from_pydict(
        {{"k": [int(x) for x in rng.integers(0, 100, 64)],
          "v": [float(x) for x in rng.normal(size=64)]}},
        {{"k": BIGINT, "v": DOUBLE}}))

for part in range(2):
    for i in range(12):
        mgr.enqueue("stage1", part, page(part * 100 + i))
    mgr.no_more_data("stage1", [part])
# serve until the consumer is done (parent kills us)
time.sleep(60)
"""


def test_two_process_socket_exchange():
    proc = subprocess.Popen(
        [sys.executable, "-c",
         _PRODUCER.format(repo="/root/repo")],
        stdout=subprocess.PIPE, text=True)
    try:
        port = int(proc.stdout.readline().strip())
        total = 0
        for part in range(2):
            src = RemoteExchangeSource("127.0.0.1", port, "stage1", part)
            got = list(consume_source(src, max_bytes=2048))
            src.close()
            assert len(got) == 12
            assert src.roundtrips > 3, "no fetch windowing happened"
            total += sum(b.num_rows or b.selected_count() for b in got)
            # byte-exact vs locally generated pages
            rng = np.random.default_rng(part * 100)
            assert got[0].to_pydict()["k"] == [
                int(x) for x in rng.integers(0, 100, 64)]
        assert total == 2 * 12 * 64
    finally:
        proc.kill()
        proc.wait()


def test_streaming_fragments_overlap():
    """Producer and consumer fragments run CONCURRENTLY with a bounded
    buffer (producers-finish-first would deadlock at this buffer size)."""
    from velox_tpu.exec.fragments import (
        Fragment, partitioned_output, run_fragments_streaming)
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.plan.nodes import ExchangeNode, new_id
    from velox_tpu.plan.builder import PlanBuilder as PB

    rng = np.random.default_rng(5)
    n = 4000
    batches = [
        Batch.from_pydict(
            {"k": [int(x) for x in rng.integers(0, 50, 500)],
             "v": [float(x) for x in rng.normal(size=500)]},
            {"k": BIGINT, "v": DOUBLE})
        for _ in range(n // 500)]
    prod = partitioned_output(
        PlanBuilder().values(batches), ["k"], num_partitions=1)
    schema = prod.node.output_type
    ex = ExchangeNode(new_id(), schema, None)
    cons = (PlanBuilder(ex)
            .aggregate(["k"], ["sum(v) AS s", "count(*) AS c"])
            .order_by(["k"]))
    out = run_fragments_streaming(
        [Fragment("p", prod.build()),
         Fragment("c", cons.build(),
                  exchange_sources={ex.id: "p"})],
        max_buffered_bytes=1 << 14)  # tiny: forces overlap
    got = out.to_pydict()
    import pandas as pd

    df = pd.concat([pd.DataFrame(b.to_pydict()) for b in batches])
    exp = df.groupby("k")["v"].agg(["sum", "size"]).reset_index()
    assert got["k"] == exp["k"].tolist()
    for a, b in zip(got["s"], exp["sum"]):
        assert a == pytest.approx(b, rel=1e-9)
    assert got["c"] == exp["size"].tolist()
