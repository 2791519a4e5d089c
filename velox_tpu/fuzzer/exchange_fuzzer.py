"""Exchange fuzzer (velox/exec/fuzzer/ExchangeFuzzer.cpp analog).

Random batches serialize into pages and stream through the exchange
under randomized conditions — page sizes, fetch windows (max_bytes),
ack cadences, duplicate fetches (lost-response retries), buffer limits
that force producer backpressure, serialization codecs, and local vs
TCP transport — and the reassembled stream must be exactly the input.
"""

from __future__ import annotations

import threading
from typing import List

import numpy as np

from velox_tpu.exec.exchange_net import (
    ExchangeServer, LocalExchangeSource, RemoteExchangeSource,
    StreamingBufferManager,
)
from velox_tpu.serial import deserialize_page, serialize_page
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.vector.batch import Batch

_WORDS = ["ash", "birch", "cedar", "dune", "elm"]


def _batch(rng, rows):
    return Batch.from_pydict(
        {"k": [None if rng.random() < 0.1 else int(x)
               for x in rng.integers(0, 50, rows)],
         "v": [float(np.round(x, 6)) for x in rng.normal(size=rows)],
         "s": [str(rng.choice(_WORDS)) for _ in range(rows)]},
        {"k": BIGINT, "v": DOUBLE, "s": VARCHAR})


def run_exchange_fuzz(iterations: int = 30, seed: int = 0,
                      verbose: bool = False) -> None:
    rng = np.random.default_rng(seed)
    server = None
    for i in range(iterations):
        n_pages = int(rng.integers(1, 25))
        rows = int(rng.integers(1, 200))
        compress = rng.choice([False, True, "zstd"])
        compress = (False if compress == "False"
                    else True if compress == "True" else compress)
        batches = [_batch(rng, rows) for _ in range(n_pages)]
        pages = [serialize_page(b, compress=bool(compress)
                                if not isinstance(compress, str)
                                else compress) for b in batches]
        max_buf = int(rng.integers(
            max(len(p) for p in pages) + 1,
            sum(len(p) for p in pages) + 2))
        mgr = StreamingBufferManager(max_buffered_bytes=max_buf)
        remote = bool(rng.random() < 0.4)
        frag = f"fz{i}"

        def produce():
            for p in pages:
                mgr.enqueue(frag, 0, p)
            mgr.no_more_data(frag, [0])

        t = threading.Thread(target=produce)
        t.start()
        if remote:
            server = ExchangeServer(mgr, port=0)
            src = RemoteExchangeSource("127.0.0.1", server.port, frag, 0)
        else:
            src = LocalExchangeSource(mgr, frag, 0)

        got: List[bytes] = []
        seq = 0
        while True:
            window = int(rng.integers(64, 4 * max(len(p)
                                                  for p in pages)))
            ps, nxt, at_end = src.fetch(seq, window)
            if rng.random() < 0.2 and ps:
                # lost response: re-fetch the same sequence
                ps2, nxt2, at_end2 = src.fetch(seq, window)
                assert ps2 == ps and nxt2 == nxt, (
                    f"iter {i}: retry returned different pages")
            got.extend(ps)
            if nxt > seq:
                if rng.random() < 0.8:  # occasional delayed ack
                    src.ack(nxt)
                    seq = nxt
                else:
                    got = got[: len(got) - len(ps)]  # will re-fetch
            if at_end and not ps:
                break
        t.join(timeout=20)
        assert not t.is_alive(), f"iter {i}: producer stuck"
        src.close()
        if remote and server is not None:
            server.close()
            server = None

        assert len(got) == n_pages, (i, len(got), n_pages)
        for page, b in zip(got, batches):
            rb = deserialize_page(page)
            assert rb.to_pydict() == b.to_pydict(), f"iter {i}: payload"
        if verbose:
            print(f"iter {i}: pages={n_pages} rows={rows} "
                  f"remote={remote} buf={max_buf} ok")
