"""Streaming exchange: bounded buffers, ack windows, socket transport.

The cross-host (DCN) data plane done as a real protocol, replacing the
batch-mode "producers finish before consumers" OutputBufferManager in
exec/fragments.py:

* :class:`StreamingBufferManager` — velox/exec/OutputBufferManager.h:41
  semantics: ``enqueue`` BLOCKS while a destination's unacked bytes
  exceed the buffer limit (producer backpressure), ``get_data(seq)``
  returns pages from ``seq`` on (pages are RETAINED until acked — the
  retry contract), ``ack(seq)`` releases, ``no_more_data`` finishes.
* :class:`ExchangeServer` / :class:`RemoteExchangeSource` — the
  ExchangeSource contract (velox/exec/ExchangeSource.h:23-42,
  PrestoExchangeSource analog) over a TCP socket with a length-prefixed
  JSON+bytes framing; SerializedPage (serial/page.py) is the wire
  format.

Inside a TPU slice the exchange is one all_to_all (parallel/shuffle.py);
this module is the path BETWEEN slices/hosts.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


class _PartitionBuffer:
    """Pages of one destination, retained until acked."""

    __slots__ = ("pages", "base_seq", "next_seq", "finished", "bytes")

    def __init__(self):
        self.pages: List[bytes] = []
        self.base_seq = 0          # seq of pages[0]
        self.next_seq = 0          # seq the next enqueue gets
        self.finished = False
        self.bytes = 0


class StreamingBufferManager:
    """Bounded, acked, blocking output buffers."""

    def __init__(self, max_buffered_bytes: int = 8 << 20):
        self.max_bytes = max_buffered_bytes
        self._parts: Dict[tuple, _PartitionBuffer] = defaultdict(
            _PartitionBuffer)
        self._cv = threading.Condition()
        #: observability: number of times a producer had to wait
        self.blocked_count = 0

    def _buf(self, frag: str, part: int) -> _PartitionBuffer:
        return self._parts[(frag, part)]

    def enqueue(self, frag: str, part: int, page: bytes) -> None:
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.exchange.enqueue",
                         (frag, part, page))
        with self._cv:
            buf = self._buf(frag, part)
            if buf.bytes + len(page) > self.max_bytes and buf.pages:
                self.blocked_count += 1
                while buf.bytes + len(page) > self.max_bytes \
                        and buf.pages:
                    self._cv.wait(timeout=30)
            buf.pages.append(page)
            buf.bytes += len(page)
            buf.next_seq += 1
            self._cv.notify_all()

    def no_more_data(self, frag: str, parts: Optional[List[int]] = None
                     ) -> None:
        with self._cv:
            if parts is None:
                parts = [p for (f, p) in self._parts if f == frag]
            for p in parts:
                self._buf(frag, p).finished = True
            self._cv.notify_all()

    def get_data(self, frag: str, part: int, seq: int,
                 max_bytes: int = 1 << 20, timeout: float = 30.0
                 ) -> Tuple[List[bytes], int, bool]:
        """Pages from ``seq`` (blocking until data or finish): returns
        (pages, next_seq, at_end). Pages stay buffered until acked, so a
        consumer may re-fetch from any unacked sequence (the lost-
        response retry path of the contract)."""
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.exchange.get_data",
                         (frag, part, seq))
        with self._cv:
            buf = self._buf(frag, part)
            while (seq >= buf.next_seq and not buf.finished):
                if not self._cv.wait(timeout=timeout):
                    raise TimeoutError(
                        f"exchange {frag}:{part} seq {seq} timed out")
            assert seq >= buf.base_seq, (
                f"sequence {seq} already acked (base {buf.base_seq})")
            out: List[bytes] = []
            total = 0
            s = seq
            while s < buf.next_seq:
                page = buf.pages[s - buf.base_seq]
                if out and total + len(page) > max_bytes:
                    break
                out.append(page)
                total += len(page)
                s += 1
            at_end = buf.finished and s >= buf.next_seq
            return out, s, at_end

    def ack(self, frag: str, part: int, seq: int) -> None:
        """Release pages with sequence < seq."""
        with self._cv:
            buf = self._buf(frag, part)
            while buf.base_seq < seq and buf.pages:
                buf.bytes -= len(buf.pages[0])
                buf.pages.pop(0)
                buf.base_seq += 1
            self._cv.notify_all()

    def buffered_bytes(self, frag: str, part: int) -> int:
        with self._cv:
            return self._buf(frag, part).bytes


# ------------------------------------------------------------- transport

def _recv_exact(sock: socket.socket, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("exchange peer closed")
        out += chunk
    return out


def _send_msg(sock: socket.socket, header: dict,
              payloads: List[bytes] = ()) -> None:
    h = json.dumps(header).encode()
    sock.sendall(struct.pack("<I", len(h)) + h)
    for p in payloads:
        sock.sendall(p)


def _recv_msg(sock: socket.socket) -> dict:
    (n,) = struct.unpack("<I", _recv_exact(sock, 4))
    return json.loads(_recv_exact(sock, n))


class ExchangeServer:
    """Serves a StreamingBufferManager's pages over TCP.

    Protocol: request {op: get|ack, frag, part, seq, max_bytes};
    get response {sizes: [...], next_seq, at_end} + page bytes."""

    def __init__(self, manager: StreamingBufferManager, port: int = 0):
        mgr = manager

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    while True:
                        req = _recv_msg(self.request)
                        if req["op"] == "get":
                            pages, nxt, end = mgr.get_data(
                                req["frag"], req["part"], req["seq"],
                                req.get("max_bytes", 1 << 20))
                            _send_msg(self.request, {
                                "sizes": [len(p) for p in pages],
                                "next_seq": nxt, "at_end": end}, pages)
                        elif req["op"] == "ack":
                            mgr.ack(req["frag"], req["part"], req["seq"])
                            _send_msg(self.request, {"ok": True})
                        else:
                            break
                except (ConnectionError, OSError):
                    pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class ExchangeSourceBase:
    """velox/exec/ExchangeSource.h contract: fetch/ack/close."""

    def fetch(self, seq: int, max_bytes: int = 1 << 20
              ) -> Tuple[List[bytes], int, bool]:
        raise NotImplementedError

    def ack(self, seq: int) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class LocalExchangeSource(ExchangeSourceBase):
    def __init__(self, manager: StreamingBufferManager, frag: str,
                 part: int):
        self.m, self.frag, self.part = manager, frag, part

    def fetch(self, seq, max_bytes=1 << 20):
        return self.m.get_data(self.frag, self.part, seq, max_bytes)

    def ack(self, seq):
        self.m.ack(self.frag, self.part, seq)


class RemoteExchangeSource(ExchangeSourceBase):
    """Socket client pulling SerializedPages with an ack window."""

    def __init__(self, host: str, port: int, frag: str, part: int):
        self.sock = socket.create_connection((host, port), timeout=60)
        self.frag, self.part = frag, part
        self.roundtrips = 0

    def fetch(self, seq, max_bytes=1 << 20):
        _send_msg(self.sock, {"op": "get", "frag": self.frag,
                              "part": self.part, "seq": seq,
                              "max_bytes": max_bytes})
        resp = _recv_msg(self.sock)
        pages = [_recv_exact(self.sock, n) for n in resp["sizes"]]
        self.roundtrips += 1
        return pages, resp["next_seq"], resp["at_end"]

    def ack(self, seq):
        _send_msg(self.sock, {"op": "ack", "frag": self.frag,
                              "part": self.part, "seq": seq})
        _recv_msg(self.sock)

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


def consume_source(source: ExchangeSourceBase,
                   max_bytes: int = 1 << 20):
    """Generator of deserialized Batches from an exchange source with
    fetch -> process -> ack windowing (velox Exchange.cpp request loop)."""
    from velox_tpu.serial import deserialize_page

    seq = 0
    while True:
        pages, nxt, at_end = source.fetch(seq, max_bytes)
        for p in pages:
            yield deserialize_page(p)
        if nxt > seq:
            source.ack(nxt)
            seq = nxt
        if at_end and not pages:
            break
