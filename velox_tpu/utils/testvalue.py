"""Deterministic fault/behavior injection for tests.

The TestValue mechanism (velox/common/testutil/TestValue.h:33): code
under test calls ``TestValue.adjust(point, payload)`` at named injection
points; tests register callbacks (scoped) that observe state, mutate
payloads, or raise — making spill, exchange, abandon, and scan failure
paths deterministically testable. Production cost is one dict lookup on
an (usually empty) registry; ``enable()`` gates even that off by
default, exactly like NDEBUG-compiled-out TestValue.

Injection points wired so far (grep TestValue.adjust):
  velox_tpu.spill.spill_all         — before buffers move to host
  velox_tpu.spill.partitions        — before partitioned restore
  velox_tpu.agg.abandon_check       — partial-agg abandon decision
  velox_tpu.exchange.enqueue        — producer side of the exchange
  velox_tpu.exchange.get_data       — consumer fetch
  velox_tpu.scan.read_split         — file/table split read (FaultyFS
                                      analog, velox FaultyFileSystem)
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Callable, Dict, Optional


class TestValue:
    _enabled = False
    _callbacks: Dict[str, Callable] = {}
    _lock = threading.Lock()

    @classmethod
    def enable(cls) -> None:
        cls._enabled = True

    @classmethod
    def disable(cls) -> None:
        cls._enabled = False
        with cls._lock:
            cls._callbacks.clear()

    @classmethod
    def set(cls, point: str, fn: Callable) -> None:
        with cls._lock:
            cls._callbacks[point] = fn
        cls._enabled = True

    @classmethod
    def clear(cls, point: str) -> None:
        with cls._lock:
            cls._callbacks.pop(point, None)

    @classmethod
    def adjust(cls, point: str, payload=None):
        """Called from production code at injection points. Returns the
        callback's result (tests may substitute payloads) or None."""
        if not cls._enabled:
            return None
        fn = cls._callbacks.get(point)
        if fn is None:
            return None
        return fn(payload)

    @classmethod
    @contextmanager
    def scoped(cls, point: str, fn: Callable):
        cls.set(point, fn)
        try:
            yield
        finally:
            cls.clear(point)
