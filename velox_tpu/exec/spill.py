"""Memory management + spill-to-host.

The TPU re-design of velox's memory arbitration + Spiller stack
(velox/common/memory/MemoryArbitrator.h:71, velox/exec/Spiller.h): HBM is
the scarce pool; "spilling" is staging buffered device batches into host
RAM (device->host DMA), restored at finish. A process-wide MemoryManager
tracks the estimated device bytes held by registered spillable buffers
and reclaims from the largest holder when a reservation would exceed the
budget — the SharedArbitrator victim policy
(velox/common/memory/SharedArbitrator.h:53) in one page.

Host RAM >> HBM, so one spill level suffices (velox needs recursive
file spills, exec/Spill.h:280 kMaxSpillLevel — host RAM plays the role
of its spill files; a second tier to disk can layer on later).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from velox_tpu.utils.config import config
from velox_tpu.utils.metrics import reporter
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import Column

METRIC_SPILLED_BYTES = "velox_tpu.spilled_bytes"
METRIC_SPILL_EVENTS = "velox_tpu.spill_events"


def batch_device_bytes(b: Batch) -> int:
    total = b.sel.size  # bool
    for c in b.columns.values():
        total += c.values.size * c.values.dtype.itemsize
        if c.valid is not None:
            total += c.valid.size
    return total


class _HostBatch:
    """Host-RAM copy of a Batch (the SpillFile analog)."""

    __slots__ = ("cols", "sel", "num_rows", "nbytes")

    def __init__(self, b: Batch):
        self.cols = {
            n: (c.dtype, np.asarray(c.values),
                None if c.valid is None else np.asarray(c.valid),
                c.dictionary, c.stats)
            for n, c in b.columns.items()}
        self.sel = np.asarray(b.sel)
        self.num_rows = b.num_rows
        self.nbytes = batch_device_bytes(b)

    def restore(self) -> Batch:
        cols = {
            n: Column(dt, jnp.asarray(v),
                      None if va is None else jnp.asarray(va), d, st)
            for n, (dt, v, va, d, st) in self.cols.items()}
        return Batch(cols, jnp.asarray(self.sel), self.num_rows)


class MemoryManager:
    """Tracks device bytes of registered buffers; arbitrates reclaim."""

    def __init__(self, budget_bytes: Optional[int] = None):
        self.budget = budget_bytes
        self._buffers: List["SpillableBuffer"] = []
        self._lock = threading.Lock()

    def register(self, buf: "SpillableBuffer") -> None:
        with self._lock:
            self._buffers.append(buf)

    def unregister(self, buf: "SpillableBuffer") -> None:
        with self._lock:
            if buf in self._buffers:
                self._buffers.remove(buf)

    def total_bytes(self) -> int:
        return sum(b.device_bytes() for b in self._buffers)

    def maybe_reclaim(self) -> None:
        budget = self.budget or config.spill_memory_budget_bytes
        if budget is None:
            return
        while self.total_bytes() > budget:
            victim = max(
                self._buffers, key=lambda b: b.device_bytes(),
                default=None)
            if victim is None or victim.device_bytes() == 0:
                return
            victim.spill_all()


#: process-wide manager (velox MemoryManager::getInstance analog)
memory_manager = MemoryManager()


class SpillableBuffer:
    """A list of buffered batches that can move to host under pressure.

    Used by every blocking operator that accumulates input (OrderBy,
    HashBuild, Window, generic aggregation entries).
    """

    def __init__(self, label: str = "",
                 mm: Optional[MemoryManager] = None):
        self.label = label
        self.mm = mm or memory_manager
        self._device: List[Batch] = []
        self._host: List[_HostBatch] = []
        self.spilled_bytes = 0
        self.mm.register(self)

    def append(self, b: Batch) -> None:
        self._device.append(b)
        self.mm.maybe_reclaim()

    def device_bytes(self) -> int:
        return sum(batch_device_bytes(b) for b in self._device)

    def spill_all(self) -> None:
        """Move all device batches to host RAM (one D2H per buffer)."""
        for b in self._device:
            hb = _HostBatch(b)
            self._host.append(hb)
            self.spilled_bytes += hb.nbytes
            reporter.add_counter(METRIC_SPILLED_BYTES, hb.nbytes)
        if self._device:
            reporter.add_counter(METRIC_SPILL_EVENTS)
        self._device = []

    def __len__(self) -> int:
        return len(self._device) + len(self._host)

    def drain(self) -> List[Batch]:
        """All buffered batches, restoring spilled ones to device."""
        out = [hb.restore() for hb in self._host] + list(self._device)
        self._host = []
        self._device = []
        self.mm.unregister(self)
        return out

    def close(self) -> None:
        self._device = []
        self._host = []
        self.mm.unregister(self)
