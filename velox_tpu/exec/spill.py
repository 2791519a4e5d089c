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
METRIC_SPILL_FILE_BYTES = "velox_tpu.spill_file_bytes"


def batch_device_bytes(b: Batch) -> int:
    total = b.sel.size  # bool
    for c in b.columns.values():
        total += c.values.size * c.values.dtype.itemsize
        if c.valid is not None:
            total += c.valid.size
    return total


class _FileBatch:
    """Disk tier: a Batch as a SerializedPage file
    (velox/exec/SpillFile.h + serializer/.../SerializedPage): the third
    rung of the spill ladder HBM -> host RAM -> disk."""

    __slots__ = ("path", "nbytes")

    def __init__(self, batch: Batch, spill_dir: Optional[str] = None):
        import os
        import tempfile

        from velox_tpu.serial import serialize_page

        page = serialize_page(batch, compress="zstd")
        fd, self.path = tempfile.mkstemp(
            suffix=".spill", dir=spill_dir)
        with os.fdopen(fd, "wb") as f:
            f.write(page)
        self.nbytes = len(page)
        reporter.add_counter(METRIC_SPILL_FILE_BYTES, self.nbytes)

    def restore(self) -> Batch:
        from velox_tpu.serial import deserialize_page

        with open(self.path, "rb") as f:
            b = deserialize_page(f.read())
        self.close()
        return b

    def close(self) -> None:
        import os

        try:
            os.unlink(self.path)
        except OSError:
            pass


class _PendingFileBatch:
    """A spill file still being written by the async executor:
    restore()/close() join the write first (futures resolve to the
    real _FileBatch). The _FileBatch duck type, one indirection."""

    __slots__ = ("_future",)

    def __init__(self, future):
        self._future = future

    @property
    def nbytes(self) -> int:
        return self._future.result().nbytes

    def restore(self) -> Batch:
        return self._future.result().restore()

    def close(self) -> None:
        self._future.result().close()


_SPILL_POOL = None


def _spill_executor():
    """Lazy process-wide spill I/O pool (velox spill executor analog;
    config.spill_io_threads = 0 disables -> synchronous writes)."""
    global _SPILL_POOL
    n = getattr(config, "spill_io_threads", 0)
    if not n:
        return None
    if _SPILL_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _SPILL_POOL = ThreadPoolExecutor(
            max_workers=n, thread_name_prefix="velox-spill-io")
    return _SPILL_POOL


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

    def to_file(self, spill_dir=None) -> _FileBatch:
        # round-trip through a live batch on host numpy (no device)
        cols = {
            n: Column(dt, jnp.asarray(v),
                      None if va is None else jnp.asarray(va), d, st)
            for n, (dt, v, va, d, st) in self.cols.items()}
        return _FileBatch(
            Batch(cols, jnp.asarray(self.sel), self.num_rows),
            spill_dir)


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
        if budget is not None:
            while self.total_bytes() > budget:
                victim = max(
                    self._buffers, key=lambda b: b.device_bytes(),
                    default=None)
                if victim is None or victim.device_bytes() == 0:
                    break
                victim.spill_all()
        hbudget = config.spill_host_budget_bytes
        if hbudget is None:
            return
        def hb(b):
            return b.host_bytes() if hasattr(b, "host_bytes") else 0
        while sum(hb(b) for b in self._buffers) > hbudget:
            victim = max(self._buffers, key=hb, default=None)
            if victim is None or hb(victim) == 0:
                return
            victim.spill_to_disk()


#: process-wide manager (velox MemoryManager::getInstance analog)
memory_manager = MemoryManager()


class SpillableBuffer:
    """A list of buffered batches that can move to host under pressure.

    Used by every blocking operator that accumulates input (OrderBy,
    HashBuild, Window, generic aggregation entries).
    """

    def __init__(self, label: str = "",
                 mm: Optional[MemoryManager] = None,
                 pool=None):
        from velox_tpu.exec import memory as _mem

        self.label = label
        self.mm = mm or memory_manager
        self._device: List[Batch] = []
        self._host: List[_HostBatch] = []
        self._files: List[_FileBatch] = []
        self.spilled_bytes = 0
        self.mm.register(self)
        # attach to the ambient query pool as an operator leaf
        # (exec/memory.py hierarchy; velox operator pool analog)
        parent = pool or _mem.current_pool()
        self.pool = (_mem.MemoryPool(label or "buffer", parent)
                     if parent is not None else None)
        if self.pool is not None:
            self.pool.attach_buffer(self)

    def append(self, b: Batch) -> None:
        self._device.append(b)
        self.mm.maybe_reclaim()
        if self.pool is not None:
            self.pool.maybe_arbitrate()

    def _detach_pool(self) -> None:
        if self.pool is not None:
            self.pool.detach_buffer(self)
            self.pool.close()
            self.pool = None

    def device_bytes(self) -> int:
        return sum(batch_device_bytes(b) for b in self._device)

    def spill_all(self) -> None:
        """Move all device batches to host RAM (one D2H per buffer)."""
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.spill.spill_all", self)
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

    def has_spilled(self) -> bool:
        return bool(self._host) or bool(self._files)

    def host_bytes(self) -> int:
        return sum(hb.nbytes for hb in self._host)

    def spill_to_disk(self) -> None:
        """Second spill rung: host RAM -> SerializedPage files
        (velox/exec/SpillFile.h). Serialization + write run on a
        background executor (velox's async spill I/O,
        SpillerBase::runSpill executor model): the host batch's RAM
        is held until the write completes, but the caller returns
        immediately and the file slots resolve lazily at first read —
        compute overlaps spill I/O."""
        pool = _spill_executor()
        for hb in self._host:
            if pool is None:
                self._files.append(hb.to_file(config.spill_dir))
            else:
                self._files.append(_PendingFileBatch(
                    pool.submit(hb.to_file, config.spill_dir)))
        self._host = []

    def drain(self) -> List[Batch]:
        """All buffered batches, restoring spilled ones to device."""
        out = ([fb.restore() for fb in self._files]
               + [hb.restore() for hb in self._host]
               + list(self._device))
        self._files = []
        self._host = []
        self._device = []
        self.mm.unregister(self)
        self._detach_pool()
        return out

    def drain_host(self):
        """(host column dicts, remaining device batches) WITHOUT
        restoring to device — the partitioned-spill consumer splits the
        host side by key hash and restores one partition at a time."""
        for fb in self._files:  # disk rung restores through host RAM
            b = fb.restore()
            self._host.append(_HostBatch(b))
        self._files = []
        host = [hb.cols | {"__sel__": (None, hb.sel, None, None, None)}
                for hb in self._host]
        device = list(self._device)
        self._host = []
        self._device = []
        self.mm.unregister(self)
        self._detach_pool()
        return host, device

    def close(self) -> None:
        for fb in self._files:
            fb.close()
        self._files = []
        self._device = []
        self._host = []
        self.mm.unregister(self)
        self._detach_pool()


# ------------------------------------------------- partitioned agg spill

def _np_key_hash(keys: List[Tuple[np.ndarray, Optional[np.ndarray]]],
                 n: Optional[int] = None) -> np.ndarray:
    """Deterministic host-side hash of group-key rows. Null keys hash as
    a distinct marker so null groups co-locate. Only partition-routing
    consistency matters (same key -> same partition); this hash never
    has to match the device hash. ``n`` sizes the keyless (global
    aggregation) case: every row hashes to 0 -> one partition."""
    if n is None:
        n = keys[0][0].shape[0] if keys else 0
    h = np.zeros(n, dtype=np.uint64)
    for (v, va) in keys:
        x = np.asarray(v).astype(np.int64, copy=False).view(np.uint64) \
            if np.asarray(v).dtype != np.bool_ \
            else np.asarray(v).astype(np.uint64)
        x = x * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(29)
        if va is not None:
            x = np.where(np.asarray(va), x, np.uint64(0x5851F42D4C957F2D))
        h = (h * np.uint64(0xBF58476D1CE4E5B9)) ^ x
    return h


def _entry_to_host(entry: dict) -> dict:
    def pairs(ps):
        return [(np.asarray(v), None if va is None else np.asarray(va))
                for (v, va) in ps]

    return {
        "keys": pairs(entry["keys"]),
        "lanes": [None if l is None else tuple(
            np.asarray(a) for a in l) for l in entry["lanes"]],
        "sel": np.asarray(entry["sel"]),
        "distinct": [
            None if d is None else {
                "keys": pairs(d["keys"]),
                "arg": np.asarray(d["arg"]),
                "sel": np.asarray(d["sel"]),
            } for d in entry["distinct"]],
    }


def _entry_bytes(entry: dict) -> int:
    total = 0

    def add(a):
        nonlocal total
        if a is not None:
            total += a.size * a.dtype.itemsize

    for (v, va) in entry["keys"]:
        add(v)
        add(va)
    for l in entry["lanes"]:
        if l is not None:
            for a in l:
                add(a)
    add(entry["sel"])
    for d in entry["distinct"]:
        if d is not None:
            for (v, va) in d["keys"]:
                add(v)
                add(va)
            add(d["arg"])
            add(d["sel"])
    return int(total)


def _split_entry(he: dict, pids: np.ndarray, num_parts: int) -> List[dict]:
    """Split a HOST entry into per-partition compacted sub-entries.

    Distinct-rep regions carry their own key rows and are routed by the
    same partition function, so every partition's merge sees exactly its
    groups' regular lanes AND distinct representatives."""
    out = []
    sel = he["sel"]
    d_pids = [
        None if d is None else _np_key_hash(
            d["keys"], d["sel"].shape[0]) % num_parts
        for d in he["distinct"]]
    for p in range(num_parts):
        m = np.logical_and(sel, pids == p)
        idx = np.nonzero(m)[0]

        def take_pairs(ps, idx):
            return [(v[idx], None if va is None else va[idx])
                    for (v, va) in ps]

        sub = {
            "keys": take_pairs(he["keys"], idx),
            "lanes": [None if l is None else tuple(a[idx] for a in l)
                      for l in he["lanes"]],
            "sel": np.ones(idx.shape[0], dtype=bool),
            "distinct": [],
        }
        for d, dp in zip(he["distinct"], d_pids):
            if d is None:
                sub["distinct"].append(None)
                continue
            dm = np.logical_and(d["sel"], dp == p)
            didx = np.nonzero(dm)[0]
            sub["distinct"].append({
                "keys": take_pairs(d["keys"], didx),
                "arg": d["arg"][didx],
                "sel": np.ones(didx.shape[0], dtype=bool),
            })
        out.append(sub)
    return out


class PartitionedEntryStore:
    """Generic-aggregation partial entries with hash-partitioned host
    spill + per-partition restore.

    The GroupingSet spill redesign (velox/exec/GroupingSet.cpp:1116
    spill -> SpillPartitionSet -> mergeRestore): entries buffer on
    device; under memory pressure they move to host RAM split by a hash
    of the group keys into ``num_parts`` bins. Finishing then merges ONE
    partition at a time — peak device memory is the largest partition,
    not the whole state, and partitions stream out as separate result
    batches (no monolithic restore)."""

    def __init__(self, label: str = "agg",
                 num_parts: Optional[int] = None,
                 mm: Optional[MemoryManager] = None):
        self.num_parts = num_parts or config.spill_agg_partitions
        self.label = label
        self.mm = mm or memory_manager
        self._device: List[dict] = []
        self._parts: List[List[dict]] = [[] for _ in range(self.num_parts)]
        self.spilled = False
        self.spilled_bytes = 0
        self.mm.register(self)

    def append(self, entry: dict) -> None:
        self._device.append(entry)
        self.mm.maybe_reclaim()

    def device_bytes(self) -> int:
        return sum(_entry_bytes(e) for e in self._device)

    def spill_all(self) -> None:
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.spill.spill_all", self)
        for e in self._device:
            he = _entry_to_host(e)
            self.spilled_bytes += _entry_bytes(he)
            pids = _np_key_hash(
                he["keys"], he["sel"].shape[0]) % self.num_parts
            for p, sub in enumerate(
                    _split_entry(he, pids, self.num_parts)):
                if sub["sel"].shape[0]:
                    self._parts[p].append(sub)
            reporter.add_counter(METRIC_SPILLED_BYTES, _entry_bytes(he))
        if self._device:
            self.spilled = True
            reporter.add_counter(METRIC_SPILL_EVENTS)
        self._device = []

    def __len__(self) -> int:
        return len(self._device) + sum(len(p) for p in self._parts)

    def partitions(self) -> List[List[dict]]:
        """Entry groups whose key sets are disjoint across groups.

        No spill: one group with the device entries. After spill: the
        remaining device entries are partitioned too (a group's rows
        must never straddle groups), giving ``num_parts`` groups merged
        one at a time by the caller."""
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.spill.partitions", self)
        if not self.spilled:
            out = [list(self._device)]
        else:
            self.spill_all()
            out = [list(p) for p in self._parts if p]
        self._device = []
        self._parts = [[] for _ in range(self.num_parts)]
        self.mm.unregister(self)
        return out

    def close(self) -> None:
        self._device = []
        self._parts = [[] for _ in range(self.num_parts)]
        self.mm.unregister(self)
