"""Scaled writers: skew-aware fan-out of a file sink.

Reference: velox/exec/ScaleWriterLocalPartition.h:27 +
common/base/SkewedPartitionBalancer.h:31. The reference scales the
NUMBER OF WRITER DRIVERS when the written volume shows a partition is
hot; this engine's sink is a host-side pyarrow writer (the device never
sees files), so scaling means splitting a hot partition's rows across
several output FILES, keeping file sizes balanced for downstream
readers. The balancer is a faithful host-side port of the algorithm's
semantics: byte-accounted partitions, rebalance ticks, hot partitions
acquire the least-loaded extra writer, assignments never shrink, rows
round-robin across a partition's writer set.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


class SkewedPartitionRebalancer:
    """Tracks processed bytes per logical partition and grows each hot
    partition's writer set (SkewedPartitionBalancer.h contract)."""

    def __init__(self, n_partitions: int, n_writers: int,
                 min_partition_bytes: int,
                 min_rebalance_bytes: int | None = None):
        self.n_partitions = n_partitions
        self.n_writers = n_writers
        self.min_partition_bytes = max(int(min_partition_bytes), 1)
        self.min_rebalance_bytes = (
            self.min_partition_bytes if min_rebalance_bytes is None
            else max(int(min_rebalance_bytes), 1))
        # every partition starts on one writer, spread round-robin
        self.writers: List[List[int]] = [
            [p % n_writers] for p in range(n_partitions)]
        self._part_bytes = np.zeros(n_partitions, np.int64)
        self._part_bytes_at_scale = np.zeros(n_partitions, np.int64)
        self._writer_bytes = np.zeros(n_writers, np.int64)
        self._since_rebalance = 0
        self._rr = np.zeros(n_partitions, np.int64)

    def record(self, partition_bytes: np.ndarray) -> None:
        """Account one batch's per-partition byte volume."""
        pb = np.asarray(partition_bytes, np.int64)
        self._part_bytes += pb
        for p in np.nonzero(pb)[0]:
            for w in self.writers[p]:
                self._writer_bytes[w] += pb[p] // len(self.writers[p])
        self._since_rebalance += int(pb.sum())

    def maybe_rebalance(self) -> bool:
        """Scale hot partitions once enough new bytes have flowed."""
        if self._since_rebalance < self.min_rebalance_bytes:
            return False
        self._since_rebalance = 0
        scaled = False
        growth = self._part_bytes - self._part_bytes_at_scale
        for p in np.argsort(-growth):
            if growth[p] < self.min_partition_bytes:
                break
            cur = self.writers[p]
            if len(cur) >= self.n_writers:
                continue
            candidates = [w for w in range(self.n_writers)
                          if w not in cur]
            w = min(candidates, key=lambda w: self._writer_bytes[w])
            cur.append(w)
            self._part_bytes_at_scale[p] = self._part_bytes[p]
            scaled = True
        return scaled

    def assign(self, pids: np.ndarray) -> np.ndarray:
        """Row partition ids -> writer ids, round-robin inside each
        partition's writer set (ScaleWriterLocalPartition row routing)."""
        out = np.zeros(len(pids), np.int32)
        for p in np.unique(pids):
            ws = self.writers[p]
            idx = np.nonzero(pids == p)[0]
            if len(ws) == 1:
                out[idx] = ws[0]
            else:
                seq = (self._rr[p] + np.arange(len(idx))) % len(ws)
                out[idx] = np.asarray(ws, np.int32)[seq]
                self._rr[p] += len(idx)
        return out


def scaled_write(table, path: str, partition_by, n_writers: int,
                 min_partition_bytes: int,
                 chunk_rows: int | None = None) -> int:
    """Write ``table`` as parquet under ``path`` with skew-scaled file
    fan-out. Returns the number of files written.

    Hive-partitioned layout when ``partition_by`` is set
    (key=value/part-w{N}.parquet); flat part-w{N}.parquet files
    otherwise. Chunked accounting reproduces the reference's streaming
    scale-up: early rows land on one writer, writers join as a
    partition proves hot.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = table.num_rows
    if partition_by:
        keys = table.select(list(partition_by))
        df = keys.to_pandas()
        codes, uniques = (
            df.groupby(list(partition_by), sort=True, dropna=False)
            .ngroup().to_numpy(),
            df.drop_duplicates().sort_values(list(partition_by)))
        n_parts = int(codes.max()) + 1 if n else 0
        pids = codes.astype(np.int64)
    else:
        n_parts = 1 if n else 0
        pids = np.zeros(n, np.int64)
    if n == 0:
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, "part-w0.parquet"))
        return 1
    row_bytes = max(table.nbytes // max(n, 1), 1)
    if chunk_rows is None:
        # several accounting ticks per scale-up threshold, so writers
        # join progressively as a partition proves hot (a tick adds at
        # most one writer per partition)
        chunk_rows = int(max(
            1024, min(1 << 16,
                      min_partition_bytes // (2 * row_bytes) + 1)))
    reb = SkewedPartitionRebalancer(
        n_parts, n_writers, min_partition_bytes)
    wids = np.zeros(n, np.int32)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        cp = pids[lo:hi]
        reb.record(np.bincount(cp, minlength=n_parts) * row_bytes)
        reb.maybe_rebalance()
        wids[lo:hi] = reb.assign(cp)

    files = 0
    order = np.lexsort((wids, pids))
    bounds = np.nonzero(np.diff(pids[order]) | np.diff(wids[order]))[0]
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [n]])
    for s, e in zip(starts, ends):
        rows = order[s:e]
        p, w = int(pids[rows[0]]), int(wids[rows[0]])
        sub = table.take(pa.array(rows))
        if partition_by:
            part_row = uniques.iloc[p]
            d = os.path.join(path, *[
                f"{c}={part_row[c]}" for c in partition_by])
            sub = sub.drop_columns(list(partition_by))
        else:
            d = path
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, f"part-w{w}.parquet"))
        files += 1
    return files
