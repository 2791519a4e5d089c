"""Scaled writers (ScaleWriterLocalPartition.h +
SkewedPartitionBalancer.h): hot partitions fan out across balanced
files; cold partitions keep one file; data round-trips."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from velox_tpu.exec import run_plan
from velox_tpu.exec.scale_writer import SkewedPartitionRebalancer
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch


def test_rebalancer_scales_hot_partition_only():
    reb = SkewedPartitionRebalancer(
        n_partitions=4, n_writers=4, min_partition_bytes=1000)
    for _ in range(5):
        reb.record(np.array([900, 10, 10, 10]))
        reb.maybe_rebalance()
    assert len(reb.writers[0]) > 1          # hot partition scaled
    assert all(len(reb.writers[p]) == 1 for p in (1, 2, 3))
    # round-robin across the hot partition's writer set
    w = reb.assign(np.zeros(8, np.int64))
    assert len(set(w.tolist())) == len(reb.writers[0])


def test_rebalancer_caps_at_n_writers():
    reb = SkewedPartitionRebalancer(1, 3, 10)
    for _ in range(20):
        reb.record(np.array([1000]))
        reb.maybe_rebalance()
    assert len(reb.writers[0]) == 3


def _write(tmpdir, rows, partition_by, scale_writers):
    rng = np.random.default_rng(0)
    k = np.where(rng.random(rows) < 0.98, 0, rng.integers(1, 4, rows))
    b = Batch.from_pydict(
        {"k": [int(v) for v in k],
         "v": [float(v) for v in rng.normal(size=rows)]},
        {"k": BIGINT, "v": DOUBLE})
    path = os.path.join(str(tmpdir), "out")
    out = run_plan(
        PlanBuilder().values([b])
        .table_write(path, partition_by=partition_by,
                     scale_writers=scale_writers).build()).to_pydict()
    assert out["rows"] == [rows]
    return path, b


def test_scaled_hive_write_fans_out_hot_partition(tmp_path):
    old = config.writer_min_partition_bytes
    config.writer_min_partition_bytes = 1 << 12
    try:
        path, b = _write(tmp_path, 20000, ["k"], scale_writers=4)
    finally:
        config.writer_min_partition_bytes = old
    hot = glob.glob(os.path.join(path, "k=0", "*.parquet"))
    cold = glob.glob(os.path.join(path, "k=1", "*.parquet"))
    assert len(hot) > 1                     # skew split across writers
    assert len(cold) == 1
    # hot files are balanced: no file more than 3x another
    sizes = sorted(pq.read_table(f).num_rows for f in hot)
    assert sizes[-1] <= 3 * max(sizes[0], 1)
    # dataset round-trips (hive dirs reconstruct k)
    import pyarrow.dataset as ds
    back = ds.dataset(path, partitioning="hive").to_table()
    src = b.to_pydict()
    assert sorted(zip([int(x) for x in back["k"].to_pylist()],
                      back["v"].to_pylist())) == sorted(
        zip(src["k"], src["v"]))


def test_scaled_flat_write_splits_files(tmp_path):
    old = config.writer_min_partition_bytes
    config.writer_min_partition_bytes = 1 << 12
    try:
        path, b = _write(tmp_path, 20000, [], scale_writers=3)
    finally:
        config.writer_min_partition_bytes = old
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) == 3
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 20000


def test_scale_writers_one_is_unchanged(tmp_path):
    path, _ = _write(tmp_path, 500, ["k"], scale_writers=1)
    # classic dataset layout (one dir per key, pyarrow naming)
    assert os.path.isdir(os.path.join(path, "k=0"))
