"""Scan -> filter -> sort -> limit (velox/examples/ScanAndSort.cpp
analog): write a parquet file, register it in the connector catalog,
and run a query over it. The scan is lazy: the engine decodes only the
columns the plan references, filter-first (io/catalog.py late
materialization)."""

import os
import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from velox_tpu.exec import run_plan
from velox_tpu.io.catalog import register_parquet, drop_table
from velox_tpu.plan import PlanBuilder


def main() -> None:
    rng = np.random.default_rng(0)
    n = 10_000
    table = pa.table({
        "id": np.arange(n),
        "score": rng.normal(100.0, 15.0, n),
        "tag": rng.choice(["red", "green", "blue"], n),
    })
    path = os.path.join(tempfile.mkdtemp(), "scores.parquet")
    pq.write_table(table, path)

    register_parquet("scores", path)
    plan = (
        PlanBuilder()
        .table_scan("scores", columns=["id", "score", "tag"],
                    subfilter="score > 120.0")   # pushed into the scan
        .filter("tag = 'red'")
        .order_by(["score DESC"])
        .limit(5)
        .build()
    )
    out = run_plan(plan)
    print(out.to_pandas())
    drop_table("scores")


if __name__ == "__main__":
    main()
