"""Microbench the actual StreamingAggregationOp step at Q18 scale.

6M rows, ~1.5M groups (4 rows/group), key dtype i64 vs i32, decimal(4,2)
i32 quantity lanes. Finds where the measured ~5s goes.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.plan import PlanBuilder
from velox_tpu.plan.nodes import StreamingAggregationNode
from velox_tpu.exec.operators import StreamingAggregationOp
from velox_tpu.types import BIGINT, INTEGER
from velox_tpu.types.types import DecimalType, TypeKind
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import Column
from velox_tpu.utils.config import config

N = 6_001_215
CAP = 1 << 23


def run_once(key_dtype):
    config.narrow_lanes = True
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(1, 1_500_000, N)).astype(key_dtype)
    qty = rng.integers(100, 5000, N).astype(np.int32)

    kv = np.zeros(CAP, key_dtype)
    kv[:N] = keys
    qv = np.zeros(CAP, np.int32)
    qv[:N] = qty
    sel = np.zeros(CAP, bool)
    sel[:N] = True

    dt = DecimalType(TypeKind.DECIMAL, 4, 2)
    ktype = BIGINT if key_dtype == np.int64 else INTEGER
    b = Batch(
        {"k": Column(ktype, jnp.asarray(kv)),
         "q": Column(dt, jnp.asarray(qv))},
        jnp.asarray(sel), num_rows=N)

    node = (PlanBuilder()
            .values([b])
            .streaming_aggregate(["k"], ["sum(q) AS s"]).build())
    assert isinstance(node, StreamingAggregationNode)

    op = StreamingAggregationOp(node)
    t0 = time.perf_counter()
    op.add_input(b)
    out = op.get_output()
    np.asarray(out.columns["k"].values[:1])
    warm = time.perf_counter() - t0

    op2 = StreamingAggregationOp(node)
    t0 = time.perf_counter()
    op2.add_input(b)
    out = op2.get_output()
    np.asarray(out.columns["k"].values[:1])
    steady = time.perf_counter() - t0
    print(f"{np.dtype(key_dtype).name}: warm {warm:.1f}s "
          f"steady {steady*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    run_once(np.int64)
    run_once(np.int32)
