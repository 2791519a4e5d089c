"""Weak-scaling measurement of the distributed aggregation/join path.

Runs the SPMD plan (scan -> inner join vs a replicated build ->
project -> partial agg -> gather -> final) with PER-DEVICE-CONSTANT
data over mesh sizes 1..8 on the virtual CPU mesh (the multi-chip
stand-in: XLA inserts the same collectives it would over ICI).
Weak-scaling efficiency = t(1) / t(n) with n-proportional total work.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python tools/weak_scaling.py
"""

import sys
import time

sys.path.insert(0, ".")

import os

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pyarrow as pa

from velox_tpu.exec.jitcache import cached_jit  # noqa: F401
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.parallel.mesh import make_mesh
from velox_tpu.parallel.runner import run_plan_distributed
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch

ROWS_PER_DEV = 200_000


def plan():
    build = Batch.from_pydict(
        {"bk": list(range(500)),
         "w": [float(i) / 7 for i in range(500)]},
        {"bk": BIGINT, "w": DOUBLE})
    return (PlanBuilder().table_scan("ws_t", columns=["k", "v"])
            .hash_join(PlanBuilder().values([build]), ["k"], ["bk"],
                       "inner", output=["k", "v", "w"])
            .project(["k", "v + w AS x"])
            .aggregate(["k"], ["sum(x) AS s", "count(*) AS c"]))


def main():
    rng = np.random.default_rng(0)
    results = {}
    # oversubscribed meshes (more virtual devices than physical cores)
    # are not a meaningful collective-overhead signal AND can hit XLA's
    # 40s cross-device rendezvous abort when worker threads starve —
    # measure them only when asked (BASELINE.md round-2 caveat)
    sizes = [1, 2, 4, 8]
    cores = os.cpu_count() or 1
    if "--all" not in sys.argv:
        sizes = [s for s in sizes if s <= cores]
    for n_dev in sizes:
        n = ROWS_PER_DEV * n_dev
        register_arrow("ws_t", pa.table({
            "k": rng.integers(0, 500, n),
            "v": rng.normal(size=n)}), 1 << 22)
        mesh = make_mesh(n_dev)
        run_plan_distributed(plan().build(), mesh=mesh)  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_plan_distributed(plan().build(), mesh=mesh)
            times.append(time.perf_counter() - t0)
        results[n_dev] = min(times)
        drop_table("ws_t")
        print(f"devices={n_dev} rows={n} t={results[n_dev]*1e3:.0f}ms "
              f"efficiency={results[1]/results[n_dev]*100:.0f}%",
              flush=True)


if __name__ == "__main__":
    main()
