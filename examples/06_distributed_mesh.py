"""The same query serial vs distributed over an 8-virtual-device mesh
(TPU-native; no reference analog — velox distributes via Presto/Spark
fragments, this engine shards one plan over a jax.sharding.Mesh with
XLA collectives doing the shuffle). Run on real hardware the same code
spans pod slices over ICI."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from velox_tpu.exec import run_plan_pydict
from velox_tpu.parallel import make_mesh
from velox_tpu.parallel.runner import run_plan_distributed
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch


def main() -> None:
    rng = np.random.default_rng(0)
    n = 8 * 1024
    fact = Batch.from_pydict(
        {"k": [int(x) for x in rng.integers(0, 100, n)],
         "v": [float(x) for x in rng.normal(100.0, 10.0, n)]},
        {"k": BIGINT, "v": DOUBLE})
    dim = Batch.from_pydict(
        {"dk": list(range(0, 100, 2)),
         "w": [float(i) for i in range(50)]},
        {"dk": BIGINT, "w": DOUBLE})

    def plan():
        return (PlanBuilder().values([fact])
                .hash_join(PlanBuilder().values([dim]),
                           ["k"], ["dk"], "inner",
                           output=["k", "v", "w"])
                .aggregate(["k"], ["sum(v) AS sv", "avg(w) AS aw",
                                   "count(*) AS n"])
                .order_by(["k"]).build())

    serial = run_plan_pydict(plan())
    mesh = make_mesh(8)
    dist = run_plan_distributed(plan(), mesh=mesh).to_pydict()
    print("groups:", len(serial["k"]),
          "| distributed == serial:", dist == serial)
    assert dist == serial


if __name__ == "__main__":
    main()
