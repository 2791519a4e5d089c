"""Distributed-execution fuzzer: run_plan_distributed == serial.

Random scan -> [semi joins | inner joins | filters | projects] ->
aggregation plans execute through the SPMD mesh runner
(parallel/pipeline.py) and the serial Task; results must match. This is
the velox-style plan-equivalence oracle pointed at the DISTRIBUTION
layer: per-device partial aggregation, replicated build bridges, and
expansion-capacity syncs must be invisible to results.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

from velox_tpu.exec import run_plan
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch


def _canon(table) -> List[tuple]:
    d = table.to_pydict()
    rows = []
    for r in zip(*[d[c] for c in sorted(d)]):
        rows.append(tuple(
            (None if x is None or (isinstance(x, float)
                                   and math.isnan(x))
             else float(f"{x:.10g}") if isinstance(x, float) else x)
            for x in r))
    return sorted(rows, key=lambda r: tuple(
        (x is None, str(x)) for x in r))


def run_distributed_fuzz(iterations: int = 20, seed: int = 0,
                         mesh=None, verbose: bool = False) -> None:
    import pyarrow as pa

    from velox_tpu.io import drop_table, register_arrow
    from velox_tpu.parallel.mesh import make_mesh
    from velox_tpu.parallel.runner import run_plan_distributed

    mesh = mesh or make_mesh()
    rng = np.random.default_rng(seed)
    for i in range(iterations):
        if i and i % 10 == 0:
            import jax

            jax.clear_caches()
        n = int(rng.integers(500, 6000))
        ks = int(rng.integers(5, 400))
        register_arrow("dfz_t", pa.table({
            "k": rng.integers(0, ks, n),
            "k2": rng.integers(0, 7, n),
            "v": np.round(rng.normal(size=n), 4),
        }), 1 << 9)
        nb = int(rng.integers(2, max(ks, 3)))
        build = Batch.from_pydict(
            {"bk": [int(x) for x in
                    rng.choice(ks, nb, replace=False)],
             "w": [float(np.round(x, 4))
                   for x in rng.normal(size=nb)]},
            {"bk": BIGINT, "w": DOUBLE})
        semi = Batch.from_pydict(
            {"sk": [int(x) for x in rng.integers(0, 7, 4)]},
            {"sk": BIGINT})

        use_semi = bool(rng.random() < 0.5)
        use_inner = bool(rng.random() < 0.7) or not use_semi
        use_filter = bool(rng.random() < 0.5)
        keyed = bool(rng.random() < 0.7)
        # tail shape: agg (partial/final or single), plain ORDER BY,
        # TopN, or an outer-join finish (r3: distributed sorts + outer
        # joins + multi-step aggregation)
        tail = str(rng.choice(
            ["agg", "agg2", "orderby", "topn", "outer", "window"]))
        join_type = ("inner" if tail != "outer"
                     else str(rng.choice(["right", "full", "left"])))
        agg_fns = ["sum(x) AS s", "count(*) AS c"]
        if rng.random() < 0.5:
            agg_fns.append("min(x) AS lo")
        if rng.random() < 0.3:
            agg_fns.append("avg(x) AS m")

        def plan():
            pb = PlanBuilder().table_scan("dfz_t",
                                          columns=["k", "k2", "v"])
            if use_filter:
                pb = pb.filter("v > -0.5")
            if use_semi:
                pb = pb.hash_join(
                    PlanBuilder().values([semi]), ["k2"], ["sk"],
                    "left_semi")
            if use_inner or tail == "outer":
                out = ["k", "k2", "v", "w"] + (
                    ["bk"] if tail == "outer" else [])
                pb = pb.hash_join(
                    PlanBuilder().values([build]), ["k"], ["bk"],
                    join_type, output=out)
                if tail == "outer":
                    return pb
                pb = pb.project(["k", "v + w AS x"])
            else:
                pb = pb.project(["k", "v AS x"])
            if tail == "window":
                # distributed window: partition-key shuffle +
                # per-device kernel (parallel/pipeline.py)
                return (pb.window(["k"], ["x"],
                                  ["row_number() AS rn",
                                   "sum(x) AS sx"])
                        .order_by(["k", "x", "rn"]))
            if tail == "orderby":
                return pb.order_by(["x DESC", "k"])
            if tail == "topn":
                return pb.top_n(["x", "k DESC"], 13)
            if tail == "agg2":
                return (pb.partial_aggregation(
                            ["k"] if keyed else [], agg_fns)
                        .final_aggregation())
            return pb.aggregate(["k"] if keyed else [], agg_fns)

        try:
            serial = _canon(run_plan(plan().build()))
            dist = _canon(run_plan_distributed(plan().build(),
                                               mesh=mesh))
            assert dist == serial, (
                f"iter {i}: distributed != serial "
                f"(semi={use_semi} inner={use_inner} tail={tail} "
                f"jt={join_type} filter={use_filter} keyed={keyed})\n"
                f"dist {dist[:5]}\nserial {serial[:5]}")
            if verbose:
                print(f"iter {i}: semi={use_semi} inner={use_inner} "
                      f"tail={tail} jt={join_type} "
                      f"filter={use_filter} keyed={keyed} "
                      f"rows={len(serial)} ok")
        finally:
            drop_table("dfz_t")
