"""Registering scalar and aggregate functions
(velox/examples/SimpleFunctions.cpp analog). A scalar function is a
pure JAX transform over value lanes; an aggregate is a set of
accumulator lanes + masked scatter-reduce steps — no per-row objects
anywhere."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from velox_tpu.exec import run_plan_pydict
from velox_tpu.functions import register_function, ScalarFunction
from velox_tpu.functions.aggregates import (
    AccLane, AggregateFunction, register_aggregate,
)
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch


def main() -> None:
    # ---- scalar: my_plus_constant(x) = x + 42
    register_function(ScalarFunction(
        name="my_plus_constant",
        resolve_type=lambda ts: ts[0],
        impl=lambda x: x + 42,
    ))

    # ---- aggregate: geometric mean via (sum of logs, count) lanes
    def acc(accs, gids, values, mask):
        s, n = accs
        lg = jnp.where(mask, jnp.log(jnp.maximum(
            values.astype(jnp.float64), 1e-300)), 0.0)
        return (s.at[gids].add(lg, mode="drop"),
                n.at[gids].add(mask.astype(n.dtype), mode="drop"))

    register_aggregate(AggregateFunction(
        name="geomean",
        resolve_type=lambda t: DOUBLE,
        lanes=(AccLane("s", lambda t: np.dtype(np.float64),
                       lambda t: 0.0),
               AccLane("n", lambda t: np.dtype(np.int64),
                       lambda t: 0)),
        accumulate=acc,
        combine=lambda accs, gids, lanes, mask: (
            accs[0].at[gids].add(
                jnp.where(mask, lanes[0], 0.0), mode="drop"),
            accs[1].at[gids].add(
                jnp.where(mask, lanes[1], 0), mode="drop")),
        extract=lambda accs, gm: (
            jnp.exp(accs[0] / jnp.maximum(accs[1], 1)),
            jnp.logical_and(gm, accs[1] > 0)),
        lane_types=lambda t: (DOUBLE, BIGINT),
        final_type=lambda lanes: DOUBLE,
    ))

    b = Batch.from_pydict(
        {"g": [0, 0, 1, 1, 1], "x": [1, 4, 2, 8, 32]},
        {"g": BIGINT, "x": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .project(["g", "my_plus_constant(x) AS x42", "x"])
        .aggregate(["g"], ["geomean(x) AS gm", "sum(x42) AS s42"])
        .order_by(["g"]).build())
    print(out)           # gm group0 = sqrt(1*4) = 2, group1 = 8
    assert abs(out["gm"][0] - 2.0) < 1e-9
    assert abs(out["gm"][1] - 8.0) < 1e-9


if __name__ == "__main__":
    main()
