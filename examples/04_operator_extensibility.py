"""A custom PlanNode + Operator pair, registered and run end to end
(velox/examples/OperatorExtensibility.cpp analog: DuplicateRowNode +
DuplicateRowTranslator -> here register_operator on the Task's
lowering registry). The custom operator duplicates every row N times
— on device, as one repeat + gather."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from velox_tpu.exec import run_plan_pydict
from velox_tpu.exec.operator import Operator
from velox_tpu.exec.task import register_operator
from velox_tpu.plan import PlanBuilder
from velox_tpu.plan.nodes import PlanNode, new_id
from velox_tpu.types import BIGINT
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import Column


@dataclass(frozen=True)
class DuplicateRowNode(PlanNode):
    source: PlanNode = None
    times: int = 2

    @property
    def sources(self) -> Tuple[PlanNode, ...]:
        return (self.source,)


class DuplicateRowOp(Operator):
    """Repeat every active row ``times`` times: one gather per column
    (XLA fuses the whole thing into the downstream program)."""

    def __init__(self, node: DuplicateRowNode):
        super().__init__(node)
        self._out = []

    def add_input(self, batch: Batch) -> None:
        t = self.node.times
        cap = batch.sel.shape[0]
        idx = jnp.repeat(jnp.arange(cap, dtype=jnp.int32), t)
        cols = {
            n: Column(c.dtype, jnp.take(c.values, idx, mode="clip"),
                      None if c.valid is None
                      else jnp.take(c.valid, idx, mode="clip"),
                      c.dictionary)
            for n, c in batch.columns.items()}
        self._out.append(Batch(cols, jnp.take(batch.sel, idx,
                                              mode="clip")))

    def get_output(self):
        return self._out.pop(0) if self._out else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._out


def main() -> None:
    register_operator(DuplicateRowNode, DuplicateRowOp)

    b = Batch.from_pydict({"x": [1, 2, 3]}, {"x": BIGINT})
    pb = PlanBuilder().values([b])
    # splice the custom node into the plan the builder is holding
    pb.node = DuplicateRowNode(new_id(), pb.node.output_type,
                               source=pb.node, times=3)
    out = run_plan_pydict(pb.aggregate(
        [], ["count(*) AS n", "sum(x) AS s"]).build())
    print(out)
    assert out["n"][0] == 9 and out["s"][0] == 18


if __name__ == "__main__":
    main()
