"""Execution runtime: operators, pipelines, Task driver.

Analog of velox/exec (Task velox/exec/Task.h:44, Driver velox/exec/
Driver.h:364, Operator velox/exec/Operator.h:120, LocalPlanner
velox/exec/LocalPlanner.cpp:374) in serial pull mode (Task::next,
velox/exec/Task.cpp:994): the host walks operator chains batch-by-batch
while every operator's compute is a jitted XLA program over device arrays.
Pipelines split at join builds exactly where velox's LocalPlanner splits
(non-first join sources must start new pipelines, LocalPlanner.cpp:108).
"""

from velox_tpu.exec.operator import Operator, OperatorStats
from velox_tpu.exec.task import (
    Task, make_operator, register_operator, run_plan, run_plan_grouped,
    run_plan_pydict,
)
from velox_tpu.exec.fragments import (
    Fragment, OutputBufferManager, partitioned_output, run_fragments,
)
from velox_tpu.exec.spill import MemoryManager, SpillableBuffer

__all__ = [
    "Operator", "OperatorStats", "Task", "run_plan", "run_plan_pydict",
    "run_plan_grouped",
    "make_operator", "register_operator", "Fragment",
    "OutputBufferManager", "partitioned_output", "run_fragments",
    "MemoryManager", "SpillableBuffer",
]
