"""Fuzzing harnesses.

Analog of velox's fuzzer family (velox/expression/fuzzer/
ExpressionFuzzer.h:33, vector/fuzzer/VectorFuzzer.h:77): random vectors +
random expression trees evaluated by the engine and independently by a
host-side reference evaluator; any mismatch is a bug.
"""

from velox_tpu.fuzzer.vector_fuzzer import VectorFuzzer  # noqa: F401
from velox_tpu.fuzzer.expression_fuzzer import (  # noqa: F401
    ExpressionFuzzer, run_expression_fuzz,
)
