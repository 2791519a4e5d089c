"""Expression evaluation walkthrough (velox/examples/ExpressionEval.cpp
analog): parse SQL-ish text into the typed IR, compile it into one
fused XLA program over (values, validity) lanes, and evaluate it
against a Batch. The key TPU-native idea: the whole expression tree
evaluates in ONE traced program — velox's per-node VectorFunction
dispatch has no analog here because XLA fuses the tree."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from velox_tpu.expr.compiler import ExprSet
from velox_tpu.expr.parser import parse_expr
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.types.types import row_type
from velox_tpu.vector.batch import Batch


def main() -> None:
    batch = Batch.from_pydict(
        {"a": [1, 2, None, 4], "b": [10.0, 20.0, 30.0, 40.0],
         "s": ["foo", "bar", None, "baz"]},
        {"a": BIGINT, "b": DOUBLE, "s": VARCHAR})

    schema = row_type(["a", "b", "s"], [BIGINT, DOUBLE, VARCHAR])
    exprs = [
        parse_expr("a + 1"),
        parse_expr("if(b > 15.0, b * 2.0, -b)"),
        parse_expr("upper(s)"),                # bind-time dict transform
        parse_expr("coalesce(a, 0) * 100"),
    ]
    es = ExprSet(exprs, schema,
                 dictionaries={"s": batch.column("s").dictionary})

    env = {n: (c.values, c.valid) for n, c in batch.columns.items()}
    results = es.evaluate(env)
    for e, (vals, valid), t in zip(exprs, results, es.result_types):
        print(f"{e!s:>28} : {t} -> {vals[:4]}"
              + (f" valid={valid[:4]}" if valid is not None else ""))
    # string results come back as dictionary codes + a result dictionary
    up = es.result_dictionaries[2]
    print("upper(s) dictionary:", list(up.values))


if __name__ == "__main__":
    main()
