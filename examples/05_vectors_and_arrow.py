"""Batch/Column construction and the Arrow bridge
(velox/examples/VectorReaderWriter.cpp analog). The columnar layer's
TPU-native invariants on display: fixed power-of-two capacities with a
selection mask (no ragged shapes for XLA), strings as table-global
int32 dictionary codes, nulls as a separate validity lane."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import pyarrow as pa

from velox_tpu.types import ARRAY, BIGINT, VARCHAR
from velox_tpu.types.types import array
from velox_tpu.vector.arrow_bridge import from_arrow, to_arrow
from velox_tpu.vector.batch import Batch


def main() -> None:
    b = Batch.from_pydict(
        {"id": [1, 2, None], "name": ["ada", None, "kay"],
         "xs": [[1, 2], [], [3]]},
        {"id": BIGINT, "name": VARCHAR, "xs": array(BIGINT)})
    print("capacity:", b.sel.shape[0], "rows:", b.num_rows)
    c = b.column("name")
    print("name codes:", c.values, "valid:", c.valid,
          "dict:", list(c.dictionary.values))
    xs = b.column("xs")
    print("xs starts/lens/elements:", xs.starts, xs.lengths,
          xs.elements.values[:4])

    # arrow round trip preserves values, nulls, and nesting
    t = to_arrow(b)
    print(t)
    b2 = from_arrow(t)
    assert to_arrow(b2).equals(t)

    # zero-copy-ish ingestion from an existing arrow table
    src = pa.table({"k": [10, 20, 30], "tag": ["a", "b", "a"]})
    b3 = from_arrow(src)
    print("ingested:", b3.num_rows, "rows,",
          "tag dictionary:", list(b3.column("tag").dictionary.values))


if __name__ == "__main__":
    main()
