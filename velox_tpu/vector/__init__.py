"""Columnar device vectors/batches.

Behavioral analog of velox/vector (BaseVector velox/vector/BaseVector.h:68,
FlatVector, DictionaryVector, SelectivityVector velox/vector/SelectivityVector.h:39)
re-designed TPU-first:

* A **Column** is a structure-of-arrays: a fixed-width device value array +
  optional device validity mask + optional host-side string dictionary
  (strings live on device only as int32 codes).
* A **Batch** is a set of named Columns of one static ``capacity`` (padded to
  a lane multiple so XLA can tile), plus a device boolean **selection mask**
  — the SelectivityVector analog. Filters only update the mask; data is
  compacted (gathered to the front) only when an operator needs dense rows
  (join build, shuffle, output).
* Encodings collapse to FLAT | DICTIONARY (what BASELINE scopes the engine
  to); DecodedVector's job (velox/vector/DecodedVector.h:76) is done by
  ``Column.decoded()`` which materializes (values, validity).
"""

from velox_tpu.vector.column import Column, Dictionary
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.arrow_bridge import from_arrow, to_arrow, from_pydict, to_pydict

__all__ = [
    "Column", "Dictionary", "Batch",
    "from_arrow", "to_arrow", "from_pydict", "to_pydict",
]
