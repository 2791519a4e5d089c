"""Random batch generation (velox/vector/fuzzer/VectorFuzzer.h:77 analog)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from velox_tpu.vector.batch import Batch
from velox_tpu.vector.arrow_bridge import from_arrow


class VectorFuzzer:
    """Random columns of every supported scalar type with configurable
    null ratio and string cardinality."""

    def __init__(self, seed: int = 0, null_ratio: float = 0.1,
                 string_pool: int = 12):
        self.rng = np.random.default_rng(seed)
        self.null_ratio = null_ratio
        self.pool = [
            f"s{i:02d}" for i in range(string_pool)]

    def _nulls(self, vals: list) -> list:
        return [
            None if self.rng.random() < self.null_ratio else v
            for v in vals]

    def column(self, kind: str, n: int) -> pa.Array:
        r = self.rng
        if kind == "bigint":
            v = r.integers(-1000, 1000, n).tolist()
            return pa.array(self._nulls(v), type=pa.int64())
        if kind == "integer":
            v = r.integers(-100, 100, n).tolist()
            return pa.array(self._nulls(v), type=pa.int32())
        if kind == "double":
            v = np.round(r.normal(scale=50, size=n), 3).tolist()
            return pa.array(self._nulls(v), type=pa.float64())
        if kind == "boolean":
            v = (r.random(n) < 0.5).tolist()
            return pa.array(self._nulls(v), type=pa.bool_())
        if kind == "varchar":
            v = [self.pool[i] for i in r.integers(0, len(self.pool), n)]
            return pa.array(self._nulls(v), type=pa.string())
        if kind == "date":
            v = r.integers(8000, 12000, n).tolist()
            return pa.array(self._nulls(v), type=pa.date32())
        raise KeyError(kind)

    def batch(self, spec: Dict[str, str], n: int) -> Batch:
        return from_arrow(pa.table({
            name: self.column(kind, n) for name, kind in spec.items()}))

    def table(self, spec: Dict[str, str], n: int) -> pa.Table:
        return pa.table({
            name: self.column(kind, n) for name, kind in spec.items()})
