"""Session catalog: named tables -> device batch splits.

Analog of the connector/DataSource contract
(velox/connectors/Connector.h:257,628 — addSplit/next) collapsed for
in-memory and Arrow/Parquet-backed tables: a Table owns a list of
fixed-capacity device Batches ("splits"); TableScan drains them. String
columns are dictionary-encoded ONCE over the whole table so every split
shares one dictionary (the invariant joins/group-bys rely on; the analog of
velox's per-file stripe dictionaries being rewritten per batch does not
apply — our dictionaries are table-global).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from velox_tpu.types.types import RowType, row_type
from velox_tpu.vector.batch import Batch, round_capacity
from velox_tpu.vector.column import Column, Dictionary
from velox_tpu.vector.arrow_bridge import _ingest_array, type_from_arrow


@dataclass
class Table:
    name: str
    schema: RowType
    batches: List[Batch]

    @property
    def num_rows(self) -> int:
        return sum(b.num_rows or 0 for b in self.batches)


_TABLES: Dict[str, Table] = {}


def register_table(name: str, batches: Sequence[Batch]) -> Table:
    batches = list(batches)
    assert batches, "empty table needs register_arrow with schema"
    t = Table(name, batches[0].schema, batches)
    _TABLES[name] = t
    return t


def register_arrow(
    name: str, table: pa.Table, batch_rows: int = 1 << 20,
    decimal_overrides: Optional[Dict[str, tuple]] = None,
) -> Table:
    """Ingest an Arrow table as device splits of <= batch_rows rows.

    ``decimal_overrides`` maps integer arrow columns to ``(precision,
    scale)``: the stored ints are taken as UNSCALED decimal values (cents
    etc.). This is the fast decimal ingest path — vectorized int64
    transfer, no per-row Decimal boxing (velox's short-decimal flat
    vectors analog, velox/type/DecimalUtil.h).
    """
    n = table.num_rows
    batch_rows = min(batch_rows, max(n, 1))
    cap = round_capacity(batch_rows)

    # encode string columns once over the full table -> shared dictionaries
    full_cols: Dict[str, Column] = {}
    names = table.column_names
    batches: List[Batch] = []
    starts = list(range(0, max(n, 1), batch_rows))
    for start in starts:
        chunk = table.slice(start, batch_rows)
        rows = chunk.num_rows
        cols = {}
        for cname in names:
            cols[cname] = _ingest_array(chunk.column(cname), cap)
        sel = np.zeros(cap, dtype=bool)
        sel[:rows] = True
        batches.append(Batch(cols, jnp.asarray(sel), num_rows=rows))
    # unify per-column dictionaries across splits (encode over full column)
    batches = _unify_dictionaries(table, batches, cap, batch_rows)
    if decimal_overrides:
        from velox_tpu.types.types import DecimalType, TypeKind

        for bi, b in enumerate(batches):
            for cname, (p, s) in decimal_overrides.items():
                col = b.columns[cname]
                dt = DecimalType(TypeKind.DECIMAL, p, s)
                batches[bi] = batches[bi].with_column(
                    cname, Column(
                        dt, col.values.astype(dt.dtype), col.valid))
    _attach_stats(table, batches, decimal_overrides)
    t = Table(name, batches[0].schema, batches)
    _TABLES[name] = t
    return t


def _attach_stats(table: pa.Table, batches: List[Batch],
                  decimal_overrides) -> None:
    """Table-global (min, max) per integer-lane column
    (velox/exec/VectorHasher.h:127 stats analog; drives narrow lanes)."""
    import dataclasses

    import pyarrow.compute as pc

    for cname in table.column_names:
        arr = table.column(cname)
        t = arr.type
        try:
            if pa.types.is_integer(t):
                a2 = arr
            elif pa.types.is_date32(t):
                a2 = arr.cast(pa.int32())
            else:
                continue
            mm = pc.min_max(a2)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
        except Exception:
            continue
        if lo is None:
            continue
        for bi, b in enumerate(batches):
            col = b.columns[cname]
            batches[bi] = b.with_column(
                cname, dataclasses.replace(col, stats=(int(lo), int(hi))))


def _unify_dictionaries(
    table: pa.Table, batches: List[Batch], cap: int, batch_rows: int
) -> List[Batch]:
    """Re-encode string splits against one sorted table-global dictionary."""
    out = batches
    for cname in table.column_names:
        col0 = batches[0].columns[cname]
        if col0.dictionary is None:
            continue
        arr = table.column(cname)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        uniq = sorted(set(v for v in arr.to_pylist() if v is not None))
        global_dict = Dictionary(uniq)
        for bi, b in enumerate(out):
            col = b.columns[cname]
            # host remap: old codes -> global codes
            old = col.dictionary
            remap = np.full(len(old) + 1, -1, dtype=np.int32)
            remap[1:] = [global_dict.code_of(v) for v in old.values]
            codes = np.asarray(col.values)
            new_codes = remap[np.clip(codes, -1, len(old) - 1) + 1]
            newcol = Column(
                col.dtype, jnp.asarray(new_codes), col.valid, global_dict)
            out[bi] = b.with_column(cname, newcol)
    return out


def register_parquet(name: str, path: str, batch_rows: int = 1 << 20) -> Table:
    import pyarrow.parquet as pq

    return register_arrow(name, pq.read_table(path), batch_rows)


def get_table(name: str) -> Table:
    try:
        return _TABLES[name]
    except KeyError:
        raise KeyError(f"no table {name!r}; registered: {sorted(_TABLES)}")


def drop_table(name: str) -> None:
    _TABLES.pop(name, None)


def list_tables() -> List[str]:
    return sorted(_TABLES)
