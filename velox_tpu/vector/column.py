"""Column: fixed-width device value lane + validity + optional dictionary.

Replaces velox/vector/FlatVector.h:34 and DictionaryVector.h:30 with a single
SoA representation. Validity follows Velox's null convention inverted for
clarity: ``valid[i] == True`` means row i is non-null (Velox stores 1 =
non-null too, velox/common/base/Nulls.h). ``valid is None`` means
all-non-null and lets kernels skip mask work entirely — the common TPC-H case.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import DataType, TypeKind


class Dictionary:
    """Host-side value table for string columns.

    Device arrays hold int32 codes indexing this table. Code -1 is reserved
    for "null/padding" so gathers on padded rows stay in range after
    clamping. Dictionaries are immutable and shared by reference between
    columns/batches (cheap slicing/wrap like Velox's wrapInDictionary,
    velox/vector/BaseVector.h wrapInDictionary).
    """

    __slots__ = ("values", "_index")

    def __init__(self, values: Sequence[str]):
        self.values = np.asarray(values, dtype=object)
        self._index = {v: i for i, v in enumerate(self.values)}

    def __len__(self) -> int:
        return len(self.values)

    def code_of(self, value: str) -> int:
        """Code for a string literal, or -2 if absent (never matches)."""
        return self._index.get(value, -2)

    def codes_of(self, values: Sequence[str]) -> list:
        return [self.code_of(v) for v in values]

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """Host-side gather codes -> strings (None for negative codes)."""
        out = np.empty(len(codes), dtype=object)
        codes = np.asarray(codes)
        in_range = codes >= 0
        out[~in_range] = None
        out[in_range] = self.values[codes[in_range]]
        return out

    @staticmethod
    def encode(values: Sequence) -> tuple["Dictionary", np.ndarray]:
        """Build a dictionary + codes from raw strings; None -> code -1."""
        arr = np.asarray(values, dtype=object)
        mask = np.array([v is not None for v in arr], dtype=bool)
        uniq, inv = np.unique(arr[mask].astype(str), return_inverse=True)
        codes = np.full(len(arr), -1, dtype=np.int32)
        codes[mask] = inv.astype(np.int32)
        return Dictionary(list(uniq)), codes


@dataclass(frozen=True)
class Column:
    """One column of a Batch. ``values`` has the batch's static capacity."""

    dtype: DataType
    values: jax.Array                      # (capacity,) device array
    valid: Optional[jax.Array] = None      # (capacity,) bool, None = all valid
    dictionary: Optional[Dictionary] = None
    #: table-global (min, max) of the raw lane values — the VectorHasher
    #: stats analog (velox/exec/VectorHasher.h:127): drives narrow-lane
    #: decisions and kArray/normalized-key modes
    stats: Optional[tuple] = None

    @property
    def capacity(self) -> int:
        return self.values.shape[0]

    @property
    def is_dictionary(self) -> bool:
        return self.dictionary is not None

    def validity(self) -> jax.Array:
        """Materialized validity mask (DecodedVector analog)."""
        if self.valid is not None:
            return self.valid
        return jnp.ones((self.capacity,), dtype=jnp.bool_)

    def with_values(self, values: jax.Array) -> "Column":
        return replace(self, values=values)

    def with_valid(self, valid: Optional[jax.Array]) -> "Column":
        return replace(self, valid=valid)

    def gather(self, indices: jax.Array) -> "Column":
        """Row gather (dictionary wrap analog: indices select base rows).

        ``indices`` may point anywhere in [0, capacity); callers mask out
        garbage rows via the batch selection mask.
        """
        vals = jnp.take(self.values, indices, mode="clip")
        valid = (
            jnp.take(self.valid, indices, mode="clip")
            if self.valid is not None else None
        )
        return Column(self.dtype, vals, valid, self.dictionary, self.stats)

    def to_numpy(self, num_rows: Optional[int] = None):
        """Host copy of value lane (first num_rows rows)."""
        v = np.asarray(self.values)
        return v[:num_rows] if num_rows is not None else v

    def to_pylist(self, num_rows: Optional[int] = None) -> list:
        """Host materialization with nulls + dictionary decode."""
        vals = self.to_numpy(num_rows)
        if self.dictionary is not None:
            decoded = self.dictionary.decode(vals)
        else:
            decoded = vals
        if self.valid is None:
            return list(decoded)
        valid = np.asarray(self.valid)
        valid = valid[: len(vals)]
        return [decoded[i] if valid[i] else None for i in range(len(vals))]


@dataclass(frozen=True)
class ArrayColumn:
    """Variable-length array column: Arrow-style offsets + flat elements.

    Replaces velox/vector/ComplexVector.h:571 (ArrayVector: offsets +
    sizes + flat elements child) with static-shape device arrays:
    ``starts``/``lengths`` live at the batch's capacity, ``elements`` is a
    flat :class:`Column` with its own (independent) capacity. Rows of the
    batch can therefore be gathered/filtered without touching element
    storage — the wrap-in-dictionary trick for complex types.
    """

    dtype: DataType                        # ArrayType
    starts: jax.Array                      # (capacity,) int32 into elements
    lengths: jax.Array                     # (capacity,) int32
    elements: Column                       # flat element column
    valid: Optional[jax.Array] = None      # (capacity,) bool, None = all valid
    #: compat attributes so generic column loops (dictionary peeling,
    #: stats-driven narrowing) skip array columns without isinstance checks
    dictionary = None
    stats = None

    @property
    def capacity(self) -> int:
        return self.starts.shape[0]

    def validity(self) -> jax.Array:
        if self.valid is not None:
            return self.valid
        return jnp.ones((self.capacity,), dtype=jnp.bool_)

    def gather(self, indices: jax.Array) -> "ArrayColumn":
        """Row gather: offsets move, flat elements are shared unchanged."""
        starts = jnp.take(self.starts, indices, mode="clip")
        lengths = jnp.take(self.lengths, indices, mode="clip")
        valid = (
            jnp.take(self.valid, indices, mode="clip")
            if self.valid is not None else None
        )
        return ArrayColumn(self.dtype, starts, lengths, self.elements, valid)

    def to_pylist(self, num_rows: Optional[int] = None) -> list:
        starts = np.asarray(self.starts)[:num_rows]
        lengths = np.asarray(self.lengths)[:num_rows]
        elems = self.elements.to_pylist()
        valid = (
            np.asarray(self.valid)[: len(starts)]
            if self.valid is not None else None
        )
        out = []
        for i in range(len(starts)):
            if valid is not None and not valid[i]:
                out.append(None)
            else:
                out.append(elems[starts[i]: starts[i] + lengths[i]])
        return out


@dataclass(frozen=True)
class MapColumn:
    """MAP column: Arrow-style offsets + flat key/value lanes.

    Replaces velox/vector/ComplexVector.h:589 (MapVector: offsets + sizes
    + keys child + values child). Same static-shape discipline as
    ArrayColumn: ``starts``/``lengths`` live at batch capacity; ``keys``
    and ``values`` are flat Columns with their own shared capacity. Keys
    are unique per map (SQL MAP invariant) — lookups exploit this by
    summing the single hit instead of searching.
    """

    dtype: DataType                        # MapType
    starts: jax.Array                      # (capacity,) int32
    lengths: jax.Array                     # (capacity,) int32
    keys: Column                           # flat key column
    values: Column                         # flat value column (same cap)
    valid: Optional[jax.Array] = None
    dictionary = None
    stats = None

    @property
    def capacity(self) -> int:
        return self.starts.shape[0]

    def validity(self) -> jax.Array:
        if self.valid is not None:
            return self.valid
        return jnp.ones((self.capacity,), dtype=jnp.bool_)

    def gather(self, indices: jax.Array) -> "MapColumn":
        starts = jnp.take(self.starts, indices, mode="clip")
        lengths = jnp.take(self.lengths, indices, mode="clip")
        valid = (
            jnp.take(self.valid, indices, mode="clip")
            if self.valid is not None else None
        )
        return MapColumn(self.dtype, starts, lengths, self.keys,
                         self.values, valid)

    def to_pylist(self, num_rows: Optional[int] = None) -> list:
        starts = np.asarray(self.starts)[:num_rows]
        lengths = np.asarray(self.lengths)[:num_rows]
        ks = self.keys.to_pylist()
        vs = self.values.to_pylist()
        valid = (np.asarray(self.valid)[: len(starts)]
                 if self.valid is not None else None)
        out = []
        for i in range(len(starts)):
            if valid is not None and not valid[i]:
                out.append(None)
            else:
                s, ln = starts[i], lengths[i]
                # entry list, not dict: MAP entries may legitimately
                # repeat keys (split_to_multimap) and arrow accepts
                # (k, v) tuple lists for map arrays
                out.append(list(zip(ks[s: s + ln], vs[s: s + ln])))
        return out


@dataclass(frozen=True)
class RowColumn:
    """ROW (struct) column: named child columns at the batch capacity.

    Replaces velox/vector/ComplexVector.h:31 (RowVector: struct-of-
    children). Scans never produce these — struct columns SHRED to
    dotted leaf columns at ingest (io/catalog.py flatten_structs) — but
    expressions can build them (``row_constructor``) and array-typed
    functions can carry them as element columns (``map_entries``,
    ``zip`` -> ARRAY(ROW(...))). Children may themselves be Row/Array/
    Map columns. A null row leaves its children's values as padding
    (Presto ROW semantics: the row itself null, fields unreadable).
    """

    dtype: DataType                        # RowType
    children: tuple                        # of columns, each at capacity
    valid: Optional[jax.Array] = None
    dictionary = None
    stats = None

    @property
    def capacity(self) -> int:
        return self.children[0].capacity

    @property
    def names(self) -> tuple:
        return tuple(self.dtype.names)

    def child(self, name: str):
        return self.children[self.dtype.index_of(name)]

    def validity(self) -> jax.Array:
        if self.valid is not None:
            return self.valid
        return jnp.ones((self.capacity,), dtype=jnp.bool_)

    def gather(self, indices: jax.Array) -> "RowColumn":
        kids = tuple(c.gather(indices) for c in self.children)
        valid = (jnp.take(self.valid, indices, mode="clip")
                 if self.valid is not None else None)
        return RowColumn(self.dtype, kids, valid)

    def to_pylist(self, num_rows: Optional[int] = None) -> list:
        kids = [c.to_pylist(num_rows) for c in self.children]
        n = len(kids[0]) if kids else 0
        valid = (np.asarray(self.valid)[:n]
                 if self.valid is not None else None)
        names = self.names
        return [
            None if valid is not None and not valid[i]
            else {nm: kids[j][i] for j, nm in enumerate(names)}
            for i in range(n)
        ]


def make_row_column(dtype: DataType, data: Sequence,
                    capacity: int) -> RowColumn:
    """Host list-of-dicts -> RowColumn (None -> null row)."""
    n = len(data)
    has_null = any(row is None for row in data)
    kids = []
    for nm, ct in zip(dtype.names, dtype.children):
        vals = [None if row is None else row.get(nm) for row in data]
        if ct.kind == TypeKind.ROW:
            kids.append(make_row_column(ct, vals, capacity))
        elif ct.kind == TypeKind.ARRAY:
            kids.append(make_array_column(ct, vals, capacity))
        elif ct.kind == TypeKind.MAP:
            kids.append(make_map_column(ct, vals, capacity))
        else:
            kids.append(make_column(ct, vals, capacity)[0])
    valid = None
    if has_null:
        v = np.zeros(capacity, dtype=bool)
        v[:n] = np.array([row is not None for row in data], dtype=bool)
        valid = jnp.asarray(v)
    return RowColumn(dtype, tuple(kids), valid)


def make_map_column(dtype: DataType, data: Sequence,
                    capacity: int) -> MapColumn:
    """Host list-of-dicts -> MapColumn (None -> null row)."""
    n = len(data)
    starts = np.zeros(capacity, dtype=np.int32)
    lengths = np.zeros(capacity, dtype=np.int32)
    flat_k: list = []
    flat_v: list = []
    has_null = False
    for i, row in enumerate(data):
        starts[i] = len(flat_k)
        if row is None:
            has_null = True
        else:
            lengths[i] = len(row)
            for k, v in row.items():
                flat_k.append(k)
                flat_v.append(v)
    valid = None
    if has_null:
        v = np.zeros(capacity, dtype=bool)
        v[:n] = np.array([row is not None for row in data], dtype=bool)
        valid = jnp.asarray(v)
    ecap = max(128, 1 << (max(len(flat_k), 1) - 1).bit_length())
    keys, _ = make_column(dtype.key, flat_k, ecap)
    values, _ = make_column(dtype.value, flat_v, ecap)
    return MapColumn(dtype, jnp.asarray(starts), jnp.asarray(lengths),
                     keys, values, valid)


def make_array_column(
    dtype: DataType, data: Sequence, capacity: int
) -> ArrayColumn:
    """Host list-of-lists -> ArrayColumn (None -> null row, length 0)."""
    n = len(data)
    starts = np.zeros(capacity, dtype=np.int32)
    lengths = np.zeros(capacity, dtype=np.int32)
    flat: list = []
    has_null = False
    for i, row in enumerate(data):
        starts[i] = len(flat)
        if row is None:
            has_null = True
        else:
            lengths[i] = len(row)
            flat.extend(row)
    valid = None
    if has_null:
        v = np.zeros(capacity, dtype=bool)
        v[:n] = np.array([row is not None for row in data], dtype=bool)
        valid = jnp.asarray(v)
    # elements get their own lane-padded power-of-two capacity
    ecap = max(128, 1 << (max(len(flat), 1) - 1).bit_length())
    from velox_tpu.types.types import ArrayType as _AT

    if isinstance(dtype.element, _AT):
        elements = make_array_column(dtype.element, flat, ecap)
    else:
        elements, _ = make_column(dtype.element, flat, ecap)
    return ArrayColumn(
        dtype, jnp.asarray(starts), jnp.asarray(lengths), elements, valid)


def make_column(
    dtype: DataType,
    data: Sequence,
    capacity: Optional[int] = None,
) -> tuple[Column, int]:
    """Host list/array -> padded device Column. Returns (column, num_rows)."""
    n = len(data)
    cap = capacity if capacity is not None else n
    assert cap >= n
    if dtype.is_string:
        dictionary, codes = Dictionary.encode(data)
        vals = np.full(cap, -1, dtype=np.int32)
        vals[:n] = codes
        valid_np = codes >= 0
        has_null = not valid_np.all()
        valid = None
        if has_null:
            v = np.zeros(cap, dtype=bool)
            v[:n] = valid_np
            valid = jnp.asarray(v)
        return Column(dtype, jnp.asarray(vals), valid, dictionary), n

    arr = np.asarray(
        [0 if x is None else x for x in data], dtype=dtype.dtype
    )
    has_null = any(x is None for x in data)
    vals = np.zeros(cap, dtype=dtype.dtype)
    vals[:n] = arr
    valid = None
    if has_null:
        v = np.zeros(cap, dtype=bool)
        v[:n] = np.array([x is not None for x in data], dtype=bool)
        valid = jnp.asarray(v)
    return Column(dtype, jnp.asarray(vals), valid), n
