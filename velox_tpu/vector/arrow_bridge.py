"""Arrow <-> device Batch bridge.

Analog of velox/vector/arrow/Bridge.h:80,127 (zero-copy Arrow C-ABI import/
export). Here the bridge is the *host ingest path*: Arrow columnar buffers →
padded device arrays (one H2D transfer per column), with strings dictionary-
encoded on host. Export materializes active rows back into an Arrow table —
the result surface used by tests and the oracle comparison.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from velox_tpu.types import (
    DataType, BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER, REAL, SMALLINT,
    TINYINT, TIMESTAMP, VARCHAR,
)
from velox_tpu.types.types import DecimalType, TypeKind
from velox_tpu.vector.batch import Batch, round_capacity
from velox_tpu.vector.column import Column, Dictionary

_ARROW_TO_TYPE = {
    pa.bool_(): BOOLEAN,
    pa.int8(): TINYINT,
    pa.int16(): SMALLINT,
    pa.int32(): INTEGER,
    pa.int64(): BIGINT,
    pa.float32(): REAL,
    pa.float64(): DOUBLE,
    pa.string(): VARCHAR,
    pa.large_string(): VARCHAR,
    pa.date32(): DATE,
}


def type_from_arrow(at: pa.DataType) -> DataType:
    if at in _ARROW_TO_TYPE:
        return _ARROW_TO_TYPE[at]
    if pa.types.is_decimal(at):
        return DecimalType(TypeKind.DECIMAL, at.precision, at.scale)
    if pa.types.is_timestamp(at):
        return TIMESTAMP
    if pa.types.is_dictionary(at):
        return type_from_arrow(at.value_type)
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        from velox_tpu.types.types import array as array_type
        return array_type(type_from_arrow(at.value_type))
    if pa.types.is_map(at):
        from velox_tpu.types.types import MapType, TypeKind as TK
        return MapType(TK.MAP, type_from_arrow(at.key_type),
                       type_from_arrow(at.item_type))
    raise TypeError(f"unsupported arrow type {at}")


def type_to_arrow(t: DataType) -> pa.DataType:
    from velox_tpu.types.types import ArrayType

    if isinstance(t, DecimalType):
        return pa.decimal128(t.precision, t.scale)
    if isinstance(t, ArrayType):
        return pa.list_(type_to_arrow(t.element))
    from velox_tpu.types.types import MapType as _MT, RowType as _RT
    if isinstance(t, _MT):
        return pa.map_(type_to_arrow(t.key), type_to_arrow(t.value))
    if isinstance(t, _RT):
        return pa.struct([
            pa.field(n, type_to_arrow(c))
            for n, c in zip(t.names, t.children)])
    rev = {
        TypeKind.BOOLEAN: pa.bool_(), TypeKind.TINYINT: pa.int8(),
        TypeKind.SMALLINT: pa.int16(), TypeKind.INTEGER: pa.int32(),
        TypeKind.BIGINT: pa.int64(), TypeKind.REAL: pa.float32(),
        TypeKind.DOUBLE: pa.float64(), TypeKind.VARCHAR: pa.string(),
        # VARBINARY blobs in this engine are ASCII (digest format) —
        # exported as arrow strings
        TypeKind.VARBINARY: pa.string(),
        TypeKind.DATE: pa.date32(), TypeKind.TIMESTAMP: pa.timestamp("us"),
        # intervals export as their physical lanes (ms / months)
        TypeKind.INTERVAL_DAY_TIME: pa.int64(),
        TypeKind.INTERVAL_YEAR_MONTH: pa.int32(),
    }
    return rev[t.kind]


def _ingest_array(arr: pa.ChunkedArray, cap: int) -> Column:
    """One Arrow column -> padded device Column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = type_from_arrow(arr.type)
    n = len(arr)

    if pa.types.is_map(arr.type):
        from velox_tpu.vector.column import MapColumn
        offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        starts = np.zeros(cap, dtype=np.int32)
        lengths = np.zeros(cap, dtype=np.int32)
        starts[:n] = offsets[:-1]
        lengths[:n] = np.diff(offsets)
        null_mask = arr.is_null().to_numpy(zero_copy_only=False)
        lengths[:n] = np.where(null_mask, 0, lengths[:n])
        valid = None
        if null_mask.any():
            v = np.zeros(cap, dtype=bool)
            v[:n] = ~null_mask
            valid = jnp.asarray(v)
        ecap = max(128, 1 << (max(len(arr.keys), 1) - 1).bit_length())
        keys = _ingest_array(arr.keys, ecap)
        values = _ingest_array(arr.items, ecap)
        return MapColumn(t, jnp.asarray(starts), jnp.asarray(lengths),
                         keys, values, valid)

    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        # offsets+sizes+flat-child, the ArrayVector layout
        # (velox/vector/ComplexVector.h:571)
        from velox_tpu.vector.column import ArrayColumn
        offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        starts = np.zeros(cap, dtype=np.int32)
        lengths = np.zeros(cap, dtype=np.int32)
        starts[:n] = offsets[:-1]
        lengths[:n] = np.diff(offsets)
        null_mask = arr.is_null().to_numpy(zero_copy_only=False)
        lengths[:n] = np.where(null_mask, 0, lengths[:n])
        valid = None
        if null_mask.any():
            v = np.zeros(cap, dtype=bool)
            v[:n] = ~null_mask
            valid = jnp.asarray(v)
        flat = arr.values  # pa.Array of elements
        ecap = max(128, 1 << (max(len(flat), 1) - 1).bit_length())
        elements = _ingest_array(flat, ecap)
        return ArrayColumn(t, jnp.asarray(starts), jnp.asarray(lengths),
                           elements, valid)

    if t.is_string:
        # dictionary-encode on host (Arrow does this vectorized in C++)
        if not pa.types.is_dictionary(arr.type):
            arr = arr.dictionary_encode()
        dict_vals = arr.dictionary.to_pylist()
        null_mask = arr.is_null().to_numpy(zero_copy_only=False)
        # fill nulls before to_numpy: null indices otherwise surface as NaN
        codes = arr.indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int32)
        codes = np.where(null_mask, -1, codes)
        vals = np.full(cap, -1, dtype=np.int32)
        vals[:n] = codes
        valid = None
        if null_mask.any():
            v = np.zeros(cap, dtype=bool)
            v[:n] = ~null_mask
            valid = jnp.asarray(v)
        return Column(t, jnp.asarray(vals), valid, Dictionary(dict_vals))

    if pa.types.is_decimal(arr.type):
        # unscaled int64 lane. LONG decimals (p > 18) ingest as long as
        # every VALUE fits int64 (~1.8e19 unscaled) — the common case
        # for decimal(38) columns in practice; true 128-bit values are
        # rejected loudly rather than wrapped (documented deviation
        # from velox's HugeInt lanes, velox/type/HugeInt.h).
        try:
            import decimal as _dec

            _ctx = _dec.Context(prec=60)
            np_vals = np.array(
                [0 if v is None
                 else int(v.scaleb(arr.type.scale, _ctx))
                 for v in arr.to_pylist()], dtype=np.int64)
        except OverflowError as e:
            raise OverflowError(
                f"decimal({arr.type.precision},{arr.type.scale}) column "
                "holds values beyond int64 unscaled range; 128-bit "
                "decimal lanes are not supported") from e
    elif pa.types.is_date32(arr.type):
        np_vals = arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
    elif pa.types.is_timestamp(arr.type):
        np_vals = arr.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
    else:
        np_vals = arr.to_numpy(zero_copy_only=False)

    null_mask = arr.is_null().to_numpy(zero_copy_only=False)
    if null_mask.any():
        np_vals = np.where(null_mask, 0, np_vals)
    vals = np.zeros(cap, dtype=t.dtype)
    vals[:n] = np_vals.astype(t.dtype, copy=False)
    if 0 < n < cap:
        # pad the tail by REPLICATING the last value, not zeros:
        # padding is sel-masked everywhere, and this keeps ascending
        # lanes ascending through the tail so the merge-join flipped
        # probe's raw lane check holds on partial final batches (the
        # SF2 Q18 regression — exec/operators.py _probe_sorted)
        vals[n:] = vals[n - 1]
    valid = None
    if null_mask.any():
        v = np.zeros(cap, dtype=bool)
        v[:n] = ~null_mask
        valid = jnp.asarray(v)
    return Column(t, jnp.asarray(vals), valid)


def from_arrow(table: pa.Table, capacity: Optional[int] = None) -> Batch:
    n = table.num_rows
    cap = capacity if capacity is not None else round_capacity(n)
    cols = {
        name: _ingest_array(table.column(name), cap)
        for name in table.column_names
    }
    sel = np.zeros(cap, dtype=bool)
    sel[:n] = True
    return Batch(cols, jnp.asarray(sel), num_rows=n)


def to_arrow(batch: Batch) -> pa.Table:
    """Materialize active rows into an Arrow table (host gather)."""
    from velox_tpu.types.widedec import parse_lane

    data = batch.to_pydict()
    # long-decimal lane triples reassemble to one decimal128 column
    # (types/widedec.py; the inverse of io/catalog.shred_wide_decimals)
    wide: dict = {}
    for name in batch.columns:
        pl = parse_lane(name)
        if pl is not None:
            base, digit, scale = pl
            wide.setdefault((base, scale), {})[digit] = name
    wide = {k: v for k, v in wide.items() if set(v) == {0, 1, 2}}
    wide_lane_names = {n for v in wide.values() for n in v.values()}

    arrays = {}
    emitted_wide = set()
    for name, col in batch.columns.items():
        if name in wide_lane_names:
            pl = parse_lane(name)
            base, _d, scale = pl
            if (base, scale) in emitted_wide:
                continue
            emitted_wide.add((base, scale))
            lanes = wide[(base, scale)]
            import decimal

            d2 = data[lanes[2]]
            d1 = data[lanes[1]]
            d0 = data[lanes[0]]
            cnt = data.get(f"{base}#wn")
            out = []
            for i in range(len(d2)):
                if d2[i] is None:
                    out.append(None)
                    continue
                v = (int(d2[i]) << 84) + (int(d1[i]) << 42) + int(d0[i])
                if cnt is not None:  # avg: divide, round half away
                    n = int(cnt[i]) if cnt[i] else 0
                    if n == 0:
                        out.append(None)
                        continue
                    sgn = -1 if v < 0 else 1
                    v = sgn * ((2 * abs(v) + n) // (2 * n))
                if abs(v) >= 10 ** 38:
                    # DECIMAL(38) overflow -> NULL (the engine's
                    # row-error convention; Presto throws)
                    out.append(None)
                    continue
                out.append(decimal.Decimal(v).scaleb(
                    -scale, decimal.Context(prec=60)))
            arrays[base] = pa.array(out, type=pa.decimal128(38, scale))
            continue
        if (name.endswith("#wn")
                and name[:-3] in {b for b, _s in wide}):
            continue  # avg divisor column, consumed above
        at = type_to_arrow(col.dtype)
        vals = data[name]
        if isinstance(col.dtype, DecimalType):
            import decimal
            s = col.dtype.scale
            ctx = decimal.Context(prec=60)
            vals = [
                None if v is None
                else decimal.Decimal(int(v)).scaleb(-s, ctx)
                for v in vals
            ]
            # pyarrow rejects declared precisions that disagree with
            # the width it infers from the first element (seen at SF10
            # where sums span 15+ digits); decimal128(38, s) accepts
            # every valid value
            at = pa.decimal128(38, s)
        arrays[name] = pa.array(vals, type=at)
    if any("." in n for n in arrays):
        return _restruct(arrays)
    return pa.table(arrays)


def _restruct(arrays: Dict[str, pa.Array]) -> pa.Table:
    """Reassemble shredded "s.f" leaf columns into StructArrays so the
    arrow output round-trips the ingested nesting (inverse of
    io/catalog.flatten_structs)."""
    groups: Dict[str, Dict[str, pa.Array]] = {}
    out: Dict[str, object] = {}
    for name, arr in arrays.items():
        if "." in name:
            head, rest = name.split(".", 1)
            groups.setdefault(head, {})[rest] = arr
            out.setdefault(head, None)
        else:
            out[name] = arr
    for head, fields in groups.items():
        sub = (_restruct(fields).columns if any(
            "." in f for f in fields) else list(fields.values()))
        names = (list(_restruct(fields).column_names) if any(
            "." in f for f in fields) else list(fields))
        out[head] = pa.StructArray.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in sub], names=names)
    return pa.table(out)


def from_pydict(data: Dict[str, Sequence], types: Dict[str, DataType],
                capacity: Optional[int] = None) -> Batch:
    return Batch.from_pydict(data, types, capacity)


def to_pydict(batch: Batch) -> Dict[str, list]:
    return batch.to_pydict()
