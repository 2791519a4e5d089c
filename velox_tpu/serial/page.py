"""Wire formats: columnar SerializedPage + row-major CompactRow.

The analog of velox/serializers (PrestoSerializer.h:49 — columnar pages
with encodings preserved, optional compression, checksums; used by both
exchange and spill via exec/SerializedPage.h) and of the row-wise serdes
(serializers/CompactRowSerializer.h, row/CompactRow.h:23 — null bits +
fixed-width fields per row, the Spark-shuffle layout).

TPU-native framing: columns are already fixed-width SoA lanes (string
columns are int32 dictionary codes), so a page is raw lane bytes + a
validity bitmap per column + the dictionary table — encodings are
*preserved* across the wire like PrestoPage's preserve-encodings mode,
which is what keeps re-ingest on the consumer a pure memcpy + H2D. The
CompactRow form packs the same lanes row-major through one numpy
structured-array view (vectorized transpose, no per-row loop).

Layout (both forms):
  [u32 magic][u8 version][u8 flags][u32 crc32 of body][u32 header_len]
  [header json utf-8][body]
flags bit0 = zlib-compressed body. The header carries schema, row count,
and dictionaries; the body carries lanes (page) or packed rows (compact).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from velox_tpu.types.types import DataType, DecimalType, TypeKind
from velox_tpu.vector.batch import Batch, round_capacity
from velox_tpu.vector.column import Column, Dictionary

_MAGIC = 0x56545047  # "VTPG"
_VERSION = 1
_FLAG_ZLIB = 1
_FLAG_ZSTD = 2


def _type_to_json(t: DataType) -> dict:
    d = {"kind": t.kind.name}
    if isinstance(t, DecimalType):
        d["precision"] = t.precision
        d["scale"] = t.scale
    return d


def _type_from_json(d: dict) -> DataType:
    kind = TypeKind[d["kind"]]
    if kind == TypeKind.DECIMAL:
        return DecimalType(kind, d["precision"], d["scale"])
    return DataType(kind)


def _host_columns(batch: Batch) -> Tuple[Dict[str, tuple], np.ndarray, int]:
    """One device fetch; returns ({name: (values, valid|None)}, rows idx)."""
    device = {"__sel__": batch.sel}
    for name, col in batch.columns.items():
        device[f"v.{name}"] = col.values
        if col.valid is not None:
            device[f"m.{name}"] = col.valid
    host = jax.device_get(device)
    idx = np.nonzero(host["__sel__"])[0]
    out = {}
    for name, col in batch.columns.items():
        vals = host[f"v.{name}"][idx]
        valid = host[f"m.{name}"][idx] if col.valid is not None else None
        out[name] = (vals, valid)
    return out, idx, len(idx)


def _frame(header: dict, body: bytes, compress) -> bytes:
    """``compress``: False | True/"zlib" | "zstd" (preferred on the
    exchange wire — ~3x faster than zlib at similar ratios; velox ships
    lz4/zstd via folly compression, common/compression/Compression.h)."""
    flags = 0
    if compress == "zstd":
        import zstandard

        body = zstandard.ZstdCompressor(level=1).compress(body)
        flags |= _FLAG_ZSTD
    elif compress:
        body = zlib.compress(body, 1)
        flags |= _FLAG_ZLIB
    hj = json.dumps(header, separators=(",", ":")).encode()
    crc = zlib.crc32(body)
    return (struct.pack("<IBBII", _MAGIC, _VERSION, flags, crc, len(hj))
            + hj + body)


def _unframe(buf: bytes) -> Tuple[dict, bytes]:
    magic, version, flags, crc, hlen = struct.unpack_from("<IBBII", buf, 0)
    assert magic == _MAGIC and version == _VERSION, "bad page frame"
    off = struct.calcsize("<IBBII")
    header = json.loads(buf[off: off + hlen].decode())
    body = buf[off + hlen:]
    assert zlib.crc32(body) == crc, "page checksum mismatch"
    if flags & _FLAG_ZSTD:
        import zstandard

        body = zstandard.ZstdDecompressor().decompress(body)
    elif flags & _FLAG_ZLIB:
        body = zlib.decompress(body)
    return header, body


def _header_of(batch: Batch, rows: int, cols: Dict[str, tuple],
               layout: str) -> dict:
    columns = []
    for name, col in batch.columns.items():
        vals, valid = cols[name]
        columns.append({
            "name": name,
            "type": _type_to_json(col.dtype),
            "lane": vals.dtype.str,
            "nulls": valid is not None,
            "dict": (None if col.dictionary is None
                     else list(col.dictionary.values)),
            "stats": ([int(x) for x in col.stats]
                      if col.stats is not None else None),
        })
    return {"layout": layout, "rows": rows, "columns": columns}


# ------------------------------------------------------------------- page

def serialize_page(batch: Batch, compress: bool = False) -> bytes:
    """Columnar page: active rows only, per-column lane bytes + validity
    bitmap, dictionaries preserved (PrestoPage preserve-encodings)."""
    cols, _, rows = _host_columns(batch)
    parts: List[bytes] = []
    for name in batch.columns:
        vals, valid = cols[name]
        parts.append(np.ascontiguousarray(vals).tobytes())
        if valid is not None:
            parts.append(np.packbits(valid).tobytes())
    return _frame(_header_of(batch, rows, cols, "page"),
                  b"".join(parts), compress)


def deserialize_page(buf: bytes) -> Batch:
    header, body = _unframe(buf)
    assert header["layout"] == "page"
    rows = header["rows"]
    cap = round_capacity(max(rows, 1))
    import jax.numpy as jnp

    off = 0
    cols: Dict[str, Column] = {}
    for c in header["columns"]:
        lane = np.dtype(c["lane"])
        nbytes = rows * lane.itemsize
        vals = np.frombuffer(body, lane, count=rows, offset=off)
        off += nbytes
        padded = np.zeros(cap, dtype=lane)
        padded[:rows] = vals
        valid = None
        if c["nulls"]:
            vb = (rows + 7) // 8
            bits = np.unpackbits(
                np.frombuffer(body, np.uint8, count=vb, offset=off))[:rows]
            off += vb
            v = np.zeros(cap, dtype=bool)
            v[:rows] = bits.astype(bool)
            valid = jnp.asarray(v)
        d = Dictionary(c["dict"]) if c["dict"] is not None else None
        stats = tuple(c["stats"]) if c["stats"] else None
        cols[c["name"]] = Column(
            _type_from_json(c["type"]), jnp.asarray(padded), valid, d,
            stats)
    sel = np.zeros(cap, dtype=bool)
    sel[:rows] = True
    return Batch(cols, jnp.asarray(sel), num_rows=rows)


# ----------------------------------------------------------- compact row

def serialize_compact_rows(batch: Batch, compress: bool = False) -> bytes:
    """Row-major form: one numpy structured record per row (null bitmap
    byte(s) + every fixed-width lane), built with a single vectorized
    assignment per column — the CompactRow layout (row/CompactRow.h:23)
    without per-row writes."""
    cols, _, rows = _host_columns(batch)
    names = list(batch.columns)
    nullbytes = (len(names) + 7) // 8
    fields = [("__nulls__", np.uint8, (nullbytes,))] + [
        (f"f{i}", cols[n][0].dtype) for i, n in enumerate(names)]
    rec = np.zeros(rows, dtype=np.dtype(fields))
    nulls = np.zeros((rows, nullbytes * 8), dtype=np.uint8)
    for i, n in enumerate(names):
        vals, valid = cols[n]
        rec[f"f{i}"] = vals
        if valid is not None:
            nulls[:, i] = ~valid
    rec["__nulls__"] = np.packbits(nulls, axis=1)
    return _frame(_header_of(batch, rows, cols, "compact"),
                  rec.tobytes(), compress)


def deserialize_compact_rows(buf: bytes) -> Batch:
    header, body = _unframe(buf)
    assert header["layout"] == "compact"
    rows = header["rows"]
    cap = round_capacity(max(rows, 1))
    import jax.numpy as jnp

    names = [c["name"] for c in header["columns"]]
    nullbytes = (len(names) + 7) // 8
    fields = [("__nulls__", np.uint8, (nullbytes,))] + [
        (f"f{i}", np.dtype(c["lane"]))
        for i, c in enumerate(header["columns"])]
    rec = np.frombuffer(body, dtype=np.dtype(fields), count=rows)
    nulls = np.unpackbits(rec["__nulls__"], axis=1) if rows else (
        np.zeros((0, nullbytes * 8), np.uint8))
    cols: Dict[str, Column] = {}
    for i, c in enumerate(header["columns"]):
        lane = np.dtype(c["lane"])
        padded = np.zeros(cap, dtype=lane)
        padded[:rows] = rec[f"f{i}"]
        valid = None
        if c["nulls"]:
            v = np.zeros(cap, dtype=bool)
            v[:rows] = nulls[:, i] == 0
            valid = jnp.asarray(v)
        d = Dictionary(c["dict"]) if c["dict"] is not None else None
        stats = tuple(c["stats"]) if c["stats"] else None
        cols[c["name"]] = Column(
            _type_from_json(c["type"]), jnp.asarray(padded), valid, d,
            stats)
    sel = np.zeros(cap, dtype=bool)
    sel[:rows] = True
    return Batch(cols, jnp.asarray(sel), num_rows=rows)
