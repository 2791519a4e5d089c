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
from velox_tpu.utils import replay as _replay
from velox_tpu.vector.column import Column, Dictionary
from velox_tpu.vector.arrow_bridge import _ingest_array, type_from_arrow


@dataclass
class Table:
    name: str
    schema: RowType
    batches: List[Batch]
    #: struct columns SHREDDED at ingest: "s" -> ["s.f1", "s.f2", ...]
    #: (columnar subfield layout — velox/type/Subfield.h paths become
    #: plain column names; scanning "s" expands to its leaves, scanning
    #: "s.f1" prunes to one leaf)
    struct_groups: Dict[str, List[str]] = None  # type: ignore
    #: long-decimal columns shredded to digit lanes (types/widedec.py)
    wide_groups: Dict[str, List[str]] = None  # type: ignore
    #: columns verified nondecreasing in storage order at ingest — the
    #: physical-ordering metadata a cost-based optimizer reads (velox keeps
    #: the analog in connector table layout / PlanNode ordering metadata);
    #: drives the sort-order property pass (plan/optimizer.py)
    sorted_cols: frozenset = frozenset()
    #: subset of sorted_cols that are strictly increasing (hence unique)
    unique_cols: frozenset = frozenset()

    @property
    def num_rows(self) -> int:
        return sum(b.num_rows or 0 for b in self.batches)

    def make_splits(self, columns: Sequence[str],
                    subfilter=None) -> List[Batch]:
        """Splits for one TableScan. In-memory tables ignore pushdown
        (device subfilter handles it); file-backed tables override to
        prune row groups / columns before decode (the ScanSpec contract,
        velox/dwio/common/ScanSpec.h:41)."""
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.scan.read_split", self)
        return list(self.batches)


_TABLES: Dict[str, Table] = {}


def register_table(name: str, batches: Sequence[Batch]) -> Table:
    batches = list(batches)
    assert batches, "empty table needs register_arrow with schema"
    t = Table(name, batches[0].schema, batches)
    _TABLES[name] = t
    _replay.catalog_epoch_bump()
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
    table, struct_groups = flatten_structs(table)
    table, wide_groups = shred_wide_decimals(table)
    batches = ingest_splits(table, batch_rows, decimal_overrides)
    sorted_cols, unique_cols = _ordering_stats(table)
    t = Table(name, batches[0].schema, batches,
              sorted_cols=sorted_cols, unique_cols=unique_cols,
              struct_groups=struct_groups, wide_groups=wide_groups)
    _TABLES[name] = t
    _replay.catalog_epoch_bump()
    return t


def flatten_structs(table: pa.Table):
    """Shred struct columns into dotted leaf columns (recursively).

    The TPU answer to nested ROW vectors (velox/vector/ComplexVector.h
    RowVector + type/Subfield.h): structs are struct-of-arrays all the
    way down, so a ROW column IS its leaf columns; subfield pruning is
    then ordinary column pruning. Parent-struct validity merges into
    the leaves (arrow flatten semantics)."""
    groups: Dict[str, List[str]] = {}
    top = [f.name for f in table.schema if pa.types.is_struct(f.type)]
    while any(pa.types.is_struct(f.type) for f in table.schema):
        table = table.flatten()
    for name in top:
        groups[name] = [
            n for n in table.column_names
            if n.startswith(name + ".")]
    return table, groups


def shred_wide_decimals(table: pa.Table):
    """Shred decimal columns whose values exceed int64 unscaled range
    into three signed-digit int64 lanes ``{col}#w{digit}s{scale}``
    (types/widedec.py; velox computes these on int128 —
    velox/type/HugeInt.h, DecimalUtil.h). The decimal scale rides the
    lane names; narrow columns keep the existing single-lane path."""
    from velox_tpu.types.widedec import lane_names, split_ints

    wide: Dict[str, List[str]] = {}
    for f in list(table.schema):
        if not pa.types.is_decimal(f.type):
            continue
        col = table.column(f.name)
        import decimal as _dec

        _ctx = _dec.Context(prec=60)
        vals = [None if v is None
                else int(v.scaleb(f.type.scale, _ctx))
                for v in col.to_pylist()]
        if all(v is None or -(2 ** 63) <= v < 2 ** 63 for v in vals):
            continue
        d2, d1, d0 = split_ints(vals)
        nulls = np.array([v is None for v in vals], dtype=bool)
        idx = table.column_names.index(f.name)
        table = table.remove_column(idx)
        names = lane_names(f.name, f.type.scale)
        for j, arr in enumerate((d2, d1, d0)):
            table = table.add_column(
                idx + j, names[j],
                pa.array(arr, pa.int64(), mask=nulls))
        wide[f.name] = names
    return table, wide


def _ordering_stats(table: pa.Table) -> tuple:
    """Detect physically sorted / strictly-increasing integer-lane columns
    at ingest (one vectorized pass per column)."""
    sorted_cols = set()
    unique_cols = set()
    for cname in table.column_names:
        t = table.column(cname).type
        try:
            if pa.types.is_integer(t):
                a = table.column(cname)
            elif pa.types.is_date32(t):
                a = table.column(cname).cast(pa.int32())
            else:
                continue
            v = a.to_numpy(zero_copy_only=False)
        except Exception:
            continue
        if len(v) == 0 or v.dtype.kind not in "iu":
            continue
        d = np.diff(v)
        if len(d) == 0 or (d >= 0).all():
            sorted_cols.add(cname)
            if len(d) == 0 or (d > 0).all():
                unique_cols.add(cname)
    return frozenset(sorted_cols), frozenset(unique_cols)


def ingest_splits(
    table: pa.Table, batch_rows: int = 1 << 20,
    decimal_overrides: Optional[Dict[str, tuple]] = None,
) -> List[Batch]:
    """Arrow table -> device splits with table-global dictionaries + stats."""
    n = table.num_rows
    batch_rows = min(batch_rows, max(n, 1))
    # lane-rounded, NOT power-of-two: a table split is one fixed shape
    # for the session, so the pow2 shape-bucketing that bounds compile
    # count for intermediates only wastes bandwidth here (6.0M lineitem
    # rows would pad to 8.4M — 40% of every full-width op for nothing)
    cap = max(-(-batch_rows // 128) * 128, 128)

    names = table.column_names
    # encode every string column ONCE over the full table (arrow C++) and
    # sort its dictionary: one vectorized pass replaces per-split encode +
    # python-set unification (was the ingest bottleneck at SF>=1)
    encoded = {
        cname: _encode_string_column(table.column(cname))
        for cname in names
        if type_from_arrow(table.column(cname).type).is_string
    }
    batches: List[Batch] = []
    starts = list(range(0, max(n, 1), batch_rows))
    for start in starts:
        chunk = table.slice(start, batch_rows)
        rows = chunk.num_rows
        # the RAGGED TAIL gets its own lane-rounded capacity: a fixed
        # cap left the last TPC-H SF2 lineitem split 57% padding, and
        # every downstream kernel (streaming agg, merge probes) pays
        # for dead lanes; one extra compile per distinct tail shape
        ccap = (cap if rows == batch_rows
                else max(-(-rows // 128) * 128, 128))
        cols = {}
        for cname in names:
            if cname in encoded:
                gdict, codes_np = encoded[cname]
                vals = np.full(ccap, -1, dtype=np.int32)
                vals[:rows] = codes_np[start:start + rows]
                valid = None
                if (vals[:rows] < 0).any():
                    v = np.zeros(ccap, dtype=bool)
                    v[:rows] = vals[:rows] >= 0
                    valid = jnp.asarray(v)
                cols[cname] = Column(
                    type_from_arrow(chunk.column(cname).type),
                    jnp.asarray(vals), valid, gdict)
            else:
                cols[cname] = _ingest_array(chunk.column(cname), ccap)
        sel = np.zeros(ccap, dtype=bool)
        sel[:rows] = True
        b = Batch(cols, jnp.asarray(sel), num_rows=rows)
        b._prefix_dense = True   # by construction — no sync to re-check
        batches.append(b)
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
    return batches


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


def _encode_string_column(arr) -> tuple:
    """Full-column dictionary encode (arrow C++) with a SORTED global
    dictionary; returns (Dictionary, int32 codes with -1 nulls)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_encode()
    dict_vals = np.asarray(arr.dictionary.to_pylist(), dtype=object)
    if len(dict_vals) == 0:  # all-null column
        return (Dictionary([]),
                np.full(len(arr), -1, dtype=np.int32))
    order = np.argsort(dict_vals)
    rank = np.empty(len(order), dtype=np.int32)
    rank[order] = np.arange(len(order), dtype=np.int32)
    null_mask = arr.is_null().to_numpy(zero_copy_only=False)
    codes = arr.indices.fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    out = rank[codes]
    out = np.where(null_mask, np.int32(-1), out).astype(np.int32)
    return Dictionary(list(dict_vals[order])), out


def register_parquet(name: str, path: str, batch_rows: int = 1 << 20,
                     lazy: bool = False,
                     decimal_overrides: Optional[Dict[str, tuple]] = None,
                     ) -> Table:
    """Register a parquet file. ``lazy=True`` defers all decode to scan
    time: each TableScan reads only its referenced columns and only the
    row groups whose min/max statistics can satisfy the pushed-down
    subfilter — the SelectiveColumnReader contract
    (velox/dwio/common/SelectiveColumnReader.h:139) done at row-group
    granularity on the host CPU."""
    import pyarrow.parquet as pq

    if not lazy:
        return register_arrow(name, pq.read_table(path), batch_rows,
                              decimal_overrides)
    pf = pq.ParquetFile(path)
    schema = row_type(
        pf.schema_arrow.names,
        [type_from_arrow(f.type) for f in pf.schema_arrow])
    t = ParquetTable(name, schema, [], path=path, batch_rows=batch_rows,
                     decimal_overrides=decimal_overrides or {})
    _TABLES[name] = t
    _replay.catalog_epoch_bump()
    return t


def register_orc(name: str, path: str, batch_rows: int = 1 << 20) -> Table:
    """ORC file ingest (velox/dwio/dwrf + dwio/orc reader analog; decode
    is host CPU via arrow, device batches come out the same)."""
    import pyarrow.orc as po

    return register_arrow(name, po.ORCFile(path).read(), batch_rows)


def register_csv(name: str, path: str, batch_rows: int = 1 << 20,
                 **read_options) -> Table:
    """CSV/text ingest (velox/dwio/text analog)."""
    import pyarrow.csv as pc_csv

    return register_arrow(name, pc_csv.read_csv(path, **read_options),
                          batch_rows)


def register_json(name: str, path: str, batch_rows: int = 1 << 20) -> Table:
    """Line-delimited JSON ingest."""
    import pyarrow.json as pj

    return register_arrow(name, pj.read_json(path), batch_rows)


def register_feather(name: str, path: str,
                     batch_rows: int = 1 << 20) -> Table:
    """Arrow IPC / Feather ingest (zero-parse columnar read)."""
    import pyarrow.feather as pf

    return register_arrow(name, pf.read_table(path), batch_rows)


@dataclass
class ParquetTable(Table):
    """Lazy parquet-backed table (HiveDataSource analog,
    velox/connectors/hive/HiveDataSource.h)."""

    path: str = ""
    batch_rows: int = 1 << 20
    decimal_overrides: Dict[str, tuple] = None  # type: ignore[assignment]
    #: decoded-split cache (velox AsyncDataCache analog — parquet files
    #: are immutable, so (columns, subfilter) fully keys the decoded
    #: device splits; repeated scans skip decode + H2D entirely). LRU
    #: over config.scan_cache_entries.
    _split_cache: Dict[tuple, list] = None  # type: ignore[assignment]
    #: row groups skipped by statistics on the last scan (test/stats hook)
    last_skipped: int = 0
    #: rows dropped by arrow-side selective filtering on the last scan
    last_row_filtered: int = 0
    #: decoded-split cache hits (test/stats hook)
    cache_hits: int = 0

    @property
    def num_rows(self) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(self.path).metadata.num_rows

    def make_splits(self, columns: Sequence[str],
                    subfilter=None) -> List[Batch]:
        import pyarrow.parquet as pq

        from velox_tpu.utils.config import config
        from velox_tpu.utils.testvalue import TestValue

        # FaultyFileSystem analog (velox/common/file/tests/FaultyFile
        # System.h): tests inject read failures/delays here
        TestValue.adjust("velox_tpu.scan.read_split", self)
        ckey = (tuple(columns), repr(subfilter))
        if self._split_cache is None:
            self._split_cache = {}
        hit = self._split_cache.get(ckey)
        if hit is not None:
            self.cache_hits += 1
            # LRU touch
            self._split_cache[ckey] = self._split_cache.pop(ckey)
            return list(hit)
        pf = pq.ParquetFile(self.path)
        md = pf.metadata
        col_idx = {n: i for i, n in enumerate(pf.schema_arrow.names)}
        conjuncts = _split_conjuncts(subfilter)
        keep = []
        for rg in range(md.num_row_groups):
            stats = {}
            g = md.row_group(rg)
            for n in columns:
                if n not in col_idx:
                    continue  # shredded subfield leaves: no rg stats
                s = g.column(col_idx[n]).statistics
                if s is not None and s.has_min_max:
                    stats[n] = (s.min, s.max)
            if all(_may_match(c, stats) for c in conjuncts):
                keep.append(rg)
        self.last_skipped = md.num_row_groups - len(keep)
        if not keep:
            return []
        cols_req = []
        for n in columns:
            if n in col_idx or "." in n:
                cols_req.append(n)
        tbl = pf.read_row_groups(keep, columns=cols_req)
        tbl, _ = flatten_structs(tbl)
        # selective materialization: evaluate convertible subfilter
        # conjuncts in arrow BEFORE device transfer, so only surviving
        # rows ship to HBM (the SelectiveColumnReader filter-column-
        # first contract, velox/dwio/common/SelectiveColumnReader.h:139
        # + ColumnLoader.h late materialization — here the "lazy load"
        # is skipping the host->device DMA for filtered-out rows). The
        # device subfilter still runs (exactness; partial conversions).
        mask = _arrow_filter_mask(tbl, conjuncts)
        if mask is not None:
            import pyarrow.compute as pc

            before = tbl.num_rows
            tbl = tbl.filter(mask)
            self.last_row_filtered = before - tbl.num_rows
        ov = {k: v for k, v in (self.decimal_overrides or {}).items()
              if k in columns}
        splits = ingest_splits(tbl, self.batch_rows, ov or None)
        if config.scan_cache_entries > 0:
            self._split_cache[ckey] = list(splits)
            while len(self._split_cache) > config.scan_cache_entries:
                self._split_cache.pop(next(iter(self._split_cache)))
        return splits


def _arrow_filter_mask(tbl: pa.Table, conjuncts):
    """Boolean arrow mask for the conjuncts expressible as arrow compute
    (field <cmp> literal, BETWEEN, IN); None when nothing converts.
    Unconvertible conjuncts are simply skipped — the device subfilter
    re-applies the full predicate."""
    import datetime as _dt

    import pyarrow.compute as pc

    from velox_tpu.expr.ir import Call, Cast, FieldRef, Literal

    def lit_of(e, col_type):
        if not isinstance(e, Literal):
            return None
        v = e.value
        if (pa.types.is_date32(col_type)
                and isinstance(v, (int, float))):
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
        return v

    def conv(c):
        if not isinstance(c, Call):
            return None
        ops = {"eq": "equal", "neq": "not_equal", "lt": "less",
               "lte": "less_equal", "gt": "greater",
               "gte": "greater_equal"}
        flipped = {"eq": "equal", "neq": "not_equal", "lt": "greater",
                   "lte": "greater_equal", "gt": "less",
                   "gte": "less_equal"}
        args = c.args
        if c.name in ops and len(args) == 2:
            f, l = args
            table = ops
            if isinstance(l, FieldRef) and isinstance(f, Literal):
                f, l = l, f
                table = flipped  # literal <cmp> field
            if not (isinstance(f, FieldRef) and isinstance(l, Literal)):
                return None
            if f.name not in tbl.column_names:
                return None
            v = lit_of(l, tbl.schema.field(f.name).type)
            if v is None:
                return None
            return getattr(pc, table[c.name])(tbl.column(f.name), v)
        if c.name == "between" and len(args) == 3:
            f, lo, hi = args
            if not (isinstance(f, FieldRef) and isinstance(lo, Literal)
                    and isinstance(hi, Literal)
                    and f.name in tbl.column_names):
                return None
            t = tbl.schema.field(f.name).type
            lov, hiv = lit_of(lo, t), lit_of(hi, t)
            if lov is None or hiv is None:
                return None
            col = tbl.column(f.name)
            return pc.and_(pc.greater_equal(col, lov),
                           pc.less_equal(col, hiv))
        if c.name == "in":
            f = args[0]
            if not (isinstance(f, FieldRef)
                    and f.name in tbl.column_names):
                return None
            t = tbl.schema.field(f.name).type
            vals = []
            for a in args[1:]:
                v = lit_of(a, t)
                if v is None:
                    return None
                vals.append(v)
            return pc.is_in(tbl.column(f.name), value_set=pa.array(vals))
        if c.name == "__in_table" and len(args) == 2:
            f, l = args
            if not (isinstance(f, FieldRef) and isinstance(l, Literal)
                    and isinstance(l.value, np.ndarray)
                    and f.name in tbl.column_names):
                return None
            t = tbl.schema.field(f.name).type
            try:
                vs = pa.array(l.value).cast(t)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return None
            return pc.is_in(tbl.column(f.name), value_set=vs)
        return None

    mask = None
    for c in conjuncts:
        m = conv(c)
        if m is None:
            continue
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def _split_conjuncts(expr) -> List:
    """Flatten an AND tree into conjuncts (None -> [])."""
    from velox_tpu.expr.ir import Call

    if expr is None:
        return []
    if isinstance(expr, Call) and expr.name == "and":
        out = []
        for a in expr.args:
            out.extend(_split_conjuncts(a))
        return out
    return [expr]


def _may_match(conjunct, stats: Dict[str, tuple]) -> bool:
    """Can any row in a group with these min/max stats pass the conjunct?
    Conservative: unknown shapes / missing stats -> True (no skip).
    The ScanSpec::testFilter analog (velox/dwio/common/ScanSpec.cpp)."""
    from velox_tpu.expr.ir import Call, Cast, FieldRef, Literal

    def peel(e):
        while isinstance(e, Cast):
            e = e.expr
        return e

    if not isinstance(conjunct, Call):
        return True
    a = [peel(x) for x in conjunct.args]
    op = conjunct.name
    flipped = {"lt": "gt", "lte": "gte", "gt": "lt", "gte": "lte",
               "eq": "eq", "neq": "neq"}
    if (len(a) == 2 and isinstance(a[0], Literal)
            and isinstance(a[1], FieldRef) and op in flipped):
        a = [a[1], a[0]]
        op = flipped[op]
    if op == "between" and len(a) == 3 and isinstance(a[0], FieldRef):
        return (_may_match(Call(None, "gte", (a[0], a[1])), stats)
                and _may_match(Call(None, "lte", (a[0], a[2])), stats))
    if not (len(a) == 2 and isinstance(a[0], FieldRef)
            and isinstance(a[1], Literal)):
        return True
    mm = stats.get(a[0].name)
    v = a[1].value
    if mm is None or v is None:
        return True
    if op == "__in_table" and isinstance(v, np.ndarray):
        # dynamic IN-set (sorted): any set value inside [min, max]?
        # (velox common/base/BloomFilter-backed value-set filters
        # tested against rowgroup stats, dwio ScanSpec::testFilter)
        try:
            lo, hi = _stat_key(mm[0]), _stat_key(mm[1])
            left = int(np.searchsorted(v, lo, side="left"))
            right = int(np.searchsorted(v, hi, side="right"))
            return right > left
        except TypeError:
            return True
    if isinstance(v, (list, np.ndarray)):
        return True
    lo, hi = mm
    try:
        lo, hi, v = _stat_key(lo), _stat_key(hi), _stat_key(v)
        if op == "eq":
            return lo <= v <= hi
        if op == "lt":
            return lo < v
        if op == "lte":
            return lo <= v
        if op == "gt":
            return hi > v
        if op == "gte":
            return hi >= v
    except TypeError:
        return True
    return True


def _stat_key(v):
    """Normalize a parquet stat / literal to a comparable scalar."""
    import datetime

    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (np.integer, np.floating)):
        return v.item()
    return v


def get_table(name: str) -> Table:
    try:
        return _TABLES[name]
    except KeyError:
        raise KeyError(f"no table {name!r}; registered: {sorted(_TABLES)}")


def drop_table(name: str) -> None:
    _TABLES.pop(name, None)
    _replay.catalog_epoch_bump()


def list_tables() -> List[str]:
    return sorted(_TABLES)


def register_parquet_dir(name: str, path: str,
                         batch_rows: int = 1 << 20,
                         decimal_overrides=None) -> Table:
    """Register a hive-partitioned parquet DIRECTORY
    (velox/connectors/hive partitioned-table catalogs): key=value path
    segments become ordinary columns of the table; partition pruning is
    then the normal subfilter path (arrow evaluates the partition
    columns like any other)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(path, format="parquet", partitioning="hive")
    return register_arrow(name, ds.to_table(), batch_rows,
                          decimal_overrides)
