"""Batch: a set of named Columns + a device selection mask.

This is the RowVector + SelectivityVector pair of the reference
(velox/vector/ComplexVector.h:31; velox/vector/SelectivityVector.h:39) fused
into one TPU-friendly object:

* ``capacity`` is static (padded), so every kernel compiled against a batch
  shape is reusable — XLA never sees a dynamic dimension.
* ``sel`` is a device bool mask of active rows. Filters, join-row masks and
  padding all flow through it; no host sync is needed to apply a filter.
* ``num_rows`` is an optional host-known row count (rows beyond it are
  guaranteed unselected). After device-side filtering it becomes unknown
  (None) until the host explicitly syncs via ``selected_count()``.

Batches are immutable; transformations return new Batches sharing unchanged
device buffers (copy-on-write comes free from functional JAX).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import DataType
from velox_tpu.types.types import RowType, TypeKind, row_type
from velox_tpu.vector.column import (
    ArrayColumn, Column, MapColumn, make_column,
)

#: pad batch capacities to a multiple of the TPU lane count
LANE = 128


def round_capacity(n: int) -> int:
    """Round up to a shape-bucket: next power of two, at least one lane.

    Bucketing capacities keeps the jit compile cache small (few distinct
    shapes) — the analog of Velox's preferred_output_batch_rows sizing
    (velox/core/QueryConfig.h:479) but driven by XLA's static-shape needs.
    """
    n = max(n, LANE)
    return 1 << (n - 1).bit_length()


class Batch:
    __slots__ = ("columns", "sel", "num_rows", "_prefix_dense")

    def __init__(
        self,
        columns: Dict[str, Column],
        sel: jax.Array,
        num_rows: Optional[int] = None,
    ):
        self.columns = dict(columns)
        self.sel = sel
        self.num_rows = num_rows
        self._prefix_dense: Optional[bool] = None
        cap = sel.shape[0]
        for name, col in self.columns.items():
            assert col.capacity == cap, (
                f"column {name} capacity {col.capacity} != batch {cap}"
            )

    # ---------------------------------------------------------- properties
    @property
    def capacity(self) -> int:
        return self.sel.shape[0]

    @property
    def names(self) -> List[str]:
        return list(self.columns.keys())

    @property
    def schema(self) -> RowType:
        return row_type(self.names, [c.dtype for c in self.columns.values()])

    def column(self, name: str) -> Column:
        return self.columns[name]

    def __contains__(self, name: str) -> bool:
        return name in self.columns

    # -------------------------------------------------------- construction
    @staticmethod
    def from_pydict(
        data: Dict[str, Sequence],
        types: Dict[str, DataType],
        capacity: Optional[int] = None,
    ) -> "Batch":
        names = list(data.keys())
        n = len(data[names[0]]) if names else 0
        cap = capacity if capacity is not None else round_capacity(n)
        from velox_tpu.vector.column import (
            make_array_column, make_map_column,
        )

        from velox_tpu.vector.column import make_row_column

        cols = {}
        for name in names:
            if types[name].kind == TypeKind.ARRAY:
                cols[name] = make_array_column(types[name], data[name], cap)
            elif types[name].kind == TypeKind.MAP:
                cols[name] = make_map_column(types[name], data[name], cap)
            elif types[name].kind == TypeKind.ROW:
                cols[name] = make_row_column(types[name], data[name], cap)
            else:
                col, _ = make_column(types[name], data[name], cap)
                # value-range stats for integer/date lanes (the
                # VectorHasher ingest-stats analog — range-bound host
                # transforms like date_format need them)
                if (col.stats is None and col.dictionary is None
                        and np.issubdtype(np.dtype(col.values.dtype),
                                          np.integer)
                        and col.values.dtype != np.dtype(bool)):
                    lane = np.asarray(col.values)[:n]
                    if col.valid is not None:
                        lane = lane[np.asarray(col.valid)[:n]]
                    if lane.size:
                        import dataclasses as _dc

                        col = _dc.replace(
                            col,
                            stats=(int(lane.min()), int(lane.max())))
                cols[name] = col
        sel = np.zeros(cap, dtype=bool)
        sel[:n] = True
        out = Batch(cols, jnp.asarray(sel), num_rows=n)
        out._prefix_dense = True   # by construction — no sync to re-check
        return out

    @staticmethod
    def empty_like(schema: RowType, capacity: int) -> "Batch":
        from velox_tpu.vector.column import Dictionary

        cols = {}
        for name, t in zip(schema.names, schema.children):
            # string columns stay dictionary-coded even when empty so
            # bind-time string transforms downstream keep working
            d = Dictionary([]) if t.is_string else None
            cols[name] = Column(
                t, jnp.zeros((capacity,), dtype=t.dtype), None, d)
        return Batch(cols, jnp.zeros((capacity,), dtype=jnp.bool_), num_rows=0)

    # ------------------------------------------------------ transformations
    def with_sel(self, sel: jax.Array, num_rows: Optional[int] = None) -> "Batch":
        return Batch(self.columns, sel, num_rows)

    def with_column(self, name: str, col: Column) -> "Batch":
        cols = dict(self.columns)
        cols[name] = col
        out = Batch(cols, self.sel, self.num_rows)
        out._prefix_dense = self._prefix_dense  # sel unchanged
        return out

    def project(self, names: Iterable[str]) -> "Batch":
        out = Batch({n: self.columns[n] for n in names}, self.sel,
                    self.num_rows)
        out._prefix_dense = self._prefix_dense  # sel unchanged
        return out

    def rename(self, mapping: Dict[str, str]) -> "Batch":
        cols = {mapping.get(n, n): c for n, c in self.columns.items()}
        out = Batch(cols, self.sel, self.num_rows)
        out._prefix_dense = self._prefix_dense  # sel unchanged
        return out

    def gather(self, indices: jax.Array, sel: jax.Array,
               num_rows: Optional[int] = None) -> "Batch":
        """Row gather of every column (indices may exceed capacity: clipped;
        callers must mask garbage via ``sel``).

        All flat lanes gather in ONE cached-jit program: per-column
        eager ``jnp.take`` dispatches were ~6s of invisible (not in
        any kernel profile) per-run work on TPC-H Q18's build paths —
        eager ops neither fuse nor appear in jit_profile."""
        flat = {n: c for n, c in self.columns.items()
                if type(c) is Column}
        cols = {n: c.gather(indices) for n, c in self.columns.items()
                if type(c) is not Column}
        if flat:
            from velox_tpu.exec.jitcache import cached_jit

            sig = tuple(sorted(
                (n, str(c.values.dtype), c.valid is not None)
                for n, c in flat.items()))

            def make():
                def run(vals, valids, idx):
                    out_v = {n: jnp.take(v, idx, mode="clip")
                             for n, v in vals.items()}
                    out_m = {n: jnp.take(m, idx, mode="clip")
                             for n, m in valids.items()}
                    return out_v, out_m
                return run

            fn = cached_jit(("batch_gather", sig), make)
            out_v, out_m = fn(
                {n: c.values for n, c in flat.items()},
                {n: c.valid for n, c in flat.items()
                 if c.valid is not None},
                indices)
            for n, c in flat.items():
                cols[n] = Column(c.dtype, out_v[n], out_m.get(n),
                                 c.dictionary, c.stats)
        return Batch(cols, sel, num_rows)

    # ------------------------------------------------------------- queries
    def selected_count(self) -> int:
        """Host sync: number of active rows (count-replay elides the
        round trip on repeat runs, utils/replay.py)."""
        from velox_tpu.utils.replay import fetch_int

        return fetch_int("selcount", jnp.sum(self.sel))

    def is_prefix_dense(self) -> bool:
        """Are the selected rows exactly [0, num_rows)? One host sync,
        cached. Lets kernels skip the pack (nonzero + gather-per-column)
        step entirely — scan splits are always prefix-dense."""
        if self.num_rows is None:
            return False
        if self._prefix_dense is None:
            from velox_tpu.utils.replay import fetch_bool

            want = jnp.arange(self.capacity, dtype=jnp.int32) < self.num_rows
            self._prefix_dense = not fetch_bool(
                "prefix_dense", jnp.any(self.sel != want))
        return self._prefix_dense

    def compact_prefix(self, count: Optional[int] = None) -> "Batch":
        """compact() for a batch whose selection is a dense prefix:
        slices every column (sequential copy) instead of nonzero +
        random gathers — ~10x cheaper at multi-million-row capacities."""
        if count is None:
            count = self.selected_count()
        cap2 = round_capacity(max(count, 1))
        if cap2 >= self.capacity:
            return self
        cols = {n: _slice_column(c, cap2)
                for n, c in self.columns.items()}
        sel2 = jnp.arange(cap2, dtype=jnp.int32) < count
        out = Batch(cols, sel2, count)
        out._prefix_dense = True   # by construction — no sync to re-check
        return out

    def compact(self, count: Optional[int] = None) -> "Batch":
        """Gather active rows to the front of a right-sized batch.

        One host sync for the count (if not given), then a device
        ``nonzero`` + gather — far cheaper than transferring a padded
        batch off-device. The analog of copying surviving rows into a
        dense output vector (velox/exec/OperatorUtils.cpp
        gatherCopy)."""
        if count is None:
            count = self.selected_count()
        cap2 = round_capacity(max(count, 1))
        if cap2 >= self.capacity:
            return self
        from velox_tpu.ops.sort import pack_indices

        idx = pack_indices(self.sel)[:cap2]
        sel2 = jnp.arange(cap2, dtype=jnp.int32) < count
        out = self.gather(idx, sel2, count)
        out._prefix_dense = True   # by construction — no sync to re-check
        return out

    # --------------------------------------------------------- host output
    def to_pydict(self, limit: Optional[int] = None) -> Dict[str, list]:
        """Materialize active rows on host (for tests/results)."""
        if self.capacity > LANE:
            # shrink device-side before crossing the host boundary; a
            # known row count (limit/topn outputs) skips the count sync
            self = self.compact(self.num_rows)
        # ONE device->host transfer for the whole batch (each np.asarray
        # would pay a full round trip on tunneled backends)
        from velox_tpu.vector.column import ArrayColumn, MapColumn, RowColumn

        device = {"__sel__": self.sel}
        for name, col in self.columns.items():
            if isinstance(col, RowColumn):
                continue   # small post-compact batches: per-child fetch
            if isinstance(col, (ArrayColumn, MapColumn)):
                device[f"s.{name}"] = col.starts
                device[f"l.{name}"] = col.lengths
            else:
                device[f"v.{name}"] = col.values
            if col.valid is not None:
                device[f"m.{name}"] = col.valid
        from velox_tpu.utils.replay import attach_checks, deliver_attached

        host = deliver_attached(jax.device_get(attach_checks(device)))
        sel = host["__sel__"]
        idx = np.nonzero(sel)[0]
        if limit is not None:
            idx = idx[:limit]
        out: Dict[str, list] = {}
        for name, col in self.columns.items():
            if isinstance(col, RowColumn):
                rows = col.to_pylist()
                out[name] = [rows[i] for i in idx]
                continue
            if isinstance(col, (ArrayColumn, MapColumn)):
                starts = host[f"s.{name}"][idx]
                lengths = host[f"l.{name}"][idx]
                valid = (host[f"m.{name}"][idx]
                         if col.valid is not None else None)
                if isinstance(col, MapColumn):
                    ks = col.keys.to_pylist()
                    vs = col.values.to_pylist()
                    # entry-tuple lists, not dicts: duplicate keys are
                    # legal mid-pipeline (split_to_multimap) and arrow
                    # map arrays accept (k, v) tuple lists
                    out[name] = [
                        None if valid is not None and not valid[i]
                        else list(zip(
                            ks[starts[i]: starts[i] + lengths[i]],
                            vs[starts[i]: starts[i] + lengths[i]]))
                        for i in range(len(starts))
                    ]
                    continue
                elems = col.elements.to_pylist()
                out[name] = [
                    None if valid is not None and not valid[i]
                    else elems[starts[i]: starts[i] + lengths[i]]
                    for i in range(len(starts))
                ]
                continue
            vals = host[f"v.{name}"][idx]
            if col.dictionary is not None:
                vals = col.dictionary.decode(vals)
            if col.valid is not None:
                valid = host[f"m.{name}"][idx]
                out[name] = [
                    (v if ok else None) for v, ok in zip(vals.tolist(), valid)
                ]
            else:
                out[name] = list(vals.tolist()) if vals.dtype != object else list(vals)
        return out

    def __repr__(self) -> str:
        fields = ", ".join(f"{n}:{c.dtype}" for n, c in self.columns.items())
        nr = self.num_rows if self.num_rows is not None else "?"
        return f"Batch[{fields}; rows={nr}/{self.capacity}]"


def _slice_column(c, cap2: int):
    """Prefix-slice any column kind to a smaller capacity (flat element
    stores of Array/Map columns are shared unchanged — only row-level
    lanes shrink)."""
    import dataclasses as _dc

    from velox_tpu.vector.column import ArrayColumn, MapColumn, RowColumn

    if isinstance(c, (ArrayColumn, MapColumn)):
        return _dc.replace(
            c, starts=c.starts[:cap2], lengths=c.lengths[:cap2],
            valid=None if c.valid is None else c.valid[:cap2])
    if isinstance(c, RowColumn):
        return RowColumn(
            c.dtype, tuple(_slice_column(k, cap2) for k in c.children),
            None if c.valid is None else c.valid[:cap2])
    return Column(
        c.dtype, c.values[:cap2],
        None if c.valid is None else c.valid[:cap2],
        c.dictionary, c.stats)


def harmonize_dictionaries(batches: Sequence["Batch"]) -> list:
    """Re-encode string columns so every batch shares ONE Dictionary per
    column (the merged sorted union; codes stay rank-ordered so sort
    keys remain valid). No-op when dictionaries are already shared —
    the catalog's table-global dictionaries make that the common case.
    Differing dictionaries arise from per-branch constants and
    concat()-style bind-time transforms under UNION ALL
    (velox wraps a new dictionary layer per branch instead)."""
    from velox_tpu.vector.column import (
        ArrayColumn, Column, Dictionary, MapColumn, RowColumn,
    )

    if len(batches) <= 1:
        return list(batches)
    names = batches[0].names
    out_cols = [dict(b.columns) for b in batches]
    changed = False
    for n in names:
        parts = [b.columns[n] for b in batches]
        if isinstance(parts[0], (ArrayColumn, MapColumn, RowColumn)):
            continue
        dicts = [p.dictionary for p in parts
                 if p.dictionary is not None]
        if not dicts:
            continue
        d0 = dicts[0]
        if len(dicts) == len(parts) and all(
                d is d0 for d in dicts[1:]):
            continue
        assert len(dicts) == len(parts), (
            f"column {n}: dictionary-coded and plain parts mixed")
        merged = Dictionary(sorted(
            {str(v) for dd in dicts for v in dd.values}))
        for i, p in enumerate(parts):
            table = np.concatenate([[-1], [
                merged.code_of(str(v))
                for v in p.dictionary.values]]).astype(np.int32)
            # stats describe the OLD code space — drop them
            out_cols[i][n] = Column(
                p.dtype,
                jnp.take(jnp.asarray(table), p.values + 1,
                         mode="clip"),
                p.valid, merged, None)
        changed = True
    if not changed:
        return list(batches)
    return [Batch(cols, b.sel, b.num_rows)
            for cols, b in zip(out_cols, batches)]


def concat_batches(
    batches: Sequence["Batch"], capacity: Optional[int] = None
) -> "Batch":
    """Concatenate same-schema batches into one padded batch.

    The analog of appending RowVectors into a RowContainer
    (velox/exec/RowContainer.h:265) — here a single device concatenate per
    column. String columns must share one Dictionary across inputs (the
    catalog ingest guarantees table-global dictionaries).
    """
    assert batches, "concat of zero batches"
    if len(batches) == 1 and capacity is None:
        return batches[0]
    batches = harmonize_dictionaries(batches)
    names = batches[0].names
    total = sum(b.capacity for b in batches)
    cap = capacity if capacity is not None else round_capacity(total)
    assert cap >= total

    pad = cap - total
    cols = {}
    flat_sig = []
    for n in names:
        parts = [b.columns[n] for b in batches]
        if isinstance(parts[0], (ArrayColumn, MapColumn)):
            cols[n] = _concat_offset_columns(parts, pad)
            continue
        from velox_tpu.vector.column import RowColumn as _RC

        if isinstance(parts[0], _RC):
            cols[n] = _concat_row_columns(parts, pad)
            continue
        flat_sig.append((n, tuple(p.valid is not None for p in parts)))

    # every flat lane concatenates + pads in ONE cached-jit program:
    # per-column eager concats were a dominant dispatch-count cost on
    # the tunneled backend (each eager op is a separate mini-program)
    from velox_tpu.exec.jitcache import cached_jit

    def make():
        def run(sels, vtree, mtree):
            out_sel = jnp.concatenate(
                list(sels)
                + ([jnp.zeros(pad, dtype=jnp.bool_)] if pad else []))
            out_v, out_m = {}, {}
            for n, flags in flat_sig:
                parts = vtree[n]
                segs = list(parts)
                if pad:
                    segs.append(jnp.zeros((pad,), segs[0].dtype))
                out_v[n] = jnp.concatenate(segs)
                if any(flags):
                    mparts = []
                    mi = 0
                    for p, f in zip(parts, flags):
                        if f:
                            mparts.append(mtree[n][str(mi)])
                            mi += 1
                        else:
                            mparts.append(
                                jnp.ones(p.shape, jnp.bool_))
                    if pad:
                        mparts.append(jnp.zeros((pad,), jnp.bool_))
                    out_m[n] = jnp.concatenate(mparts)
            return out_sel, out_v, out_m
        return run

    key = ("concat_batches", len(batches), pad,
           tuple((n, str(batches[0].columns[n].values.dtype), flags)
                 for n, flags in flat_sig))
    vtree = {n: tuple(b.columns[n].values for b in batches)
             for n, _ in flat_sig}
    mtree = {}
    for n, flags in flat_sig:
        if any(flags):
            ms = [b.columns[n].valid for b, f in zip(batches, flags)
                  if f]
            mtree[n] = {str(i): m for i, m in enumerate(ms)}
    sel, out_v, out_m = cached_jit(key, make)(
        tuple(b.sel for b in batches), vtree, mtree)
    for n, flags in flat_sig:
        parts = [b.columns[n] for b in batches]
        dicts = [p.dictionary for p in parts if p.dictionary is not None]
        d = dicts[0] if dicts else None
        stats = None
        if all(p.stats is not None for p in parts):
            stats = (min(p.stats[0] for p in parts),
                     max(p.stats[1] for p in parts))
        cols[n] = Column(parts[0].dtype, out_v[n], out_m.get(n), d,
                         stats)
    nr = None
    if all(b.num_rows is not None for b in batches):
        nr = sum(b.num_rows for b in batches)
    return Batch(cols, sel, num_rows=nr)


def _concat_row_columns(parts, pad: int):
    """Concatenate RowColumn parts child-by-child."""
    from velox_tpu.vector.column import (
        ArrayColumn, MapColumn, RowColumn,
    )

    kids = []
    for j in range(len(parts[0].children)):
        sub = [p.children[j] for p in parts]
        if isinstance(sub[0], (ArrayColumn, MapColumn)):
            kids.append(_concat_offset_columns(sub, pad))
        elif isinstance(sub[0], RowColumn):
            kids.append(_concat_row_columns(sub, pad))
        else:
            vals = jnp.concatenate(
                [p.values for p in sub]
                + ([jnp.zeros(pad, dtype=sub[0].values.dtype)]
                   if pad else []))
            valid = None
            if any(p.valid is not None for p in sub):
                valid = jnp.concatenate(
                    [p.validity() for p in sub]
                    + ([jnp.zeros(pad, dtype=jnp.bool_)] if pad else []))
            kids.append(Column(sub[0].dtype, vals, valid,
                               sub[0].dictionary))
    valid = None
    if any(p.valid is not None for p in parts):
        valid = jnp.concatenate(
            [p.validity() for p in parts]
            + ([jnp.zeros(pad, dtype=jnp.bool_)] if pad else []))
    return RowColumn(parts[0].dtype, tuple(kids), valid)


def _concat_flat(parts: List[Column]) -> tuple:
    """Concat flat element Columns; returns (column, per-part offsets)."""
    offs, off = [], 0
    for p in parts:
        offs.append(off)
        off += p.capacity
    dicts = [p.dictionary for p in parts if p.dictionary is not None]
    d = dicts[0] if dicts else None
    for other in dicts[1:]:
        assert other is d, "differing element dictionaries across batches"
    vals = jnp.concatenate([p.values for p in parts])
    valid = (jnp.concatenate([p.validity() for p in parts])
             if any(p.valid is not None for p in parts) else None)
    return Column(parts[0].dtype, vals, valid, d), offs


def _concat_offset_columns(parts, pad: int):
    """Concatenate ArrayColumn/MapColumn parts: row-level offsets shift by
    the cumulative flat-element capacity of preceding parts; flat element
    lanes concatenate once (shared, never copied per row)."""
    from velox_tpu.vector.column import ArrayColumn, MapColumn

    is_map = isinstance(parts[0], MapColumn)
    starts = jnp.concatenate(
        [p.starts + off for p, off in
         zip(parts, _concat_flat(
             [p.keys if is_map else p.elements for p in parts])[1])]
        + ([jnp.zeros(pad, jnp.int32)] if pad else []))
    lengths = jnp.concatenate(
        [p.lengths for p in parts]
        + ([jnp.zeros(pad, jnp.int32)] if pad else []))
    valid = None
    if any(p.valid is not None for p in parts):
        valid = jnp.concatenate(
            [p.validity() for p in parts]
            + ([jnp.zeros(pad, jnp.bool_)] if pad else []))
    if is_map:
        keys, _ = _concat_flat([p.keys for p in parts])
        values, _ = _concat_flat([p.values for p in parts])
        return MapColumn(parts[0].dtype, starts, lengths, keys, values,
                         valid)
    elements, _ = _concat_flat([p.elements for p in parts])
    return ArrayColumn(parts[0].dtype, starts, lengths, elements, valid)
