"""Relational operators.

Each class mirrors one velox/exec operator (cited per class) with the
compute re-designed as jitted XLA kernels over fixed-capacity device
batches. Per-batch work is fused into a small number of jitted programs
per operator (cached per dictionary signature / output capacity) — the
analog of velox's per-operator compiled expression sets, and essential on
TPU where every eager dispatch pays tunnel latency.

Serial-mode contract (see exec/__init__.py): add_input may queue output;
blocking operators emit only after no_more_input.
"""

from __future__ import annotations

import collections
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, BOOLEAN, DataType
from velox_tpu.types.types import TypeKind
from velox_tpu.expr.ir import FieldRef
from velox_tpu.vector.batch import Batch, concat_batches, round_capacity
from velox_tpu.vector.column import Column, Dictionary
from velox_tpu.exec.operator import AdaptiveOutput, ExprEvaluator, Operator
from velox_tpu.exec.jitcache import cached_jit
from velox_tpu.utils.replay import (
    fetch_bool as _fetch_bool, fetch_int as _fetch_int,
    fetch_np as _fetch_np, fetch_tree as _fetch_tree,
)
from velox_tpu.exec.spill import SpillableBuffer
from velox_tpu.functions.aggregates import lookup_aggregate
from velox_tpu.ops.groupby import group_ids_array, group_ids_sorted
from velox_tpu.ops.join import (
    build_join_index, build_join_index_presorted, build_join_table,
    build_matched_flags, expand_matches, match_total, probe_join_index,
    probe_join_index_merge, probe_join_index_merge_repair,
    probe_join_index_presorted, probe_join_table,
    valid_ascending_code,
)
from velox_tpu.ops.sort import compact_indices, sort_indices, top_n_indices
from velox_tpu.plan.nodes import (
    AggStep, AggregationNode, CrossJoinNode, HashJoinNode, JoinType,
)

_F64_NAN = float("nan")


#: shared empty dictionary for string group keys that never saw input
#: (an empty stream must still emit dictionary-coded string columns so
#: downstream bind-time string transforms keep working)
_EMPTY_DICT = Dictionary([])


def _key_dict_for(key_dicts, dtype, k):
    d = key_dicts.get(k)
    if d is None and dtype.is_string:
        return _EMPTY_DICT
    return d


def _cols_of(batch: Batch, names) -> Dict[str, Tuple]:
    return {n: (batch.column(n).values, batch.column(n).valid)
            for n in names}


def _lambda_capture_names(body, params, batch: Batch) -> List[str]:
    """Outer-row scalar columns captured by a lambda body
    (velox/expression/LambdaExpr.cpp capture analog)."""
    from velox_tpu.vector.column import ArrayColumn, MapColumn

    names: List[str] = []

    def walk(e):
        if isinstance(e, FieldRef):
            if (e.name not in params and "#" not in e.name
                    and e.name in batch and e.name not in names
                    and not isinstance(batch.column(e.name),
                                       (ArrayColumn, MapColumn))):
                names.append(e.name)
        for c in e.children:
            walk(c)

    walk(body)
    return names


def _gather_captures(batch: Batch, names, owner, within):
    """Captured columns gathered to element capacity by owning row."""
    cols: Dict[str, Column] = {}
    types: Dict[str, DataType] = {}
    for n in names:
        c = batch.column(n).gather(owner)
        valid = (within if c.valid is None
                 else jnp.logical_and(c.valid, within))
        cols[n] = Column(c.dtype, c.values, valid, c.dictionary)
        types[n] = c.dtype
    return cols, types


# --------------------------------------------------------------- leaf ops

class ValuesOp(Operator):
    """velox/core/PlanNode.h ValuesNode executor."""

    def __init__(self, node):
        super().__init__(node)
        self._queue = collections.deque(node.batches)

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return not self._queue


class TableScanOp(AdaptiveOutput, Operator):
    """velox/exec/TableScan.cpp:146 — drains catalog splits, applies the
    pushed-down subfilter on device (ScanSpec analog)."""

    def __init__(self, node):
        super().__init__(node)
        self._df_seen = 0
        allc = getattr(node, "all_columns", node.columns)
        self._allc = allc
        #: splits realize LAZILY on first access: dynamic filters
        #: pushed at build publication reach the parquet row-group
        #: pruner (velox dwio ScanSpec update on addDynamicFilter,
        #: exec/TableScan.cpp dynamic-filter intake)
        self._splits_cache: Optional[collections.deque] = None
        fschema = node.output_type
        if getattr(node, "filter_columns", ()):
            from velox_tpu.io.catalog import get_table as _gt
            from velox_tpu.types.types import row_type as _rt

            tschema = _gt(node.table).schema
            fschema = _rt(list(allc),
                          [tschema.find_child(n) for n in allc])
        self._filter = (
            ExprEvaluator([node.subfilter], fschema)
            if node.subfilter is not None else None)
        # dynamic filters pushed down mid-query by joins
        # (velox/exec/HashProbe.cpp:419-444 analog)
        self.dynamic_filters: List[ExprEvaluator] = []
        self._fschema = fschema

    @property
    def _splits(self) -> collections.deque:
        if self._splits_cache is None:
            from velox_tpu.io.catalog import get_table

            sub = self.node.subfilter
            # fold pushed dynamic filters into the scan predicate so
            # file-backed tables prune row groups / pre-filter rows on
            # them too
            for df in self.dynamic_filters:
                for e in df.exprs:
                    from velox_tpu.expr.ir import Call as _C

                    sub = e if sub is None else _C(BOOLEAN, "and",
                                                  (sub, e))
            self._splits_cache = collections.deque(
                get_table(self.node.table).make_splits(
                    self._allc, sub))
        return self._splits_cache

    def get_output(self) -> Optional[Batch]:
        if not self._splits:
            return None
        b = self._splits.popleft()
        b = b.project(getattr(self.node, "all_columns",
                              self.node.columns))
        filtered = self._filter is not None or bool(self.dynamic_filters)
        if self._filter is not None:
            b = b.with_sel(self._filter.filter_sel(b))
        for df in self.dynamic_filters:
            b = b.with_sel(df.filter_sel(b))
        b = b.project(self.node.columns)  # drop filter-only columns
        if filtered:
            # selective scans (static subfilter or a pushed dynamic
            # IN/bloom filter) right-size before downstream operators
            if len(self.dynamic_filters) != self._df_seen:
                self._df_seen = len(self.dynamic_filters)
                self._sparse_verdict = None   # re-judge with new filters
            b = self._shape_output(b)
        self.stats.output_batches += 1
        return b

    def is_finished(self) -> bool:
        return not self._splits


# --------------------------------------------------------- filter/project

class FilterOp(AdaptiveOutput, Operator):
    """velox/exec/FilterProject.cpp filter half: one fused program."""

    def __init__(self, node):
        super().__init__(node)
        self._eval = ExprEvaluator(
            [node.predicate], node.source.output_type)
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        self._queue.append(batch.with_sel(self._eval.filter_sel(batch)))

    def get_output(self) -> Optional[Batch]:
        if not self._queue:
            return None
        return self._shape_output(self._queue.popleft())

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


def _valid_take(valid, idx):
    return None if valid is None else jnp.take(valid, idx, mode="clip")


def _extract_row_path(batch: Batch, dotted: str, dtype):
    """Resolve a (possibly dotted) column reference to a column,
    navigating RowColumn children and ANDing each parent row's null
    mask into the extracted child (velox RowVector childAt + null
    propagation). Whole-column references return the column as-is."""
    import dataclasses as _dc

    from velox_tpu.vector.column import RowColumn

    if dotted in batch:
        return batch.column(dotted)
    parts = dotted.split(".")
    for k in range(len(parts) - 1, 0, -1):
        head = ".".join(parts[:k])
        if head not in batch:
            continue
        col = batch.column(head)
        acc_valid = None
        ok = True
        for nm in parts[k:]:
            if not isinstance(col, RowColumn):
                ok = False
                break
            if col.valid is not None:
                acc_valid = (col.valid if acc_valid is None
                             else jnp.logical_and(acc_valid, col.valid))
            col = col.child(nm)
        if not ok:
            continue
        if acc_valid is not None:
            merged = (acc_valid if col.valid is None
                      else jnp.logical_and(col.valid, acc_valid))
            col = _dc.replace(col, valid=merged)
        return col
    raise KeyError(f"no column or row subfield {dotted!r} in batch")


class ProjectOp(Operator):
    """velox/exec/FilterProject.cpp project half: one fused program."""

    def __init__(self, node):
        from velox_tpu.expr.ir import (
            Call as _Call, FieldRef as _FR, Lambda as _Lam,
        )
        from velox_tpu.types.types import ArrayType

        super().__init__(node)
        # ARRAY columns can only be projected by passthrough (offsets +
        # shared elements move as-is, no device work) ...
        self._array_pass = {
            name: e.name for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _FR)}
        # ... or by transform(arr, x -> body): the lambda body runs over
        # the flat elements lane through the normal expression compiler;
        # offsets are shared (velox ArrayFunctions transform analog)
        self._transforms = {
            name: (e.args[0].name, e.args[1]) for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _Call)
            and e.name == "transform" and isinstance(e.args[0], _FR)}
        # ... or sequence(lo, hi): generated arrays — ONE host sync for
        # the element total, then a canonical offsets+iota construction
        # (velox/functions/prestosql/Sequence.h analog)
        self._sequences = {
            name: e for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _Call)
            and e.name in ("sequence", "repeat")}
        # array_sort / array_distinct: per-row element reorder/dedupe
        # via one expand + in-row sorts (see _apply_reorder)
        self._reorders = {
            name: e for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _Call)
            and e.name in ("array_sort", "array_distinct")
            and isinstance(e.args[0], _FR)}
        # map lambdas / concat: transform_values, map_filter,
        # map_concat run over the map's entry lanes (MapFunctions.h)
        self._map_lams = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call)
            and e.name in ("transform_values", "map_filter",
                           "transform_keys")
            and isinstance(e.args[0], _FR)}
        # zip_with / array_concat / array_reverse: offset-rebuilding
        # array combinators
        self._array_combos = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call)
            and e.name in ("zip_with", "array_concat", "array_reverse")
            and all(isinstance(a, _FR) for a in e.args
                    if not isinstance(a, _Lam))}
        # filter(a, x -> pred): packed element keep (ArrayFilter)
        self._array_filters = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call) and e.name == "filter"
            and isinstance(e.args[0], _FR)}
        self._map_concats = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call) and e.name == "map_concat"
            and all(isinstance(a, _FR) for a in e.args[:2])}
        # split(s, delim [, limit]): string -> ARRAY(VARCHAR) via
        # host-built per-distinct-value piece tables + one expansion
        self._splits_fn = {
            name: e for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _Call)
            and e.name in ("split", "regexp_split",
                           "regexp_extract_all")
            and isinstance(e.args[0], _FR)}
        # array_intersect/except/union + arrays_overlap: two-array
        # per-row set algebra via one combined tagged sort
        self._setops = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call)
            and e.name in ("array_intersect", "array_except",
                           "array_union", "arrays_overlap")
            and all(isinstance(a, _FR) for a in e.args[:2])}
        # slice(arr, start, len): offsets-only transform, elements shared
        self._slices = {
            name: e for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _Call)
            and e.name == "slice" and isinstance(e.args[0], _FR)}
        # ... or map_keys/map_values: an ArrayColumn sharing the map's
        # offsets with the key/value lane as elements (zero device work)
        self._map_projs = {
            name: (e.args[0].name, e.name) for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, ArrayType) and isinstance(e, _Call)
            and e.name in ("map_keys", "map_values")
            and isinstance(e.args[0], _FR)}
        # ROW intermediates (velox/vector/ComplexVector.h:31 RowVector;
        # velox/expression/ExprConstants.h kRowConstructor):
        # row_constructor(...) builds a RowColumn; a ROW-typed FieldRef
        # (whole column or dotted sub-row/complex child) passes through
        from velox_tpu.types.types import MapType as _MT, RowType as _RT
        self._row_ctors = {
            name: e for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, _RT) and isinstance(e, _Call)
            and e.name == "row_constructor"}
        self._row_pass = {
            name: e.name for name, e, t in zip(
                node.names, node.exprs, node.output_type.children)
            if isinstance(t, (_RT, _MT)) and isinstance(e, _FR)}
        # map_entries(m) -> ARRAY(ROW(key,value)) sharing the map's
        # offsets and flat lanes (zero device work); zip(a,b,...) ->
        # ARRAY(ROW(...)) via positionwise alignment
        self._map_entries = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call) and e.name == "map_entries"
            and isinstance(e.args[0], _FR)}
        self._zips = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call) and e.name == "zip"
            and all(isinstance(a, _FR) for a in e.args)}
        # round-3 extended array/map projections (exec/complex_fns.py)
        from velox_tpu.exec.complex_fns import EXT_APPLIERS as _EXT

        self._ext = {
            name: e for name, e in zip(node.names, node.exprs)
            if isinstance(e, _Call) and e.name in _EXT}
        # complex-typed children of dotted ROW subfield refs that the
        # scalar lane env can't carry (e.g. "r.tags" where tags ARRAY)
        out_types = dict(zip(node.names, node.output_type.children))
        self._row_sub = {
            name: e.name for name, e in zip(node.names, node.exprs)
            if isinstance(e, _FR) and "." in e.name
            and not node.source.output_type.contains(e.name)
            and out_types[name].kind in (
                TypeKind.ARRAY, TypeKind.MAP, TypeKind.ROW)}
        skip = (set(self._array_pass) | set(self._transforms)
                | set(self._map_projs) | set(self._sequences)
                | set(self._slices) | set(self._reorders)
                | set(self._setops) | set(self._splits_fn)
                | set(self._map_lams) | set(self._map_concats)
                | set(self._array_filters)
                | set(self._array_combos)
                | set(self._row_ctors) | set(self._row_pass)
                | set(self._map_entries) | set(self._zips)
                | set(self._row_sub) | set(self._ext))
        scalar = [
            (name, e) for name, e in zip(node.names, node.exprs)
            if name not in skip]
        # row_constructor's scalar fields evaluate through the same
        # fused program as synthetic outputs "name#fi"
        for name, e in self._row_ctors.items():
            rt = out_types[name]
            for i, (ct, a) in enumerate(zip(rt.children, e.args)):
                if ct.kind not in (TypeKind.ARRAY, TypeKind.MAP,
                                   TypeKind.ROW):
                    scalar.append((f"{name}#f{i}", a))
        self._scalar_names = [n for n, _ in scalar]
        self._eval = ExprEvaluator(
            [e for _, e in scalar], node.source.output_type)
        self._queue: collections.deque = collections.deque()

    def _apply_transform(self, batch: Batch, name: str):
        from velox_tpu.types.types import row_type
        from velox_tpu.vector.column import ArrayColumn

        src_name, lam = self._transforms[name]
        src = batch.column(src_name)
        assert isinstance(src, ArrayColumn)
        param = lam.params[0]
        ecap = src.elements.capacity
        fcols = {param: src.elements}
        names, types = [param], [src.dtype.element]
        caps = _lambda_capture_names(lam.body, lam.params, batch)
        if caps:
            from velox_tpu.exec.collect_agg import element_owners
            owner, within = element_owners(
                src.starts, src.lengths, ecap)
            ccols, ctypes = _gather_captures(batch, caps, owner, within)
            fcols.update(ccols)
            names += caps
            types += [ctypes[n] for n in caps]
        eschema = row_type(names, types)
        ev = ExprEvaluator([lam.body], eschema)
        fake = Batch(fcols, jnp.ones((ecap,), jnp.bool_))
        pairs, dicts = ev.project_pairs(fake)
        vals, valid = pairs[0]
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        elem = Column(out_t.element, vals, valid, dicts[0])
        return ArrayColumn(out_t, src.starts, src.lengths, elem,
                           src.valid)

    #: runaway guard (Presto caps sequence entries per row)
    _MAX_SEQ = 10_000

    def _apply_sequence(self, batch: Batch, name: str):
        from velox_tpu.types import BIGINT as _BI
        from velox_tpu.types.types import row_type as _rt
        from velox_tpu.vector.column import ArrayColumn

        e = self._sequences[name]
        ev = ExprEvaluator(list(e.args), batch.schema)
        (lo, lov), (hi, hiv) = ev.evaluate(batch)
        is_repeat = e.name == "repeat"
        valid = batch.sel
        if lov is not None and not is_repeat:
            valid = jnp.logical_and(valid, lov)
        if hiv is not None:
            valid = jnp.logical_and(valid, hiv)
        if is_repeat:   # repeat(value, n): n repeats of value
            lens = jnp.clip(hi, 0, self._MAX_SEQ).astype(jnp.int32)
        else:
            lens = jnp.clip(
                hi - lo + 1, 0, self._MAX_SEQ).astype(jnp.int32)
        lens = jnp.where(valid, lens, 0)
        total = _fetch_int("lens_total", jnp.sum(lens))  # one host sync
        ecap = round_capacity(max(total, 1))
        starts = (jnp.cumsum(lens) - lens).astype(jnp.int32)
        rows = jnp.arange(batch.capacity, dtype=jnp.int32)
        pos = jnp.where(lens > 0, starts, ecap)
        heads = jnp.zeros((ecap,), jnp.int32).at[pos].max(
            rows + 1, mode="drop")
        row_of = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
        p = jnp.arange(ecap, dtype=jnp.int32)
        base = jnp.take(lo, row_of, mode="clip")
        if is_repeat:
            vals = base
            elem_valid = (None if lov is None
                          else jnp.take(lov, row_of, mode="clip"))
            elem_t = e.args[0].dtype
        else:
            vals = (base.astype(jnp.int64)
                    + (p - jnp.take(starts, row_of, mode="clip")))
            elem_valid = None
            elem_t = _BI
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        row_valid = None
        if (lov is not None and not is_repeat) or hiv is not None:
            row_valid = valid
        return ArrayColumn(out_t, starts, lens,
                           Column(elem_t, vals, elem_valid), row_valid)

    def _apply_slice(self, batch: Batch, name: str):
        from velox_tpu.vector.column import ArrayColumn

        e = self._slices[name]
        src = batch.column(e.args[0].name)
        assert isinstance(src, ArrayColumn)
        ev = ExprEvaluator(list(e.args[1:]), batch.schema)
        (sv, _), (lv2, _) = ev.evaluate(batch)
        # Presto slice: 1-based start (negative = from end), length >= 0
        sv = sv.astype(jnp.int32)
        want = jnp.maximum(lv2.astype(jnp.int32), 0)
        off = jnp.where(sv < 0, src.lengths + sv, sv - 1)
        off = jnp.clip(off, 0, src.lengths)
        new_len = jnp.minimum(want, src.lengths - off)
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        return ArrayColumn(out_t, src.starts + off, new_len,
                           src.elements, src.valid)

    def _apply_reorder(self, batch: Batch, name: str):
        """array_sort / array_distinct (velox/functions/prestosql/
        ArraySort.cpp, ArrayDistinct.cpp): canonicalize the row's
        elements into a compact layout, sort within rows by value, and
        for distinct keep first occurrences restored to arrival order.
        One host sync (element total), then sorts — no per-row loops."""
        from velox_tpu.ops.sortkey import encode_sort_key
        from velox_tpu.vector.column import ArrayColumn

        e = self._reorders[name]
        src = batch.column(e.args[0].name)
        assert isinstance(src, ArrayColumn)
        lens = jnp.where(batch.sel, src.lengths, 0)
        total = _fetch_int("lens_total", jnp.sum(lens))  # one host sync
        ecap = round_capacity(max(total, 1))
        nst = (jnp.cumsum(lens) - lens).astype(jnp.int32)
        rows = jnp.arange(batch.capacity, dtype=jnp.int32)
        pos = jnp.where(lens > 0, nst, ecap)
        heads = jnp.zeros((ecap,), jnp.int32).at[pos].max(
            rows + 1, mode="drop")
        row_of = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
        p = jnp.arange(ecap, dtype=jnp.int32)
        ordinal = p - jnp.take(nst, row_of, mode="clip")
        in_run = p < total
        src_idx = jnp.take(src.starts, row_of, mode="clip") + ordinal
        ev = jnp.take(src.elements.values, src_idx, mode="clip")
        evd = (None if src.elements.valid is None else
               jnp.take(src.elements.valid, src_idx, mode="clip"))
        row_key = jnp.where(in_run, row_of, jnp.int32(ecap))
        vops = encode_sort_key(ev, evd)
        sorted_ops = jax.lax.sort(
            [row_key, *vops, p], is_stable=True,
            num_keys=1 + len(vops))
        sperm = sorted_ops[-1]
        srow = sorted_ops[0]
        sv = jnp.take(ev, sperm, mode="clip")
        svd = None if evd is None else jnp.take(evd, sperm, mode="clip")
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        if e.name == "array_sort":
            elem = Column(out_t.element, sv, svd,
                          src.elements.dictionary)
            return ArrayColumn(out_t, nst, lens, elem, src.valid)
        # array_distinct: keep first of each (row, value) run in the
        # sorted order, then restore arrival order among the kept
        diff = jnp.zeros((ecap,), jnp.bool_).at[0].set(True)
        for k in sorted_ops[:-1]:
            diff = jnp.logical_or(diff, jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]]))
        keep_sorted = jnp.logical_and(diff, srow < ecap)
        keep = (jnp.zeros((ecap,), jnp.bool_)
                .at[sperm].set(keep_sorted, mode="drop"))
        kcnt = (jnp.zeros((batch.capacity,), jnp.int32)
                .at[jnp.where(keep, row_of, batch.capacity)]
                .add(1, mode="drop"))
        # re-sort kept elements by (row, ordinal) for arrival order
        row_key2 = jnp.where(keep, row_of, jnp.int32(ecap))
        _, _, perm2 = jax.lax.sort(
            [row_key2, ordinal, p], is_stable=True, num_keys=2)
        dv = jnp.take(ev, perm2, mode="clip")
        dvd = None if evd is None else jnp.take(evd, perm2, mode="clip")
        dst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
        elem = Column(out_t.element, dv, dvd, src.elements.dictionary)
        return ArrayColumn(out_t, dst, kcnt, elem, src.valid)

    def _apply_map_lambda(self, batch: Batch, name: str):
        """transform_values(m, (k,v)->body) / map_filter(m, (k,v)->pred)
        (velox/functions/prestosql/MapFunctions.h): the lambda body runs
        once over the flat entry lanes; transform_values shares offsets,
        map_filter packs kept entries and rebuilds them."""
        from velox_tpu.ops.sort import pack_indices
        from velox_tpu.types.types import row_type as _rt
        from velox_tpu.vector.column import MapColumn

        from velox_tpu.exec.collect_agg import element_owners

        e = self._map_lams[name]
        src = batch.column(e.args[0].name)
        assert isinstance(src, MapColumn)
        lam = e.args[1]
        kp, vp = lam.params
        ecap = src.keys.capacity
        fcols = {kp: src.keys, vp: src.values}
        names, types = [kp, vp], [src.dtype.key, src.dtype.value]
        caps = _lambda_capture_names(lam.body, lam.params, batch)
        if caps:
            owner0, within0 = element_owners(
                src.starts, src.lengths, ecap)
            ccols, ctypes = _gather_captures(
                batch, caps, owner0, within0)
            fcols.update(ccols)
            names += caps
            types += [ctypes[n] for n in caps]
        eschema = _rt(names, types)
        fake = Batch(fcols, jnp.ones((ecap,), jnp.bool_))
        ev = ExprEvaluator([lam.body], eschema)
        pairs, dicts = ev.project_pairs(fake)
        vals, valid = pairs[0]
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        if e.name == "transform_values":
            return MapColumn(out_t, src.starts, src.lengths, src.keys,
                             Column(out_t.value, vals, valid, dicts[0]),
                             src.valid)
        if e.name == "transform_keys":
            # duplicate result keys are NOT detected (documented
            # deviation from MapFunctions.h's throw)
            return MapColumn(out_t, src.starts, src.lengths,
                             Column(out_t.key, vals, valid, dicts[0]),
                             src.values, src.valid)
        # map_filter: pred==True keeps the entry
        owner, within = element_owners(src.starts, src.lengths, ecap)
        keep = jnp.logical_and(within, vals)
        if valid is not None:           # null predicate -> drop
            keep = jnp.logical_and(keep, valid)
        kcnt = (jnp.zeros((batch.capacity,), jnp.int32)
                .at[jnp.where(keep, owner, batch.capacity)]
                .add(1, mode="drop"))
        perm = pack_indices(keep, ecap)
        nk = Column(src.keys.dtype,
                    jnp.take(src.keys.values, perm, mode="clip"),
                    _valid_take(src.keys.valid, perm),
                    src.keys.dictionary)
        nv = Column(src.values.dtype,
                    jnp.take(src.values.values, perm, mode="clip"),
                    _valid_take(src.values.valid, perm),
                    src.values.dictionary)
        nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
        return MapColumn(out_t, nst, kcnt, nk, nv, src.valid)

    def _apply_array_combo(self, batch: Batch, name: str):
        """zip_with(a, b, (x,y)->body) / concat(a, b) / reverse(a)
        (velox/functions/prestosql/ZipWith.h, ArrayConcat, reverse):
        one output expansion; elements gather from the sources (zip:
        positionwise with null padding; concat: a's run then b's;
        reverse: mirrored ordinals)."""
        from velox_tpu.types.types import row_type as _rt
        from velox_tpu.vector.column import ArrayColumn

        e = self._array_combos[name]
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        cap = batch.capacity
        srcs = [batch.column(a.name) for a in e.args
                if isinstance(a, FieldRef)]
        if e.name == "array_reverse":
            src = srcs[0]
            ecap = src.elements.capacity
            from velox_tpu.exec.collect_agg import element_owners
            owner, within = element_owners(
                src.starts, src.lengths, ecap)
            st = jnp.take(src.starts, owner, mode="clip")
            ln = jnp.take(src.lengths, owner, mode="clip")
            p = jnp.arange(ecap, dtype=jnp.int32)
            mirror = st + (ln - 1) - (p - st)
            idx = jnp.where(within, mirror, p)
            elem = Column(src.elements.dtype,
                          jnp.take(src.elements.values, idx,
                                   mode="clip"),
                          _valid_take(src.elements.valid, idx),
                          src.elements.dictionary)
            return ArrayColumn(out_t, src.starts, src.lengths, elem,
                               src.valid)

        ca, cb = srcs
        if (ca.elements.dictionary is not None
                or cb.elements.dictionary is not None):
            assert ca.elements.dictionary is cb.elements.dictionary, (
                f"{e.name}: string arrays must share a dictionary")
        null_valid = None
        for c in (ca, cb):
            if c.valid is not None:
                null_valid = (c.valid if null_valid is None
                              else jnp.logical_and(null_valid, c.valid))
        row_live = batch.sel
        if null_valid is not None:
            row_live = jnp.logical_and(row_live, null_valid)
        la = jnp.where(row_live, ca.lengths, 0)
        lb = jnp.where(row_live, cb.lengths, 0)
        lens = ((la + lb) if e.name == "array_concat"
                else jnp.maximum(la, lb)).astype(jnp.int32)
        total = _fetch_int("lens_total", jnp.sum(lens))  # one host sync
        ecap = round_capacity(max(total, 1))
        nst = (jnp.cumsum(lens) - lens).astype(jnp.int32)
        rows = jnp.arange(cap, dtype=jnp.int32)
        pos = jnp.where(lens > 0, nst, ecap)
        heads = jnp.zeros((ecap,), jnp.int32).at[pos].max(
            rows + 1, mode="drop")
        row_of = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
        p = jnp.arange(ecap, dtype=jnp.int32)
        ordinal = p - jnp.take(nst, row_of, mode="clip")
        ra_len = jnp.take(la, row_of, mode="clip")
        rb_len = jnp.take(lb, row_of, mode="clip")

        def gather(col, ord_, in_b):
            idx = jnp.take(col.starts, row_of, mode="clip") + ord_
            v = jnp.take(col.elements.values, idx, mode="clip")
            vd = _valid_take(col.elements.valid, idx)
            if vd is None:
                vd = in_b
            else:
                vd = jnp.logical_and(vd, in_b)
            return v, vd

        if e.name == "array_concat":
            from_a = ordinal < ra_len
            av, avd = gather(ca, ordinal, from_a)
            bv, bvd = gather(cb, ordinal - ra_len, ~from_a)
            vals = jnp.where(from_a, av, bv)
            valid = jnp.where(from_a, avd, bvd)
            # padding positions past total are dead; in-bounds elements
            # of either side keep their own validity
            elem = Column(out_t.element, vals,
                          None if (ca.elements.valid is None
                                   and cb.elements.valid is None)
                          else valid,
                          ca.elements.dictionary)
            return ArrayColumn(out_t, nst, lens, elem, null_valid)

        # zip_with: run the lambda over two constructed element columns
        av, avd = gather(ca, ordinal, ordinal < ra_len)
        bv, bvd = gather(cb, ordinal, ordinal < rb_len)
        lam = e.args[2]
        xp, yp = lam.params
        ea, eb = ca.dtype.element, cb.dtype.element
        fcols = {
            xp: Column(ea, av, avd, ca.elements.dictionary),
            yp: Column(eb, bv, bvd, cb.elements.dictionary),
        }
        names, types = [xp, yp], [ea, eb]
        caps = _lambda_capture_names(lam.body, lam.params, batch)
        if caps:
            within = p < jnp.take(lens, row_of, mode="clip") + jnp.take(
                nst, row_of, mode="clip")
            ccols, ctypes = _gather_captures(batch, caps, row_of, within)
            fcols.update(ccols)
            names += caps
            types += [ctypes[n] for n in caps]
        eschema = _rt(names, types)
        fake = Batch(fcols, jnp.ones((ecap,), jnp.bool_))
        ev = ExprEvaluator([lam.body], eschema)
        pairs, dicts = ev.project_pairs(fake)
        vals, valid = pairs[0]
        elem = Column(out_t.element, vals, valid, dicts[0])
        return ArrayColumn(out_t, nst, lens, elem, null_valid)

    def _apply_array_filter(self, batch: Batch, name: str):
        """filter(a, x -> pred) (velox/functions/prestosql/
        ArrayFilter-style lambda): predicate over the flat element
        lane, kept elements packed front, offsets rebuilt."""
        from velox_tpu.ops.sort import pack_indices
        from velox_tpu.types.types import row_type as _rt
        from velox_tpu.vector.column import ArrayColumn

        from velox_tpu.exec.collect_agg import element_owners

        e = self._array_filters[name]
        src = batch.column(e.args[0].name)
        assert isinstance(src, ArrayColumn)
        lam = e.args[1]
        param = lam.params[0]
        ecap = src.elements.capacity
        owner, within = element_owners(src.starts, src.lengths, ecap)
        fcols = {param: src.elements}
        names, types = [param], [src.dtype.element]
        caps = _lambda_capture_names(lam.body, lam.params, batch)
        if caps:
            ccols, ctypes = _gather_captures(batch, caps, owner, within)
            fcols.update(ccols)
            names += caps
            types += [ctypes[n] for n in caps]
        eschema = _rt(names, types)
        fake = Batch(fcols, jnp.ones((ecap,), jnp.bool_))
        ev = ExprEvaluator([lam.body], eschema)
        pairs, _dicts = ev.project_pairs(fake)
        pred, pvalid = pairs[0]
        keep = jnp.logical_and(within, pred)
        if pvalid is not None:          # null predicate -> drop
            keep = jnp.logical_and(keep, pvalid)
        kcnt = (jnp.zeros((batch.capacity,), jnp.int32)
                .at[jnp.where(keep, owner, batch.capacity)]
                .add(1, mode="drop"))
        perm = pack_indices(keep, ecap)
        elem = Column(src.elements.dtype,
                      jnp.take(src.elements.values, perm, mode="clip"),
                      _valid_take(src.elements.valid, perm),
                      src.elements.dictionary)
        nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        return ArrayColumn(out_t, nst, kcnt, elem, src.valid)

    def _apply_map_concat(self, batch: Batch, name: str):
        """map_concat(m1, m2) (MapConcat.cpp): combined tagged entry
        sort by (row, key, side); the LAST entry of each (row, key) run
        wins — the later map overrides duplicate keys."""
        from velox_tpu.ops.sort import pack_indices
        from velox_tpu.ops.sortkey import encode_sort_key
        from velox_tpu.vector.column import MapColumn

        from velox_tpu.vector.column import Dictionary

        e = self._map_concats[name]
        ca = batch.column(e.args[0].name)
        cb = batch.column(e.args[1].name)
        assert isinstance(ca, MapColumn) and isinstance(cb, MapColumn)

        def unify(colA, colB):
            """Merge two string lanes' dictionaries -> (merged dict,
            per-side code remap tables or None)."""
            da, db = colA.dictionary, colB.dictionary
            if da is None and db is None:
                return None, None, None
            if da is db:
                return da, None, None
            md = Dictionary(sorted(
                set(da.values if da is not None else ())
                | set(db.values if db is not None else ())))

            def table(d):
                t = np.full(len(d.values) + 1, -1, np.int32)
                for i, v in enumerate(d.values):
                    t[i + 1] = md.code_of(v)
                return jnp.asarray(t)

            return md, (None if da is None else table(da)), \
                (None if db is None else table(db))

        kdict, krem_a, krem_b = unify(ca.keys, cb.keys)
        vdict, vrem_a, vrem_b = unify(ca.values, cb.values)

        def remap(codes, t):
            return codes if t is None else jnp.take(
                t, jnp.clip(codes + 1, 0, t.shape[0] - 1), mode="clip")

        cap = batch.capacity
        null_valid = None
        for c in (ca, cb):
            if c.valid is not None:
                null_valid = (c.valid if null_valid is None
                              else jnp.logical_and(null_valid, c.valid))
        row_live = batch.sel
        if null_valid is not None:
            row_live = jnp.logical_and(row_live, null_valid)
        la = jnp.where(row_live, ca.lengths, 0)
        lb = jnp.where(row_live, cb.lengths, 0)
        totals = _fetch_np("ab_totals", jnp.stack([jnp.sum(la), jnp.sum(lb)]))
        eca = round_capacity(max(int(totals[0]), 1))
        ecb = round_capacity(max(int(totals[1]), 1))
        ecap = eca + ecb

        def expand(col, lens, ec, total):
            nst = (jnp.cumsum(lens) - lens).astype(jnp.int32)
            rows = jnp.arange(cap, dtype=jnp.int32)
            pos = jnp.where(lens > 0, nst, ec)
            heads = jnp.zeros((ec,), jnp.int32).at[pos].max(
                rows + 1, mode="drop")
            row_of = jnp.maximum(
                jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
            p = jnp.arange(ec, dtype=jnp.int32)
            ordinal = p - jnp.take(nst, row_of, mode="clip")
            in_run = p < total
            sidx = jnp.take(col.starts, row_of, mode="clip") + ordinal
            kv = jnp.take(col.keys.values, sidx, mode="clip")
            vv = jnp.take(col.values.values, sidx, mode="clip")
            vvd = _valid_take(col.values.valid, sidx)
            return row_of, in_run, kv, vv, vvd

        ra, ina, ka, va, vda = expand(ca, la, eca, totals[0])
        rb, inb, kb, vb, vdb = expand(cb, lb, ecb, totals[1])
        ka, kb = remap(ka, krem_a), remap(kb, krem_b)
        va, vb = remap(va, vrem_a), remap(vb, vrem_b)
        row_of = jnp.concatenate([ra, rb])
        in_run = jnp.concatenate([ina, inb])
        kv = jnp.concatenate([ka, kb])
        vv = jnp.concatenate([va, vb])
        if vda is None and vdb is None:
            vvd = None
        else:
            vvd = jnp.concatenate([
                jnp.ones((eca,), jnp.bool_) if vda is None else vda,
                jnp.ones((ecb,), jnp.bool_) if vdb is None else vdb])
        tag = jnp.concatenate([jnp.zeros((eca,), jnp.int32),
                               jnp.ones((ecb,), jnp.int32)])
        row_key = jnp.where(in_run, row_of, jnp.int32(cap))
        kops = encode_sort_key(kv, None)
        p = jnp.arange(ecap, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(
            [row_key, *kops, tag, p], is_stable=True,
            num_keys=2 + len(kops))
        sperm = sorted_ops[-1]
        srow = sorted_ops[0]
        diff = jnp.zeros((ecap,), jnp.bool_).at[0].set(True)
        for kk in sorted_ops[:1 + len(kops)]:
            diff = jnp.logical_or(diff, jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), kk[1:] != kk[:-1]]))
        # run END wins (later map overrides)
        nxt = jnp.concatenate([diff[1:], jnp.ones((1,), jnp.bool_)])
        keep_sorted = jnp.logical_and(nxt, srow < cap)
        perm = jnp.take(sperm, pack_indices(keep_sorted, ecap),
                        mode="clip")
        kcnt = (jnp.zeros((cap,), jnp.int32)
                .at[jnp.where(keep_sorted, srow, cap)]
                .add(1, mode="drop"))
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        nk = Column(out_t.key, jnp.take(kv, perm, mode="clip"), None,
                    kdict)
        nv = Column(out_t.value, jnp.take(vv, perm, mode="clip"),
                    _valid_take(vvd, perm), vdict)
        nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
        return MapColumn(out_t, nst, kcnt, nk, nv, null_valid)

    def _apply_split(self, batch: Batch, name: str):
        """split(s, delim [, limit]) — velox/functions/prestosql/
        SplitFunctions.cpp (limit keeps the remainder in the last
        piece). Splitting runs once per DISTINCT string on host; the
        device sees two table gathers + the standard expansion."""
        from velox_tpu.expr.ir import Literal as _Lit
        from velox_tpu.vector.column import ArrayColumn, Dictionary

        e = self._splits_fn[name]
        src = batch.column(e.args[0].name)
        d = src.dictionary
        assert d is not None, "split requires a dictionary string input"
        assert all(isinstance(a, _Lit) for a in e.args[1:]), (
            "split delimiter/limit must be literals")
        delim = e.args[1].value
        if e.name == "split":
            limit = int(e.args[2].value) if len(e.args) > 2 else None
            pieces = [
                (str(v).split(delim) if limit is None
                 else str(v).split(delim, limit - 1))
                for v in d.values]
        elif e.name == "regexp_split":
            import re as _re

            from velox_tpu.functions.hostfns import _java_regex

            rx = _re.compile(_java_regex(delim))
            pieces = [rx.split(str(v)) for v in d.values]
        else:  # regexp_extract_all(s, pattern [, group])
            import re as _re

            from velox_tpu.functions.hostfns import _java_regex

            rx = _re.compile(_java_regex(delim))
            grp = int(e.args[2].value) if len(e.args) > 2 else 0
            pieces = [
                [m.group(grp) or "" for m in rx.finditer(str(v))]
                for v in d.values]
        nd = Dictionary(sorted({p for ps in pieces for p in ps}))
        lens_t = np.zeros(len(d.values) + 1, np.int32)
        flat: list = []
        starts_t = np.zeros(len(d.values) + 1, np.int32)
        for i, ps in enumerate(pieces):
            starts_t[i + 1] = len(flat)
            lens_t[i + 1] = len(ps)
            flat.extend(nd.code_of(x) for x in ps)
        flat_t = np.asarray(flat or [0], np.int32)

        codes = src.values
        lens = jnp.take(jnp.asarray(lens_t),
                        jnp.clip(codes + 1, 0, len(d.values)),
                        mode="clip")
        valid = batch.sel
        if src.valid is not None:
            valid = jnp.logical_and(valid, src.valid)
        lens = jnp.where(valid, lens, 0)
        total = _fetch_int("lens_total", jnp.sum(lens))  # one host sync
        ecap = round_capacity(max(total, 1))
        starts = (jnp.cumsum(lens) - lens).astype(jnp.int32)
        rows = jnp.arange(batch.capacity, dtype=jnp.int32)
        pos = jnp.where(lens > 0, starts, ecap)
        heads = jnp.zeros((ecap,), jnp.int32).at[pos].max(
            rows + 1, mode="drop")
        row_of = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
        p = jnp.arange(ecap, dtype=jnp.int32)
        ordinal = p - jnp.take(starts, row_of, mode="clip")
        rcode = jnp.take(codes, row_of, mode="clip")
        src_idx = (jnp.take(jnp.asarray(starts_t),
                            jnp.clip(rcode + 1, 0, len(d.values)),
                            mode="clip") + ordinal)
        ev = jnp.take(jnp.asarray(flat_t), src_idx, mode="clip")
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        return ArrayColumn(
            out_t, starts, lens,
            Column(out_t.element, ev, None, nd),
            src.valid)

    def _apply_setop(self, batch: Batch, name: str):
        """array_intersect / array_except / array_union /
        arrays_overlap (velox/functions/prestosql/ArrayIntersectExcept
        .cpp, ArraysOverlapFunction.h): expand both arrays into one
        tagged element table, sort by (row, value, side, arrival);
        each (row, value) run head decides membership. Output arrival
        order = (side, ordinal) of the kept element. Null rows -> null;
        string arrays must share one dictionary (same-table columns)."""
        from velox_tpu.ops.sortkey import encode_sort_key
        from velox_tpu.vector.column import ArrayColumn

        e = self._setops[name]
        ca = batch.column(e.args[0].name)
        cb = batch.column(e.args[1].name)
        assert isinstance(ca, ArrayColumn) and isinstance(cb, ArrayColumn)
        if (ca.elements.dictionary is not None
                or cb.elements.dictionary is not None):
            assert ca.elements.dictionary is cb.elements.dictionary, (
                f"{e.name}: string arrays must share a dictionary "
                "(cross-table string set ops not supported)")
        cap = batch.capacity
        null_valid = None                      # null iff an input is null
        for c in (ca, cb):
            if c.valid is not None:
                null_valid = (c.valid if null_valid is None
                              else jnp.logical_and(null_valid, c.valid))
        row_live = batch.sel
        if null_valid is not None:
            row_live = jnp.logical_and(row_live, null_valid)
        la = jnp.where(row_live, ca.lengths, 0)
        lb = jnp.where(row_live, cb.lengths, 0)
        totals = _fetch_np("ab_totals2", jnp.stack(
            [jnp.sum(la), jnp.sum(lb)]))           # one host sync
        eca = round_capacity(max(int(totals[0]), 1))
        ecb = round_capacity(max(int(totals[1]), 1))
        ecap = eca + ecb

        def expand(col, lens, ec, total):
            nst = (jnp.cumsum(lens) - lens).astype(jnp.int32)
            rows = jnp.arange(cap, dtype=jnp.int32)
            pos = jnp.where(lens > 0, nst, ec)
            heads = jnp.zeros((ec,), jnp.int32).at[pos].max(
                rows + 1, mode="drop")
            row_of = jnp.maximum(
                jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
            p = jnp.arange(ec, dtype=jnp.int32)
            ordinal = p - jnp.take(nst, row_of, mode="clip")
            in_run = p < total
            src = jnp.take(col.starts, row_of, mode="clip") + ordinal
            ev = jnp.take(col.elements.values, src, mode="clip")
            evd = (None if col.elements.valid is None else
                   jnp.take(col.elements.valid, src, mode="clip"))
            return row_of, ordinal, in_run, ev, evd

        ra, oa, ina, eva, evda = expand(ca, la, eca, totals[0])
        rb, ob, inb, evb, evdb = expand(cb, lb, ecb, totals[1])
        row_of = jnp.concatenate([ra, rb])
        ordinal = jnp.concatenate([oa, ob])
        in_run = jnp.concatenate([ina, inb])
        ev = jnp.concatenate([eva, evb])
        if evda is None and evdb is None:
            evd = None
        else:
            one = jnp.ones((eca,), jnp.bool_)
            evd = jnp.concatenate([
                one if evda is None else evda,
                jnp.ones((ecb,), jnp.bool_) if evdb is None else evdb])
        tag = jnp.concatenate([jnp.zeros((eca,), jnp.int32),
                               jnp.ones((ecb,), jnp.int32)])
        row_key = jnp.where(in_run, row_of, jnp.int32(cap))
        vops = encode_sort_key(ev, evd)
        p = jnp.arange(ecap, dtype=jnp.int32)
        sorted_ops = jax.lax.sort(
            [row_key, *vops, tag, ordinal, p], is_stable=True,
            num_keys=3 + len(vops))
        sperm = sorted_ops[-1]
        srow = sorted_ops[0]
        stag = sorted_ops[-3]
        # (row, value) run boundaries
        diff = jnp.zeros((ecap,), jnp.bool_).at[0].set(True)
        for kk in sorted_ops[:1 + len(vops)]:
            diff = jnp.logical_or(diff, jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), kk[1:] != kk[:-1]]))
        rid = (jnp.cumsum(diff.astype(jnp.int32)) - 1).astype(jnp.int32)
        live = srow < cap
        has_a = (jnp.zeros((ecap,), jnp.bool_)
                 .at[jnp.where(live, rid, ecap)]
                 .max(stag == 0, mode="drop"))
        has_b = (jnp.zeros((ecap,), jnp.bool_)
                 .at[jnp.where(live, rid, ecap)]
                 .max(stag == 1, mode="drop"))
        both = jnp.logical_and(jnp.take(has_a, rid, mode="clip"),
                               jnp.take(has_b, rid, mode="clip"))
        if e.name == "arrays_overlap":
            hit = (jnp.zeros((cap,), jnp.bool_)
                   .at[jnp.where(jnp.logical_and(diff, both), srow, cap)]
                   .max(True, mode="drop"))
            return Column(BOOLEAN, hit, null_valid)
        if e.name == "array_intersect":
            keep_sorted = jnp.logical_and(
                jnp.logical_and(diff, live),
                jnp.logical_and(stag == 0, both))
        elif e.name == "array_except":
            keep_sorted = jnp.logical_and(
                jnp.logical_and(diff, live),
                jnp.logical_and(
                    stag == 0,
                    ~jnp.take(has_b, rid, mode="clip")))
        else:                                       # array_union
            keep_sorted = jnp.logical_and(diff, live)
        keep = (jnp.zeros((ecap,), jnp.bool_)
                .at[sperm].set(keep_sorted, mode="drop"))
        kcnt = (jnp.zeros((cap,), jnp.int32)
                .at[jnp.where(keep, row_of, cap)]
                .add(1, mode="drop"))
        row_key2 = jnp.where(keep, row_of, jnp.int32(cap))
        _, _, _, perm2 = jax.lax.sort(
            [row_key2, tag, ordinal, p], is_stable=True, num_keys=3)
        dv = jnp.take(ev, perm2, mode="clip")
        dvd = None if evd is None else jnp.take(evd, perm2, mode="clip")
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        dst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
        elem = Column(out_t.element, dv, dvd, ca.elements.dictionary)
        return ArrayColumn(out_t, dst, kcnt, elem, null_valid)

    def _make_row(self, batch: Batch, name: str, by_name, types):
        """row_constructor(...) -> RowColumn: scalar fields come from the
        fused projection's synthetic "name#fi" lanes, complex fields
        pass through by reference (velox RowConstructor special form).
        The result row is never null (Presto semantics) — field nulls
        live in the children."""
        from velox_tpu.expr.ir import FieldRef as _FR
        from velox_tpu.vector.column import RowColumn

        rt = types[name]
        e = self._row_ctors[name]
        kids = []
        for i, (ct, a) in enumerate(zip(rt.children, e.args)):
            if ct.kind in (TypeKind.ARRAY, TypeKind.MAP, TypeKind.ROW):
                assert isinstance(a, _FR), (
                    "row_constructor: complex fields must be column "
                    "references")
                kids.append(_extract_row_path(batch, a.name, ct))
            else:
                (vals, valid), d = by_name[f"{name}#f{i}"]
                kids.append(Column(ct, vals, valid, d))
        return RowColumn(rt, tuple(kids), None)

    def _apply_map_entries(self, batch: Batch, name: str):
        """map_entries(m) -> ARRAY(ROW(key,value)) sharing the map's
        offsets and flat key/value lanes — zero device work
        (velox/functions/prestosql/MapEntries.cpp)."""
        from velox_tpu.vector.column import ArrayColumn, MapColumn, RowColumn

        e = self._map_entries[name]
        src = batch.column(e.args[0].name)
        assert isinstance(src, MapColumn)
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        elem = RowColumn(out_t.element, (src.keys, src.values), None)
        return ArrayColumn(out_t, src.starts, src.lengths, elem,
                           src.valid)

    def _apply_zip(self, batch: Batch, name: str):
        """zip(a, b, ...) -> ARRAY(ROW(...)): output length per row is
        the max input length; shorter inputs contribute null fields
        (velox/functions/prestosql/Zip.cpp:32-41). One output expansion
        shared by every field; each field gathers positionwise from its
        own source elements."""
        from velox_tpu.vector.column import ArrayColumn, RowColumn

        e = self._zips[name]
        out_t = dict(zip(self.node.names,
                         self.output_type.children))[name]
        srcs = [batch.column(a.name) for a in e.args]
        cap = batch.capacity
        null_valid = None
        for c in srcs:
            if c.valid is not None:
                null_valid = (c.valid if null_valid is None
                              else jnp.logical_and(null_valid, c.valid))
        row_live = batch.sel
        if null_valid is not None:
            row_live = jnp.logical_and(row_live, null_valid)
        lens_in = [jnp.where(row_live, c.lengths, 0) for c in srcs]
        lens = lens_in[0]
        for l in lens_in[1:]:
            lens = jnp.maximum(lens, l)
        lens = lens.astype(jnp.int32)
        total = _fetch_int("lens_total", jnp.sum(lens))  # one host sync
        ecap = round_capacity(max(total, 1))
        nst = (jnp.cumsum(lens) - lens).astype(jnp.int32)
        rows = jnp.arange(cap, dtype=jnp.int32)
        pos = jnp.where(lens > 0, nst, ecap)
        heads = jnp.zeros((ecap,), jnp.int32).at[pos].max(
            rows + 1, mode="drop")
        row_of = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
        p = jnp.arange(ecap, dtype=jnp.int32)
        ordinal = p - jnp.take(nst, row_of, mode="clip")
        kids = []
        rt = out_t.element
        for c, li, ct in zip(srcs, lens_in, rt.children):
            in_range = ordinal < jnp.take(li, row_of, mode="clip")
            idx = jnp.take(c.starts, row_of, mode="clip") + ordinal
            v = jnp.take(c.elements.values, idx, mode="clip")
            vd = _valid_take(c.elements.valid, idx)
            vd = (in_range if vd is None
                  else jnp.logical_and(vd, in_range))
            kids.append(Column(ct, v, vd, c.elements.dictionary))
        elem = RowColumn(rt, tuple(kids), None)
        return ArrayColumn(out_t, nst, lens, elem, null_valid)

    def add_input(self, batch: Batch) -> None:
        pairs, dicts = self._eval.project_pairs(batch)
        types = dict(zip(self.node.names, self.output_type.children))
        by_name = dict(zip(self._scalar_names, zip(pairs, dicts)))
        cols = {}
        for name in self.node.names:
            if name in self._array_pass:
                # plain passthrough, or an ARRAY-typed child of a ROW
                # column referenced by dotted subfield path
                cols[name] = _extract_row_path(
                    batch, self._array_pass[name], types[name])
            elif name in self._transforms:
                cols[name] = self._apply_transform(batch, name)
            elif name in self._sequences:
                cols[name] = self._apply_sequence(batch, name)
            elif name in self._slices:
                cols[name] = self._apply_slice(batch, name)
            elif name in self._reorders:
                cols[name] = self._apply_reorder(batch, name)
            elif name in self._setops:
                cols[name] = self._apply_setop(batch, name)
            elif name in self._splits_fn:
                cols[name] = self._apply_split(batch, name)
            elif name in self._map_lams:
                cols[name] = self._apply_map_lambda(batch, name)
            elif name in self._array_filters:
                cols[name] = self._apply_array_filter(batch, name)
            elif name in self._array_combos:
                cols[name] = self._apply_array_combo(batch, name)
            elif name in self._map_concats:
                cols[name] = self._apply_map_concat(batch, name)
            elif name in self._map_projs:
                from velox_tpu.vector.column import ArrayColumn, MapColumn

                src_name, which = self._map_projs[name]
                src = batch.column(src_name)
                assert isinstance(src, MapColumn)
                elem = (src.keys if which == "map_keys" else src.values)
                cols[name] = ArrayColumn(
                    types[name], src.starts, src.lengths, elem, src.valid)
            elif name in self._row_ctors:
                cols[name] = self._make_row(batch, name, by_name, types)
            elif name in self._row_pass:
                cols[name] = _extract_row_path(
                    batch, self._row_pass[name], types[name])
            elif name in self._row_sub:
                cols[name] = _extract_row_path(
                    batch, self._row_sub[name], types[name])
            elif name in self._map_entries:
                cols[name] = self._apply_map_entries(batch, name)
            elif name in self._zips:
                cols[name] = self._apply_zip(batch, name)
            elif name in self._ext:
                from velox_tpu.exec.complex_fns import EXT_APPLIERS

                e = self._ext[name]
                cols[name] = EXT_APPLIERS[e.name](
                    self, batch, e, types[name])
            else:
                (vals, valid), d = by_name[name]
                cols[name] = Column(types[name], vals, valid, d)
        self._queue.append(Batch(cols, batch.sel, batch.num_rows))

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


# ------------------------------------------------------------ aggregation

#: kArray mode cap: direct-addressed accumulators
# (velox/exec/HashTable.h:143 kArrayHashMaxSize analog)
_MAX_ARRAY_GROUPS = 1 << 20


class HashAggregationOp(Operator):
    """velox/exec/HashAggregation.cpp + GroupingSet.cpp re-designed:

    * kArray mode (all keys dictionary-encoded, small product): persistent
      direct-addressed accumulators, one jitted scatter-reduce per batch
      (VectorHasher value-id mode, velox/exec/VectorHasher.h:127-136).
    * generic mode: per-batch sort-based grouping producing (group keys,
      accumulator lanes) partials; one global merge at output — the
      partial/final companion pattern (velox/exec/
      AggregateCompanionAdapter.h:24) done inside one operator.
    """

    blocking = True

    def __init__(self, node: AggregationNode):
        super().__init__(node)
        self.step = node.step
        self.keys = list(node.keys)
        self.specs = list(node.aggregates)
        if self.step == AggStep.FINAL:
            # masks apply to RAW input only (velox/exec/Aggregate.h
            # addRawInput vs addIntermediateResults): the partial step
            # already consumed them; final inputs are lane columns
            import dataclasses as _dc

            self.specs = [_dc.replace(s, mask=None) for s in self.specs]
        self.agg_names = list(node.agg_names)
        in_schema = node.source.output_type
        self.fns = [lookup_aggregate(s.fn) for s in self.specs]
        self.has_distinct = any(s.distinct for s in self.specs)
        if self.has_distinct and self.step != AggStep.SINGLE:
            raise NotImplementedError(
                "distinct aggregates only in single-step aggregation")
        if (self.step != AggStep.SINGLE
                and any(lane.width > 256
                        for fn in self.fns for lane in fn.lanes)):
            raise NotImplementedError(
                "very wide matrix lanes (approx_distinct HLL registers) "
                "are single-step only: emitting thousands of "
                "name$lane@slot partial columns is not sensible")
        if any(s.distinct and isinstance(s.arg, tuple)
               for s in self.specs):
            raise NotImplementedError(
                "DISTINCT over multi-argument aggregates")
        if self.step == AggStep.SINGLE:
            self._collect = [i for i, f in enumerate(self.fns)
                             if f.collect_kind is not None]
            self._collect_final = False
        else:
            # collect aggregates with lane companions (approx_percentile
            # digest lanes) run the lane machinery; array/set/map_agg
            # gain partial/final page forms (partial emits the collected
            # ARRAY/MAP page, FINAL re-expands to element rows —
            # velox/exec/AggregateCompanionAdapter.h:24 companions with
            # the page as the serialized accumulator); other collect
            # kinds stay single-step
            pure = [f for f in self.fns
                    if f.collect_kind is not None and not f.lanes]
            self._collect = []
            self._collect_final = False
            if pure:
                if len(pure) != len(self.fns) or any(
                        f.collect_kind not in ("array", "set", "map")
                        for f in pure):
                    raise NotImplementedError(
                        "partial/final collect planning supports "
                        "nodes whose aggregates are ALL array_agg/"
                        "set_agg/map_agg; other collect aggregates "
                        "(map_union, histogram, ...) are single-step")
                self._collect = list(range(len(self.fns)))
                self._collect_final = self.step == AggStep.FINAL
                if self._collect_final and len(self.fns) > 1:
                    raise NotImplementedError(
                        "FINAL collect expansion supports one collect "
                        "aggregate per node (element capacities "
                        "differ per aggregate)")
        if any(self.specs[i].distinct for i in self._collect):
            raise NotImplementedError(
                "DISTINCT over collect aggregates")
        #: collect output column suffix (partial pages are name$0)
        self._collect_suffix = (
            "$0" if (self._collect and self.step == AggStep.PARTIAL)
            else "")
        self._raw_batches: List[Batch] = []
        # input value types per aggregate (None for count(*)); for FINAL
        # the first lane's type stands in for the raw input type (every
        # aggregate's lane-0 dtype equals its input-derived dtype)
        self.arg_types: List[Optional[DataType]] = []
        self.lane_names: List[List[str]] = []
        new_specs = list(self.specs)
        for si, (s, name, fn) in enumerate(
                zip(self.specs, node.agg_names, self.fns)):
            if self.step == AggStep.FINAL and self._collect_final:
                # collect FINAL: input is the partial page column
                # name$0; add_input expands it to element rows named
                # here (velox addIntermediateResults analog)
                import dataclasses as _dc

                page_t = in_schema.find_child(f"{name}$0")
                if fn.collect_kind == "map":
                    arg = (f"{name}@k", f"{name}@v")
                    self.arg_types.append(
                        (page_t.key, page_t.value))
                else:
                    arg = f"{name}@e"
                    self.arg_types.append(page_t.element)
                new_specs[si] = _dc.replace(s, arg=arg)
                self.lane_names.append([])
                continue
            if self.step == AggStep.FINAL:
                # lane_names entries are per-lane COLUMN GROUPS: one
                # column for scalar lanes, width columns for matrix
                # lanes (name$lane@slot)
                lts = []
                groups = []
                for i, lane in enumerate(fn.lanes):
                    if lane.width == 1:
                        lts.append(in_schema.find_child(f"{name}${i}"))
                        groups.append([f"{name}${i}"])
                    else:
                        lts.append(
                            in_schema.find_child(f"{name}${i}@0"))
                        groups.append([f"{name}${i}@{j}"
                                       for j in range(lane.width)])
                self.arg_types.append(
                    fn.resolve_input_type(tuple(lts)))
                self.lane_names.append(groups)
            else:
                if s.arg is None:
                    self.arg_types.append(None)
                elif isinstance(s.arg, tuple):
                    self.arg_types.append(tuple(
                        in_schema.find_child(a) for a in s.arg))
                else:
                    self.arg_types.append(in_schema.find_child(s.arg))
                self.lane_names.append([])

        self.specs = new_specs

        def _arg_fields(s):
            if s.arg is None or (self.step == AggStep.FINAL
                                 and not self._collect_final):
                return []
            return list(s.arg) if isinstance(s.arg, tuple) else [s.arg]

        self._needed = list(dict.fromkeys(
            self.keys
            + [a for s in self.specs for a in _arg_fields(s)]
            + [s.mask for s in self.specs if s.mask is not None]
            + [n for lanes in self.lane_names
               for grp in lanes for n in grp]))
        from velox_tpu.exec.spill import PartitionedEntryStore

        #: generic-mode partials: device entries with hash-partitioned
        #: host spill + one-partition-at-a-time merge restore
        self._store = PartitionedEntryStore(f"agg:{node.id}")
        self._pending_parts: Optional[List[list]] = None
        self._array_state = None        # kArray mode persistent accs
        self._mode: Optional[str] = None
        self._key_dicts: Dict[str, Dictionary] = {}
        self._outputs: collections.deque = collections.deque()
        self._emitted = False
        self._array_jit = None
        self._generic_jit = None
        self._merge_jit = None
        #: adaptive partial aggregation state (velox
        #: abandonPartialAggregationEarly analog)
        self.abandoned = False
        self._abandon_checked = False
        self._rows_seen_cap = 0
        self._passthrough_jit = None

    # ----------------------------------------------------------- helpers
    @staticmethod
    def _lane_arrays(cols, lane_groups):
        """FINAL-step lane reconstruction: scalar lanes read one column,
        matrix lanes stack their ``name$lane@slot`` columns to (G, w)."""
        out = []
        for grp in lane_groups:
            if len(grp) == 1:
                out.append(cols[grp[0]][0])
            else:
                out.append(jnp.stack([cols[n][0] for n in grp], axis=1))
        return tuple(out)

    def _agg_inputs(self, cols, sel):
        """Per-agg (values|lanes, mask) for accumulate/combine (traced)."""
        out = []
        for spec, fn, at, name, lanes in zip(
                self.specs, self.fns, self.arg_types, self.agg_names,
                self.lane_names):
            mask = sel
            if spec.mask is not None:
                mvals, mvalid = cols[spec.mask]
                mask = jnp.logical_and(mask, mvals)
                if mvalid is not None:
                    mask = jnp.logical_and(mask, mvalid)
            if self.step == AggStep.FINAL:
                out.append((self._lane_arrays(cols, lanes), mask))
            elif spec.arg is None:
                out.append((None, mask))
            elif isinstance(spec.arg, tuple):
                # multi-arg (min_by, covar, corr ...): values is a tuple
                # of (vals, valid) pairs; per-arg null semantics are the
                # aggregate's own business (velox/exec/Aggregate.h rawInput
                # args vector)
                out.append((tuple(cols[a] for a in spec.arg), mask))
            else:
                avals, avalid = cols[spec.arg]
                if avalid is not None:
                    mask = jnp.logical_and(mask, avalid)
                out.append((avals, mask))
        return out

    def _init_accs(self, cap: int):
        return [
            tuple(jnp.full(
                (cap,) if lane.width == 1 else (cap, lane.width),
                lane.init_of(at), dtype=lane.dtype_of(at))
                for lane in fn.lanes)
            for fn, at in zip(self.fns, self.arg_types)]

    def _decide_mode(self, batch: Batch) -> str:
        return self.decide_mode_dicts({
            k: batch.column(k).dictionary for k in self.keys})

    def decide_mode_dicts(self, key_dicts) -> str:
        if self._mode is not None:
            return self._mode
        if self._collect:
            # collect aggregates buffer raw rows; one global grouping at
            # finish (exec/collect_agg.py)
            self._mode = "collect"
            return self._mode
        if self.has_distinct:
            self._mode = "generic"
            return self._mode
        if self.keys:
            dicts = []
            for k in self.keys:
                d = key_dicts.get(k)
                if d is None:
                    dicts = None
                    break
                dicts.append(d)
            if dicts is not None:
                prod = 1
                for d in dicts:
                    prod *= len(d) + 1  # +1 null slot
                if prod <= _MAX_ARRAY_GROUPS:
                    self._mode = "array"
                    self._radices = [len(d) + 1 for d in dicts]
                    self._num_groups = prod
                    self._key_dicts = {
                        k: d for k, d in zip(self.keys, dicts)}
                    return self._mode
        self._mode = "generic"
        return self._mode

    def _expand_collect_pages(self, batch: Batch) -> Batch:
        """FINAL collect step: expand the partial ARRAY/MAP page column
        back into element rows (group keys gathered by owning row) so
        the SINGLE-step collect kernels re-run unchanged — the
        addIntermediateResults analog (velox/exec/Aggregate.h:227)."""
        from velox_tpu.exec.collect_agg import element_owners
        from velox_tpu.vector.column import ArrayColumn, MapColumn

        name = self.agg_names[0]
        fn = self.fns[0]
        page = batch.column(f"{name}$0")
        ecap = (page.keys.capacity if isinstance(page, MapColumn)
                else page.elements.capacity)
        owner, within = element_owners(
            page.starts, page.lengths, ecap)
        sel = jnp.logical_and(
            within, jnp.take(batch.sel, owner, mode="clip"))
        cols: Dict[str, Column] = {}
        for k in self.keys:
            cols[k] = batch.column(k).gather(owner)
        if isinstance(page, MapColumn):
            cols[f"{name}@k"] = page.keys
            cols[f"{name}@v"] = page.values
        else:
            cols[f"{name}@e"] = page.elements
        return Batch(cols, sel)

    # ------------------------------------------------------------- input
    def add_input(self, batch: Batch) -> None:
        self.stats.input_batches += 1
        mode = self._decide_mode(batch)
        for k in self.keys:
            d = batch.column(k).dictionary
            if d is not None:
                self._key_dicts.setdefault(k, d)
        if mode == "collect":
            if self._collect_final:
                batch = self._expand_collect_pages(batch)
            self._raw_batches.append(batch.project(self._needed))
            return
        cols = _cols_of(batch, self._needed)
        if mode == "array":
            self._add_array(cols, batch.sel)
        else:
            self._add_generic(cols, batch.sel, batch.capacity)

    def ensure_array_state(self) -> dict:
        if self._array_state is None:
            G = self._num_groups
            self._array_state = {
                "accs": self._init_accs(G),
                "seen": jnp.zeros((G,), jnp.bool_),
            }
        return self._array_state

    def make_array_fn(self):
        """Pure per-batch kArray step (composable into fused kernels)."""
        radices = self._radices
        keys = self.keys
        is_final = self.step == AggStep.FINAL
        G = self._num_groups

        def fn(cols, sel, accs_in, seen):
            vids = []
            for k, radix in zip(keys, radices):
                values, valid = cols[k]
                code = values.astype(jnp.int32)
                null_id = radix - 1
                vid = jnp.where(code < 0, jnp.int32(null_id), code)
                if valid is not None:
                    vid = jnp.where(valid, vid, jnp.int32(null_id))
                vids.append(vid)
            gids = group_ids_array(vids, radices, sel, G)
            inputs = self._agg_inputs(cols, sel)

            multi = (not is_final) and self._try_multi_sum(
                gids, sel, inputs, accs_in, seen, G)
            if multi is not None:
                return multi

            seen = seen.at[gids].set(True, mode="drop")
            accs_out = []
            for f, accs, (vals, mask) in zip(self.fns, accs_in, inputs):
                if is_final:
                    accs_out.append(f.combine(accs, gids, vals, mask))
                else:
                    accs_out.append(f.accumulate(accs, gids, vals, mask))
            return accs_out, seen

        return fn

    def _try_multi_sum(self, gids, sel, inputs, accs_in, seen, G):
        """All-additive kArray aggregation in ONE pallas launch (every
        lane an exact digit-split sum on the MXU). None if ineligible."""
        from velox_tpu.utils.config import config as cfg
        from velox_tpu.ops.pallas_agg import pallas_available

        if not cfg.narrow_lanes or not (2 <= G <= 128):
            return None
        if not pallas_available():
            # interpret-mode pallas on CPU is far slower than the
            # generic per-aggregate scatter path (r2 verdict weak #2)
            return None
        for spec, fn, (vals, mask) in zip(self.specs, self.fns, inputs):
            if spec.fn not in ("sum", "count", "count_if", "avg"):
                return None
            if vals is not None and not jnp.issubdtype(
                    vals.dtype, jnp.integer):
                return None
        from velox_tpu.ops.pallas_agg import grouped_multi_sum_i32

        contribs = []
        layout = []  # (agg index, lane index, left-shift) per row
        for ai, (fn, (vals, mask)) in enumerate(zip(self.fns, inputs)):
            if vals is not None:
                if jnp.dtype(vals.dtype).itemsize <= 4:
                    contribs.append(
                        jnp.where(mask, vals.astype(jnp.int32), 0))
                    layout.append((ai, 0, 0))
                else:
                    # wide value: two signed i32 halves (lo 28 bits, hi)
                    v = jnp.where(mask, vals, jnp.zeros((), vals.dtype))
                    s = jnp.where(v >= 0, 1, -1).astype(vals.dtype)
                    a = jnp.where(v >= 0, v, -v)
                    contribs.append(
                        (s * (a & 0x0FFFFFFF)).astype(jnp.int32))
                    layout.append((ai, 0, 0))
                    contribs.append((s * (a >> 28)).astype(jnp.int32))
                    layout.append((ai, 0, 28))
                contribs.append(mask.astype(jnp.int32))
                layout.append((ai, 1, 0))
            else:  # count(*) / count_if: single count lane
                contribs.append(mask.astype(jnp.int32))
                layout.append((ai, 0, 0))
        contribs.append(sel.astype(jnp.int32))  # "seen" groups
        sums = grouped_multi_sum_i32(
            gids, jnp.stack(contribs), G, interpret=False)
        accs_out = [list(a) for a in accs_in]
        for row, (ai, li, shift) in enumerate(layout):
            delta = sums[row] << shift if shift else sums[row]
            accs_out[ai][li] = (
                accs_out[ai][li] + delta.astype(accs_in[ai][li].dtype))
        seen = jnp.logical_or(seen, sums[-1] > 0)
        return [tuple(a) for a in accs_out], seen

    def _add_array(self, cols, sel) -> None:
        st = self.ensure_array_state()
        if self._array_jit is None:
            self._array_jit = cached_jit(
                ("agg_array", self.node.id, tuple(self._radices)),
                self.make_array_fn)
        st["accs"], st["seen"] = self._array_jit(
            cols, sel, st["accs"], st["seen"])

    def _add_generic(self, cols, sel, cap: int) -> None:
        if self.step == AggStep.FINAL:
            # buffer partial groups directly; merge at output
            self._store.append({
                "keys": [cols[k] for k in self.keys],
                "lanes": [
                    self._lane_arrays(cols, lanes)
                    for lanes in self.lane_names],
                "sel": sel,
                "distinct": [None] * len(self.specs),
            })
            return
        if self.abandoned:
            self._add_passthrough(cols, sel)
            return
        if self._generic_jit is None:
            self._generic_jit = cached_jit(
                ("agg_generic", self.node.id), self.make_generic_fn)
        gkeys, lanes_out, group_sel, dreps = self._generic_jit(cols, sel)
        self.push_generic_entry(gkeys, lanes_out, group_sel, dreps)
        self._maybe_abandon(sel, group_sel, cap)

    # ---------------------------------------- adaptive partial (D.6)
    def _maybe_abandon(self, sel, group_sel, cap: int) -> None:
        """Adaptive partial aggregation (velox HashAggregation.cpp
        abandonPartialAggregationEarly / QueryConfig
        abandon_partial_aggregation_min_*): once enough rows have been
        seen, ONE host sync measures the reduction ratio; a partial that
        isn't reducing stops sorting and forwards rows as
        singleton-group partials for the FINAL step to do all the work.
        """
        from velox_tpu.utils.config import config

        if (self.step != AggStep.PARTIAL or self.abandoned
                or self._abandon_checked or not self.keys):
            return
        self._rows_seen_cap += cap
        if self._rows_seen_cap < config.abandon_partial_agg_min_rows:
            return
        self._abandon_checked = True
        from velox_tpu.utils.testvalue import TestValue

        TestValue.adjust("velox_tpu.agg.abandon_check", self)
        rows = _fetch_int("adapt_rows", jnp.sum(sel.astype(jnp.int32)))
        groups = _fetch_int("adapt_groups", jnp.sum(group_sel.astype(jnp.int32)))
        if rows > 0 and groups / rows >= config.abandon_partial_agg_min_pct:
            self.abandoned = True
            self.stats.runtime["abandoned_partial_agg"] = 1.0

    def _add_passthrough(self, cols, sel) -> None:
        """Abandoned mode: every row becomes its own group (gid = row) —
        no sort, just lane initialization + a masked identity scatter."""
        if self._passthrough_jit is None:
            def make():
                def fn(cols, sel):
                    cap = sel.shape[0]
                    gids = jnp.arange(cap, dtype=jnp.int32)
                    inputs = self._agg_inputs(cols, sel)
                    lanes = []
                    for f, accs, (vals, mask) in zip(
                            self.fns, self._init_accs(cap), inputs):
                        accs = f.accumulate(
                            tuple(accs), gids, vals, mask)
                        lanes.append(tuple(accs))
                    gkeys = [cols[k] for k in self.keys]
                    return gkeys, lanes, sel
                return fn

            self._passthrough_jit = cached_jit(
                ("agg_passthrough", self.node.id), make)
        gkeys, lanes, out_sel = self._passthrough_jit(cols, sel)
        self.push_generic_entry(
            gkeys, lanes, out_sel, [None] * len(self.specs))

    def make_generic_fn(self):
        """Pure per-batch sort-group step (composable into fused kernels)."""
        keys = self.keys

        if True:
            def fn(cols, sel):
                cap = sel.shape[0]
                inputs = self._agg_inputs(cols, sel)
                if not keys:
                    # keyless: 1-slot accumulators, no sort, no big lanes
                    gids = jnp.where(sel, jnp.int32(0), jnp.int32(1))
                    group_rows = jnp.zeros((1,), jnp.int32)
                    group_sel = jnp.zeros((1,), jnp.bool_).at[0].set(
                        jnp.any(sel))
                    acc_cap = 1
                else:
                    pairs = [cols[k] for k in keys]
                    gids, group_rows, group_sel, _ = group_ids_sorted(
                        pairs, sel)
                    acc_cap = cap
                lanes_out = []
                for f, spec, accs, (vals, mask) in zip(
                        self.fns, self.specs, self._init_accs(acc_cap),
                        inputs):
                    if spec.distinct:
                        lanes_out.append(None)
                    else:
                        lanes_out.append(
                            f.accumulate(accs, gids, vals, mask))
                if not keys:
                    dreps = []
                    for spec, (vals, mask) in zip(self.specs, inputs):
                        if not spec.distinct:
                            dreps.append(None)
                            continue
                        _, drows, dsel, _ = group_ids_sorted(
                            [(vals, None)], mask)
                        dreps.append({
                            "keys": [],
                            "arg": jnp.take(vals, drows, mode="clip"),
                            "sel": dsel,
                        })
                    return [], lanes_out, group_sel, dreps

                def take_pairs(pairs, rows):
                    return [
                        (jnp.take(v, rows, mode="clip"),
                         None if va is None
                         else jnp.take(va, rows, mode="clip"))
                        for (v, va) in pairs]

                gkeys = take_pairs(pairs, group_rows)

                # distinct aggregates: per-batch (keys, arg) dedupe —
                # the DistinctAggregations analog
                # (velox/exec/DistinctAggregations.h)
                dreps = []
                for spec, (vals, mask) in zip(self.specs, inputs):
                    if not spec.distinct:
                        dreps.append(None)
                        continue
                    dpairs = pairs + [(vals, None)]
                    _, drows, dsel, _ = group_ids_sorted(dpairs, mask)
                    dreps.append({
                        "keys": take_pairs(pairs, drows),
                        "arg": jnp.take(vals, drows, mode="clip"),
                        "sel": dsel,
                    })
                return gkeys, lanes_out, group_sel, dreps

        return fn

    def push_generic_entry(self, gkeys, lanes_out, group_sel, dreps
                           ) -> None:
        entry = {"keys": gkeys, "lanes": lanes_out, "sel": group_sel,
                 "distinct": dreps}
        if self.step == AggStep.PARTIAL:
            self._outputs.append(self._partial_batch(entry))
        else:
            self._store.append(entry)

    # ------------------------------------------------------------ output
    def _partial_batch(self, entry) -> Batch:
        cols = {}
        for k, (v, va) in zip(self.keys, entry["keys"]):
            kt = self.output_type.find_child(k)
            cols[k] = Column(
                kt, v, va, _key_dict_for(self._key_dicts, kt, k))
        for name, fn, at, lanes in zip(
                self.agg_names, self.fns, self.arg_types, entry["lanes"]):
            for li, (lane_arr, lt) in enumerate(
                    zip(lanes, fn.lane_types(at))):
                if lane_arr.ndim == 1:
                    cols[f"{name}${li}"] = Column(lt, lane_arr)
                else:  # matrix lane -> one column per slot
                    for j in range(lane_arr.shape[1]):
                        cols[f"{name}${li}@{j}"] = Column(
                            lt, lane_arr[:, j])
        return Batch(cols, entry["sel"])

    def get_output(self) -> Optional[Batch]:
        if self._outputs:
            return self._outputs.popleft()
        if not self.no_more_input_seen:
            return None
        if self.step == AggStep.PARTIAL and self._mode != "collect":
            self._emitted = True
            return None
        if self._mode in ("array", "collect"):
            if self._emitted:
                return None
            self._emitted = True
            return (self._finish_array() if self._mode == "array"
                    else self._finish_collect())
        # generic: merge ONE partition per call (streaming restore —
        # peak HBM is one partition's entries, velox GroupingSet
        # spill merge-restore analog)
        if self._pending_parts is None:
            self._pending_parts = [
                p for p in self._store.partitions() if p]
            if not self._pending_parts:
                self._emitted = True
                return self._empty_result()
        while self._pending_parts:
            part = self._pending_parts.pop()
            out = self._merge_entries(part)
            if not self._pending_parts:
                self._emitted = True
            return out
        return None

    def _finish_collect(self) -> Batch:
        from velox_tpu.exec.collect_agg import finish_collect
        from velox_tpu.vector.batch import concat_batches

        if not self._raw_batches:
            return self._empty_result()
        big = (concat_batches(self._raw_batches)
               if len(self._raw_batches) > 1 else self._raw_batches[0])
        self._raw_batches.clear()
        return finish_collect(self, big)

    def _finish_array(self) -> Batch:
        st = self._array_state
        assert st is not None, "no input reached array-mode aggregation"
        G = self._num_groups
        cap = max(round_capacity(G), G)
        pad = cap - G

        def padded(a, fill=0):
            if pad == 0:
                return a
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, dtype=a.dtype)])

        seen = padded(st["seen"], False)
        cols = {}
        stride = 1
        gid_idx = np.arange(G)
        for k, radix in zip(self.keys, self._radices):
            codes = ((gid_idx // stride) % radix).astype(np.int32)
            null_id = radix - 1
            valid_np = codes != null_id
            codes = np.where(valid_np, codes, -1).astype(np.int32)
            stride *= radix
            v = padded(jnp.asarray(codes), -1)
            va = padded(jnp.asarray(valid_np), False)
            kt = self.output_type.find_child(k)
            cols[k] = Column(
                kt, v, va, _key_dict_for(self._key_dicts, kt, k))
        for name, fn, at, accs in zip(
                self.agg_names, self.fns, self.arg_types, st["accs"]):
            accs_p = tuple(padded(a) for a in accs)
            vals, valid = fn.extract(accs_p, seen)
            cols[name] = Column(
                self.output_type.find_child(name), vals, valid)
        return Batch(cols, seen)

    def _merge_entries(self, entries: List[dict]) -> Batch:
        # region layout: [regular entry groups..., distinct agg 0 reps...,
        # distinct agg 1 reps, ...] — one global grouping assigns gids to
        # all rows; regular lanes combine from their region, distinct args
        # re-dedupe by (gid, arg) then accumulate
        n_reg = sum(e["sel"].shape[0] for e in entries)
        d_specs = [i for i, s in enumerate(self.specs) if s.distinct]
        d_sizes = {
            i: sum(e["distinct"][i]["sel"].shape[0] for e in entries)
            for i in d_specs}
        total = n_reg + sum(d_sizes.values())
        cap = round_capacity(total)
        pad = cap - total

        def cat(parts, dtype=None, fill=0):
            arrs = list(parts)
            if pad:
                arrs.append(jnp.full((pad,), fill,
                                     dtype=dtype or arrs[0].dtype))
            return jnp.concatenate(arrs)

        def cat_pairs(pair_lists, sels):
            """Concatenate [(vals, valid)...] column-wise over regions."""
            out = []
            for ki in range(len(self.keys)):
                vals = cat([p[ki][0] for p in pair_lists])
                if any(p[ki][1] is not None for p in pair_lists):
                    valid = cat([
                        p[ki][1] if p[ki][1] is not None
                        else jnp.ones(p[ki][0].shape[0], jnp.bool_)
                        for p in pair_lists], jnp.bool_, False)
                else:
                    valid = None
                out.append((vals, valid))
            return out

        key_regions = [e["keys"] for e in entries]
        sel_regions = [e["sel"] for e in entries]
        d_region_off = {}
        off = n_reg
        for i in d_specs:
            d_region_off[i] = off
            for e in entries:
                key_regions.append(e["distinct"][i]["keys"])
                sel_regions.append(e["distinct"][i]["sel"])
            off += d_sizes[i]
        keys = cat_pairs(key_regions, sel_regions)
        sel = cat(sel_regions, jnp.bool_, False)

        def region_full(parts, lo, size):
            """Arrays positioned at [lo, lo+size) in a cap-length array."""
            dt = parts[0].dtype
            trail = parts[0].shape[1:]
            arrs = []
            if lo:
                arrs.append(jnp.zeros((lo,) + trail, dt))
            arrs.extend(parts)
            tail = cap - lo - size
            if tail:
                arrs.append(jnp.zeros((tail,) + trail, dt))
            return jnp.concatenate(arrs) if len(arrs) > 1 else arrs[0]

        lanes_cat = [
            None if self.specs[ai].distinct else tuple(
                region_full(
                    [e["lanes"][ai][li] for e in entries], 0, n_reg)
                for li in range(len(fn.lanes)))
            for ai, fn in enumerate(self.fns)]
        d_args = {
            i: region_full(
                [e["distinct"][i]["arg"] for e in entries],
                d_region_off[i], d_sizes[i])
            for i in d_specs}

        keyless = not self.keys
        if True:

            def merge(keys, lanes_cat, d_args, sel):
                cap = sel.shape[0]
                idx = jnp.arange(cap)
                gids, group_rows, group_sel, _ = group_ids_sorted(
                    keys, sel)
                if keyless:
                    # global aggregation emits one row even on empty input
                    group_sel = jnp.zeros_like(group_sel).at[0].set(True)
                out_keys = [
                    (jnp.take(v, group_rows, mode="clip"),
                     None if va is None
                     else jnp.take(va, group_rows, mode="clip"))
                    for (v, va) in keys]
                results = []
                reg_mask = jnp.logical_and(sel, idx < n_reg)
                for ai, (fn, accs) in enumerate(zip(
                        self.fns, self._init_accs(cap))):
                    if not self.specs[ai].distinct:
                        accs = fn.combine(
                            tuple(accs), gids, lanes_cat[ai], reg_mask)
                        results.append(fn.extract(accs, group_sel))
                        continue
                    # distinct: global (gid, arg) dedupe within the
                    # aggregate's region, then accumulate representatives
                    lo = d_region_off[ai]
                    hi = lo + d_sizes[ai]
                    rsel = jnp.logical_and(
                        sel, jnp.logical_and(idx >= lo, idx < hi))
                    argv = d_args[ai]
                    _, drows, dsel, _ = group_ids_sorted(
                        [(gids, None), (argv, None)], rsel)
                    rep = (jnp.zeros((cap,), jnp.bool_)
                           .at[jnp.where(dsel, drows, cap)]
                           .set(True, mode="drop"))
                    accs = fn.accumulate(tuple(accs), gids, argv, rep)
                    results.append(fn.extract(accs, group_sel))
                return out_keys, results, group_sel

            # keyed per region layout: spilled partitions have
            # different sizes, each needs its own compiled merge
            merge_jit = cached_jit(
                ("agg_merge", self.node.id, n_reg, cap,
                 tuple(sorted(d_region_off.items())),
                 tuple(sorted(d_sizes.items()))),
                lambda: merge)
        out_keys, results, group_sel = merge_jit(
            keys, lanes_cat, d_args, sel)

        cols = {}
        for k, (gv, gva) in zip(self.keys, out_keys):
            kt = self.output_type.find_child(k)
            cols[k] = Column(
                kt, gv, gva, _key_dict_for(self._key_dicts, kt, k))
        for name, (vals, valid) in zip(self.agg_names, results):
            cols[name] = Column(
                self.output_type.find_child(name), vals, valid)
        return Batch(cols, group_sel)

    def _empty_result(self) -> Batch:
        from velox_tpu.types.types import TypeKind as _TK
        from velox_tpu.vector.column import ArrayColumn, MapColumn

        cap = round_capacity(1)
        if self.keys:
            if not self._collect:
                return Batch.empty_like(self.output_type, cap)
            cols = {}
            z32 = jnp.zeros((cap,), jnp.int32)
            for name, t in zip(self.output_type.names,
                               self.output_type.children):
                if t.kind == _TK.ARRAY:
                    cols[name] = ArrayColumn(
                        t, z32, z32, Column(t.element, z32))
                elif t.kind == _TK.MAP:
                    cols[name] = MapColumn(
                        t, z32, z32, Column(t.key, z32),
                        Column(t.value, z32))
                else:
                    cols[name] = Column(
                        t, jnp.zeros((cap,), dtype=t.dtype))
            return Batch(cols, jnp.zeros((cap,), jnp.bool_), num_rows=0)
        # keyless: one row of identity aggregates
        sel = jnp.zeros((cap,), jnp.bool_).at[0].set(True)
        cols = {}
        for name, fn, at, accs in zip(
                self.agg_names, self.fns, self.arg_types,
                self._init_accs(cap)):
            vals, valid = fn.extract(accs, sel)
            cols[name] = Column(
                self.output_type.find_child(name), vals, valid)
        return Batch(cols, sel)

    def is_finished(self) -> bool:
        partial_done = (self.step == AggStep.PARTIAL
                        and self._mode != "collect")
        return (self.no_more_input_seen and not self._outputs
                and (partial_done or self._emitted)
                and not self._pending_parts)


# ------------------------------------------------------------------ order

def _lane_kind(lane, dt) -> str:
    """Clustered lane strategy: integer add lanes use cumsum prefix
    differences ("cum"); everything else scatter-reduces ("acc")."""
    import numpy as _np

    return ("cum" if lane.scan_op == "add"
            and _np.issubdtype(_np.dtype(dt), _np.integer) else "acc")


_CONST_MEMO: Dict[tuple, "jax.Array"] = {}


def _const_scalar(dtype, value):
    key = ("s", jnp.dtype(dtype).name, value)
    a = _CONST_MEMO.get(key)
    if a is None:
        a = jnp.asarray(value, dtype)
        _CONST_MEMO[key] = a
    return a


def _const_zeros_bool(cap: int):
    key = ("zb", cap)
    a = _CONST_MEMO.get(key)
    if a is None:
        a = jnp.zeros((cap,), jnp.bool_)
        _CONST_MEMO[key] = a
    return a


def _const_lane1(dtype, value):
    key = ("l1", jnp.dtype(dtype).name, str(value))
    a = _CONST_MEMO.get(key)
    if a is None:
        a = jnp.full((1,), value, dtype=dtype)
        _CONST_MEMO[key] = a
    return a


class StreamingAggregationOp(HashAggregationOp):
    """velox/exec/StreamingAggregation.h:21 — aggregation over input
    CLUSTERED on the grouping keys: groups close as soon as the key
    changes, so memory stays one open group and no sort/hash ever runs.

    TPU shape: per batch ONE jit — front-pack selected rows, detect key
    boundaries by adjacent compare (the input order is the group order),
    scatter-accumulate into per-batch group slots, merge the carried open
    group, emit every closed group, and hand the last group's accumulator
    lanes forward as the new carry. This sidesteps the lax.sort kernels
    entirely — the streaming analog of velox's "assume sorted, compare to
    previous row" (StreamingAggregation.cpp assignGroups).
    """

    blocking = False

    def __init__(self, node):
        super().__init__(node)
        if self.step not in (AggStep.SINGLE, AggStep.FINAL):
            raise NotImplementedError(
                "streaming aggregation emits final results (SINGLE/FINAL)")
        if self.has_distinct:
            raise NotImplementedError(
                "distinct aggregates need the hash aggregation")
        if self._collect:
            raise NotImplementedError(
                "collect aggregates need the hash aggregation")
        assert self.keys, "keyless aggregation has no streams to close"
        self._carry = None           # (keys, lanes-tuple-of-tuples) device
        self._carry_present = _const_scalar(jnp.bool_, False)
        self._stream_jit = None
        self._stream_sig = None
        is_final = self.step == AggStep.FINAL
        #: scatter-free clustered path (see _step_fn use_scan)
        self._use_scan = all(
            f.scannable or (is_final and all(l.scan_op for l in f.lanes))
            for f in self.fns)
        #: fused HAVING (StreamingAggregationNode.having): emit sizes to
        #: the passing-group count; else mask outputs post-emit
        self._having = getattr(node, "having", None)
        self._having_eval = (
            ExprEvaluator([self._having], node.output_type)
            if self._having is not None else None)
        self._having_fused = (self._having is not None
                              and self._having_ok())
        self._queue: collections.deque = collections.deque()

    # ------------------------------------------------------------ compile
    def _step_fn(self, dense: bool = False):
        keys = self.keys
        fns, specs = self.fns, self.specs
        is_final = self.step == AggStep.FINAL
        # clustered fast path: every aggregate's lanes are associative
        # segment reductions -> accumulate via segmented scans + ONE
        # boundary gather, zero scatter-reduces (int64 scatters are ~7x
        # int32 on this backend; see ops/groupby.segment_scan)
        use_scan = all(
            f.scannable or (is_final
                            and all(l.scan_op for l in f.lanes))
            for f in fns)

        def keys_eq(a_pair, b_pair):
            (av, avd), (bv, bvd) = a_pair, b_pair
            an = jnp.zeros_like(av, jnp.bool_) if avd is None else ~avd
            bn = jnp.zeros_like(bv, jnp.bool_) if bvd is None else ~bvd
            return jnp.logical_or(
                jnp.logical_and(av == bv, ~an & ~bn),
                jnp.logical_and(an, bn))

        def step(key_pairs, cols, sel, carry_present, carry_keys,
                 carry_lanes):
            cap = sel.shape[0]
            n = jnp.sum(sel.astype(jnp.int32))
            r = jnp.arange(cap, dtype=jnp.int32)
            packed = r < n

            if dense:
                # selection already IS a dense prefix: the pack is the
                # identity — no nonzero, no per-column gathers
                kp = list(key_pairs)
                pcols = dict(cols)
            else:
                from velox_tpu.ops.sort import pack_indices

                pk = pack_indices(sel)

                def pack(pair):
                    v, vd = pair
                    return (jnp.take(v, pk, mode="clip"),
                            None if vd is None
                            else jnp.take(vd, pk, mode="clip"))

                kp = [pack(p) for p in key_pairs]
                pcols = {name: pack(p) for name, p in cols.items()}

            # boundary = any key differs from the previous packed row
            same_prev = jnp.ones((cap,), jnp.bool_)
            for (v, vd) in kp:
                prev = (jnp.roll(v, 1), None if vd is None
                        else jnp.roll(vd, 1))
                same_prev = jnp.logical_and(
                    same_prev, keys_eq((v, vd), prev))
            head = jnp.logical_and(packed, ~same_prev).at[0].set(True)
            head = jnp.logical_and(head, packed)

            # does row 0 continue the carried group?
            row0_eq = jnp.ones((), jnp.bool_)
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                row0_eq = jnp.logical_and(row0_eq, keys_eq(
                    (v[:1], None if vd is None else vd[:1]),
                    (cv[None], None if cvd is None else cvd[None]))[0])
            has_rows = n > 0
            merge_carry = jnp.logical_and(
                carry_present, jnp.logical_and(has_rows, row0_eq))
            # the carry is only "alone" (its own closed group) when rows
            # exist and do not extend it; an empty batch is a no-op
            carry_alone = jnp.logical_and(
                jnp.logical_and(carry_present, has_rows), ~merge_carry)
            offset = carry_alone.astype(jnp.int32)

            gids = jnp.cumsum(head.astype(jnp.int32)) - 1 + offset
            ng = offset + jnp.sum(head.astype(jnp.int32)) \
                + jnp.logical_and(carry_present, ~has_rows).astype(
                    jnp.int32)

            inputs = self._agg_inputs(pcols, packed)

            closed = jnp.logical_and(r < ng - 1, r >= 0)
            # group representative rows (first packed row of each group)
            group_rows = (jnp.full((cap,), cap, jnp.int32)
                          .at[jnp.where(head, gids, cap)]
                          .min(r, mode="drop"))

            if use_scan:
                # last packed row of group slot g: (first row of g+1) - 1;
                # the final live slot ends at row n-1
                nxt = jnp.take(group_rows, jnp.minimum(r + 1, cap - 1),
                               mode="clip")
                last_rows = jnp.where(r + 1 < ng, nxt - 1, n - 1)
                lr = jnp.clip(last_rows, 0, cap - 1)
                fr = jnp.clip(group_rows, 0, cap - 1)
                # does slot 0 get any ROW contributions (vs carry only)?
                rows0 = jnp.logical_and(has_rows, ~carry_alone)
                accs_out = []
                for fn, at, (vals, mask), cl in zip(
                        fns, self.arg_types, inputs, carry_lanes):
                    if is_final:
                        contribs = tuple(
                            jnp.where(mask, lv, jnp.asarray(
                                lane.init_of(at), lv.dtype))
                            for lane, lv in zip(fn.lanes, vals))
                    else:
                        contribs = fn.lane_contribs(vals, mask, at)
                    accs = []
                    for lane, c, cl_l in zip(fn.lanes, contribs, cl):
                        dt = lane.dtype_of(at)
                        c = c.astype(dt)
                        ident = jnp.asarray(lane.init_of(at), dt)
                        if (lane.scan_op == "add"
                                and jnp.issubdtype(dt, jnp.integer)):
                            # clustered segment sum = prefix difference:
                            # cumsum compiles/runs fast in any width here
                            # while int64 SCATTERS are ~7x int32 (axon);
                            # associative_scan also compile-hangs on i64
                            incl = jnp.cumsum(c)
                            excl = incl - c
                            acc_l = (jnp.take(incl, lr, mode="clip")
                                     - jnp.take(excl, fr, mode="clip"))
                        elif lane.scan_op == "add":
                            acc_l = (jnp.zeros((cap,), dt)
                                     .at[gids].add(c, mode="drop"))
                        elif lane.scan_op == "min":
                            acc_l = (jnp.full((cap,), ident, dt)
                                     .at[gids].min(c, mode="drop"))
                        else:
                            acc_l = (jnp.full((cap,), ident, dt)
                                     .at[gids].max(c, mode="drop"))
                        comb = {"add": jnp.add, "min": jnp.minimum,
                                "max": jnp.maximum}[lane.scan_op]
                        a0 = jnp.where(rows0, acc_l[0], ident)
                        m0 = jnp.where(
                            carry_present,
                            comb(cl_l[0].astype(dt), a0), a0)
                        accs.append(acc_l.at[0].set(m0))
                    accs_out.append(tuple(accs))
            else:
                accs_all = self._init_accs(cap)
                accs_out = []
                for fn, accs, (vals, mask), cl in zip(
                        fns, accs_all, inputs, carry_lanes):
                    if is_final:
                        accs = fn.combine(tuple(accs), gids, vals, mask)
                    else:
                        accs = fn.accumulate(tuple(accs), gids, vals, mask)
                    # merge the carried open group into slot 0
                    zero_g = jnp.zeros((cap,), jnp.int32)
                    cmask = (jnp.zeros((cap,), jnp.bool_)
                             .at[0].set(carry_present))
                    cfull = tuple(
                        jnp.zeros((cap,), l.dtype).at[0].set(l[0])
                        for l in cl)
                    accs = fn.combine(tuple(accs), zero_g, cfull, cmask)
                    accs_out.append(accs)
            out_keys = []
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                gv = jnp.take(v, group_rows, mode="clip")
                gv = jnp.where(
                    jnp.logical_and(r == 0, carry_alone), cv, gv)
                if vd is not None or cvd is not None:
                    gvd = (jnp.take(vd, group_rows, mode="clip")
                           if vd is not None
                           else jnp.ones((cap,), jnp.bool_))
                    cvd_s = cvd if cvd is not None else jnp.ones(
                        (), jnp.bool_)
                    gvd = jnp.where(
                        jnp.logical_and(r == 0, carry_alone), cvd_s, gvd)
                else:
                    gvd = None
                out_keys.append((gv, gvd))
            results = [fn.extract(accs, closed)
                       for fn, accs in zip(fns, accs_out)]

            # new carry = last group's lanes + last packed row's keys
            last = jnp.maximum(ng - 1, 0)
            lastrow = jnp.maximum(n - 1, 0)
            carry_lanes_out = tuple(
                tuple(jnp.where(has_rows | carry_present,
                                jnp.take(l, last, mode="clip"), l0[0])
                      [None]
                      for l, l0 in zip(accs, cl))
                for accs, cl in zip(accs_out, carry_lanes))
            carry_keys_out = []
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                nv = jnp.where(
                    has_rows, jnp.take(v, lastrow, mode="clip"), cv)
                nvd = None
                if vd is not None or cvd is not None:
                    pvd = (jnp.take(vd, lastrow, mode="clip")
                           if vd is not None
                           else jnp.ones((), jnp.bool_))
                    ovd = cvd if cvd is not None else jnp.ones(
                        (), jnp.bool_)
                    nvd = jnp.where(has_rows, pvd, ovd)
                carry_keys_out.append((nv, nvd))
            carry_present_out = jnp.logical_or(carry_present, has_rows)
            return (out_keys, results, closed, carry_present_out,
                    carry_keys_out, carry_lanes_out)

        return step


    # -------------------------------------------- two-phase scan emit
    # Phase A computes boundary structure + per-lane cumsums/accs at the
    # input capacity; ONE host sync reads the group count; phase B
    # gathers keys/lanes at the (much smaller) rounded group capacity.
    # Saves the full-width output gathers (the remaining hot cost after
    # the scatter-free rewrite: an int64 gather at 8M rows is ~200ms on
    # axon; at the 2M group capacity it is ~50ms).

    def _phase_a_fn(self, dense: bool):
        keys = self.keys
        fns = self.fns
        is_final = self.step == AggStep.FINAL

        def keys_eq(a_pair, b_pair):
            (av, avd), (bv, bvd) = a_pair, b_pair
            an = jnp.zeros_like(av, jnp.bool_) if avd is None else ~avd
            bn = jnp.zeros_like(bv, jnp.bool_) if bvd is None else ~bvd
            return jnp.logical_or(
                jnp.logical_and(av == bv, ~an & ~bn),
                jnp.logical_and(an, bn))

        def step(key_pairs, cols, sel, carry_present, carry_keys):
            cap = sel.shape[0]
            n = jnp.sum(sel.astype(jnp.int32))
            r = jnp.arange(cap, dtype=jnp.int32)
            packed = r < n
            if dense:
                kp = list(key_pairs)
                pcols = dict(cols)
            else:
                from velox_tpu.ops.sort import pack_indices

                pk = pack_indices(sel)

                def pack(pair):
                    v, vd = pair
                    return (jnp.take(v, pk, mode="clip"),
                            None if vd is None
                            else jnp.take(vd, pk, mode="clip"))

                kp = [pack(p) for p in key_pairs]
                pcols = {name: pack(p) for name, p in cols.items()}

            same_prev = jnp.ones((cap,), jnp.bool_)
            for (v, vd) in kp:
                prev = (jnp.roll(v, 1), None if vd is None
                        else jnp.roll(vd, 1))
                same_prev = jnp.logical_and(
                    same_prev, keys_eq((v, vd), prev))
            head = jnp.logical_and(packed, ~same_prev).at[0].set(True)
            head = jnp.logical_and(head, packed)

            row0_eq = jnp.ones((), jnp.bool_)
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                row0_eq = jnp.logical_and(row0_eq, keys_eq(
                    (v[:1], None if vd is None else vd[:1]),
                    (cv[None], None if cvd is None else cvd[None]))[0])
            has_rows = n > 0
            merge_carry = jnp.logical_and(
                carry_present, jnp.logical_and(has_rows, row0_eq))
            carry_alone = jnp.logical_and(
                jnp.logical_and(carry_present, has_rows), ~merge_carry)
            offset = carry_alone.astype(jnp.int32)
            gids = jnp.cumsum(head.astype(jnp.int32)) - 1 + offset
            ng = offset + jnp.sum(head.astype(jnp.int32)) \
                + jnp.logical_and(carry_present, ~has_rows).astype(
                    jnp.int32)
            group_rows = (jnp.full((cap,), cap, jnp.int32)
                          .at[jnp.where(head, gids, cap)]
                          .min(r, mode="drop"))

            inputs = self._agg_inputs(pcols, packed)
            lanes_out = []
            for fn, at, (vals, mask) in zip(
                    fns, self.arg_types, inputs):
                if is_final:
                    contribs = tuple(
                        jnp.where(mask, lv, jnp.asarray(
                            lane.init_of(at), lv.dtype))
                        for lane, lv in zip(fn.lanes, vals))
                else:
                    contribs = fn.lane_contribs(vals, mask, at)
                ld = []
                for lane, c in zip(fn.lanes, contribs):
                    dt = lane.dtype_of(at)
                    c = c.astype(dt)
                    ident = jnp.asarray(lane.init_of(at), dt)
                    if _lane_kind(lane, dt) == "cum":
                        incl = jnp.cumsum(c)
                        ld.append((incl, incl - c))
                    elif lane.scan_op == "add":
                        ld.append(((jnp.zeros((cap,), dt)
                                    .at[gids].add(c, mode="drop")),))
                    elif lane.scan_op == "min":
                        ld.append(((jnp.full((cap,), ident, dt)
                                    .at[gids].min(c, mode="drop")),))
                    else:
                        ld.append(((jnp.full((cap,), ident, dt)
                                    .at[gids].max(c, mode="drop")),))
                lanes_out.append(tuple(ld))
            scalars = (n, ng, has_rows, merge_carry, carry_alone,
                       jnp.logical_or(carry_present, has_rows))
            return kp, lanes_out, group_rows, scalars

        return step

    def _phase_b_fn(self, cap: int, cap2: int):
        fns = self.fns

        def emit(kp, lanes_data, group_rows, scalars, carry_present,
                 carry_keys, carry_lanes):
            (n, ng, has_rows, merge_carry, carry_alone,
             carry_present_out) = scalars
            r2 = jnp.arange(cap2, dtype=jnp.int32)
            gr2 = jnp.take(group_rows, r2, mode="clip")
            fr2 = jnp.clip(gr2, 0, cap - 1)
            nxt2 = jnp.take(
                group_rows, jnp.minimum(r2 + 1, cap - 1), mode="clip")
            last2 = jnp.where(r2 + 1 < ng, nxt2 - 1, n - 1)
            lr2 = jnp.clip(last2, 0, cap - 1)
            rows0 = jnp.logical_and(has_rows, ~carry_alone)
            closed2 = r2 < ng - 1
            last = jnp.maximum(ng - 1, 0)
            lastrow = jnp.maximum(n - 1, 0)
            lastrow_c = jnp.clip(lastrow, 0, cap - 1)
            gr_last = jnp.clip(
                jnp.take(group_rows, jnp.clip(last, 0, cap - 1),
                         mode="clip"), 0, cap - 1)

            results = []
            carry_lanes_out = []
            for fn, at, ld, cl in zip(
                    fns, self.arg_types, lanes_data, carry_lanes):
                accs2 = []
                couts = []
                for lane, item, cl_l in zip(fn.lanes, ld, cl):
                    dt = lane.dtype_of(at)
                    ident = jnp.asarray(lane.init_of(at), dt)
                    comb = {"add": jnp.add, "min": jnp.minimum,
                            "max": jnp.maximum}[lane.scan_op]
                    if _lane_kind(lane, dt) == "cum":
                        a, b = item
                        acc2 = (jnp.take(a, lr2, mode="clip")
                                - jnp.take(b, fr2, mode="clip"))
                        raw_last = (jnp.take(a, lastrow_c, mode="clip")
                                    - jnp.take(b, gr_last, mode="clip"))
                    else:
                        (a,) = item
                        acc2 = a[:cap2]
                        raw_last = jnp.take(
                            a, jnp.clip(last, 0, cap - 1), mode="clip")
                    raw_last = jnp.where(has_rows, raw_last, ident)
                    a0 = jnp.where(rows0, acc2[0], ident)
                    m0 = jnp.where(
                        carry_present, comb(cl_l[0].astype(dt), a0), a0)
                    accs2.append(acc2.at[0].set(m0))
                    c_last = jnp.where(last == 0, m0, raw_last)
                    c_last = jnp.where(
                        has_rows | carry_present, c_last, cl_l[0])
                    couts.append(c_last[None])
                results.append(fn.extract(tuple(accs2), closed2))
                carry_lanes_out.append(tuple(couts))

            out_keys = []
            carry_keys_out = []
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                gv = jnp.take(v, fr2, mode="clip")
                gv = jnp.where(
                    jnp.logical_and(r2 == 0, carry_alone), cv, gv)
                if vd is not None or cvd is not None:
                    gvd = (jnp.take(vd, fr2, mode="clip")
                           if vd is not None
                           else jnp.ones((cap2,), jnp.bool_))
                    cvd_s = cvd if cvd is not None else jnp.ones(
                        (), jnp.bool_)
                    gvd = jnp.where(
                        jnp.logical_and(r2 == 0, carry_alone), cvd_s,
                        gvd)
                else:
                    gvd = None
                out_keys.append((gv, gvd))
                nv = jnp.where(
                    has_rows, jnp.take(v, lastrow_c, mode="clip"), cv)
                nvd = None
                if vd is not None or cvd is not None:
                    pvd = (jnp.take(vd, lastrow_c, mode="clip")
                           if vd is not None
                           else jnp.ones((), jnp.bool_))
                    ovd = cvd if cvd is not None else jnp.ones(
                        (), jnp.bool_)
                    nvd = jnp.where(has_rows, pvd, ovd)
                carry_keys_out.append((nv, nvd))
            return (out_keys, results, closed2, carry_present_out,
                    carry_keys_out, tuple(carry_lanes_out))

        return emit

    # ---------------------------------------------- fused HAVING phases
    # (StreamingAggregationNode.having): the predicate over the agg's
    # own outputs evaluates PER INPUT ROW — each referenced cum lane's
    # group total comes from one reverse segmented broadcast (an
    # associative pair-scan; no full-width gathers) — so the emit stage
    # sizes its output to the PASSING-group count. A selective HAVING
    # over millions of groups (TPC-H Q18 big_orders: 1.5M groups -> 57)
    # then emits a 128-capacity batch instead of a group-capacity batch
    # + a separate filter pass + a downstream count-sync compact.

    @staticmethod
    def _seg_bcast_last(vals, is_last):
        """Per row: ``vals`` at the nearest is_last row AT OR AFTER it.

        An i32 reverse cummin of the is_last row indices + one gather —
        NOT a pair associative_scan over the value lanes: 64-bit scans
        compile pathologically on the tunneled TPU backend (BASELINE.md
        round-2 per-op physics), while i32 cumulative ops + gathers are
        the cheap primitives the whole streaming design is built on."""
        n = vals.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        cand = jnp.where(is_last, idx, jnp.int32(n - 1))
        nxt = jnp.flip(jax.lax.cummin(jnp.flip(cand, 0)), 0)
        return jnp.take(vals, nxt, mode="clip")

    def _having_ok(self) -> bool:
        """Fused having needs: scan path + every aggregate the predicate
        references having all-cum (integer add) lanes."""
        if not self._use_scan or self.step != AggStep.SINGLE:
            return False
        from velox_tpu.expr.compiler import resolve_types as _rt

        refs = set()

        def walk(e):
            if isinstance(e, FieldRef):
                refs.add(e.name)
            for c in e.children:
                walk(c)

        walk(_rt(self.node.having, self.output_type))
        for name, fn, at in zip(self.agg_names, self.fns,
                                self.arg_types):
            if name in refs and any(
                    _lane_kind(l, l.dtype_of(at)) != "cum"
                    for l in fn.lanes):
                return False
        return True

    def _phase_a_hav_fn(self, dense: bool, having_run,
                        nonneg: tuple = ()):
        keys = self.keys
        fns = self.fns

        def keys_eq(a_pair, b_pair):
            (av, avd), (bv, bvd) = a_pair, b_pair
            an = jnp.zeros_like(av, jnp.bool_) if avd is None else ~avd
            bn = jnp.zeros_like(bv, jnp.bool_) if bvd is None else ~bvd
            return jnp.logical_or(
                jnp.logical_and(av == bv, ~an & ~bn),
                jnp.logical_and(an, bn))

        def step(key_pairs, cols, sel, carry_present, carry_keys,
                 carry_lanes):
            cap = sel.shape[0]
            n = jnp.sum(sel.astype(jnp.int32))
            r = jnp.arange(cap, dtype=jnp.int32)
            packed = r < n
            if dense:
                kp = list(key_pairs)
                pcols = dict(cols)
            else:
                from velox_tpu.ops.sort import pack_indices

                pk = pack_indices(sel)

                def pack(pair):
                    v, vd = pair
                    return (jnp.take(v, pk, mode="clip"),
                            None if vd is None
                            else jnp.take(vd, pk, mode="clip"))

                kp = [pack(p) for p in key_pairs]
                pcols = {name: pack(p) for name, p in cols.items()}

            same_prev = jnp.ones((cap,), jnp.bool_)
            for (v, vd) in kp:
                prev = (jnp.roll(v, 1), None if vd is None
                        else jnp.roll(vd, 1))
                same_prev = jnp.logical_and(
                    same_prev, keys_eq((v, vd), prev))
            head = jnp.logical_and(packed, ~same_prev).at[0].set(True)
            head = jnp.logical_and(head, packed)

            row0_eq = jnp.ones((), jnp.bool_)
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                row0_eq = jnp.logical_and(row0_eq, keys_eq(
                    (v[:1], None if vd is None else vd[:1]),
                    (cv[None], None if cvd is None else cvd[None]))[0])
            has_rows = n > 0
            merge_carry = jnp.logical_and(
                carry_present, jnp.logical_and(has_rows, row0_eq))
            carry_alone = jnp.logical_and(
                jnp.logical_and(carry_present, has_rows), ~merge_carry)
            offset = carry_alone.astype(jnp.int32)
            gids = jnp.cumsum(head.astype(jnp.int32)) - 1 + offset
            ng = offset + jnp.sum(head.astype(jnp.int32)) \
                + jnp.logical_and(carry_present, ~has_rows).astype(
                    jnp.int32)
            # last packed row of each group
            nxt_head = jnp.roll(head, -1).at[cap - 1].set(False)
            is_last = jnp.logical_and(
                packed, jnp.logical_or(nxt_head, r == n - 1))
            # per-row index of the owning group's head — MONOTONE
            # (cummax); gathers through it run at one-pass bandwidth,
            # unlike a reverse flip-scan (~100ms+ at 6M on this
            # backend, BASELINE.md per-op physics)
            head_idx = jax.lax.cummax(jnp.where(head, r, jnp.int32(0)))

            inputs = self._agg_inputs(pcols, packed)
            lanes_out = []
            for fi, (fn, at, (vals, mask), cl) in enumerate(zip(
                    fns, self.arg_types, inputs, carry_lanes)):
                contribs = fn.lane_contribs(vals, mask, at)
                nn = bool(nonneg[fi]) if fi < len(nonneg) else False
                ld = []
                for lane, c, cl_l in zip(fn.lanes, contribs, cl):
                    dt = lane.dtype_of(at)
                    c = c.astype(dt)
                    ident = jnp.asarray(lane.init_of(at), dt)
                    if _lane_kind(lane, dt) == "cum":
                        incl = jnp.cumsum(c)
                        if nn:
                            # non-negative contribs (ingest stats): the
                            # exclusive prefix at head rows is itself
                            # non-decreasing, so the forward fill is ONE
                            # cummax — kills the full-width gather
                            # (~105ms at 6M on v5e, vs ~10ms cummax)
                            base = jax.lax.cummax(
                                jnp.where(head, incl - c,
                                          jnp.asarray(0, dt)))
                        else:
                            base = jnp.where(
                                head_idx > 0,
                                jnp.take(incl,
                                         jnp.maximum(head_idx - 1, 0),
                                         mode="clip"), ident)
                        # group PREFIX at each row: the full group
                        # total exactly AT the group's last row —
                        # where the predicate evaluates
                        tot = incl - base
                        tot = tot + jnp.where(
                            jnp.logical_and(merge_carry, head_idx == 0),
                            cl_l[0].astype(dt), ident)
                        ld.append((tot,))
                    elif lane.scan_op == "add":
                        ld.append((jnp.zeros((cap,), dt)
                                   .at[gids].add(c, mode="drop"),))
                    elif lane.scan_op == "min":
                        ld.append((jnp.full((cap,), ident, dt)
                                   .at[gids].min(c, mode="drop"),))
                    else:
                        ld.append((jnp.full((cap,), ident, dt)
                                   .at[gids].max(c, mode="drop"),))
                lanes_out.append(tuple(ld))

            # per-row predicate arrays: keys read directly, referenced
            # aggregates extract from the per-row prefixes (exact group
            # totals at is_last rows, where E is masked)
            arrays = {}
            for k, (v, vd) in zip(keys, kp):
                arrays[k] = (v, vd)
            for name, fn, at, ld in zip(
                    self.agg_names, fns, self.arg_types, lanes_out):
                if all(_lane_kind(l, l.dtype_of(at)) == "cum"
                       for l in fn.lanes):
                    arrays[name] = fn.extract(
                        tuple(item[0] for item in ld), packed)
            # evaluate at each CLOSED group's last row (the open
            # group's last seen row is r == n-1)
            E = having_run(arrays, jnp.logical_and(
                is_last, r != n - 1))
            n_emit = jnp.sum(E.astype(jnp.int32))

            scalars = (n, ng, n_emit, has_rows, merge_carry,
                       carry_alone,
                       jnp.logical_or(carry_present, has_rows))
            return kp, lanes_out, gids, E, scalars

        return step

    def _phase_b_hav_fn(self, cap: int, cap2: int, having_run):
        fns = self.fns
        keys = self.keys

        def emit(kp, lanes_data, gids, E, scalars,
                 carry_present, carry_keys, carry_lanes):
            (n, ng, n_emit, has_rows, merge_carry, carry_alone,
             carry_present_out) = scalars
            from velox_tpu.ops.sort import pack_indices

            offset = carry_alone.astype(jnp.int32)
            pos = pack_indices(E)[:cap2]
            r2 = jnp.arange(cap2, dtype=jnp.int32)
            src = jnp.take(pos, jnp.maximum(r2 - offset, 0), mode="clip")
            live = r2 < n_emit + offset
            row0_carry = jnp.logical_and(r2 == 0, carry_alone)

            last = jnp.maximum(ng - 1, 0)
            lastrow = jnp.maximum(n - 1, 0)
            lastrow_c = jnp.clip(lastrow, 0, cap - 1)
            rows0 = jnp.logical_and(has_rows, ~carry_alone)
            slot2 = jnp.take(gids, src, mode="clip")

            results = []
            carry_lanes_out = []
            for fn, at, ld, cl in zip(
                    fns, self.arg_types, lanes_data, carry_lanes):
                accs2 = []
                couts = []
                for lane, item, cl_l in zip(fn.lanes, ld, cl):
                    dt = lane.dtype_of(at)
                    ident = jnp.asarray(lane.init_of(at), dt)
                    comb = {"add": jnp.add, "min": jnp.minimum,
                            "max": jnp.maximum}[lane.scan_op]
                    if _lane_kind(lane, dt) == "cum":
                        (tot,) = item
                        # tot is the group PREFIX per row: the full
                        # total at src (= group last rows), and at the
                        # final packed row it is the open group's
                        # partial — exactly the carry-out (includes the
                        # merged carry when the batch is one group)
                        acc2 = jnp.take(tot, src, mode="clip")
                        t0 = jnp.take(tot, lastrow_c, mode="clip")
                        raw_last = t0
                    else:
                        (acc,) = item
                        a2 = jnp.take(acc, slot2, mode="clip")
                        acc2 = jnp.where(
                            jnp.logical_and(slot2 == 0, merge_carry),
                            comb(cl_l[0].astype(dt), a2), a2)
                        a0 = jnp.where(rows0, acc[0], ident)
                        t0 = jnp.where(
                            carry_present,
                            comb(cl_l[0].astype(dt), a0), a0)
                        raw_last = jnp.take(
                            acc, jnp.clip(last, 0, cap - 1), mode="clip")
                    acc2 = jnp.where(row0_carry, cl_l[0].astype(dt),
                                     acc2)
                    accs2.append(acc2)
                    raw_last = jnp.where(has_rows, raw_last, ident)
                    # t0 = the merged slot-0 total — the carry-out when
                    # the whole batch is one group (last == 0)
                    c_last = jnp.where(last == 0, t0, raw_last)
                    c_last = jnp.where(
                        has_rows | carry_present, c_last, cl_l[0])
                    couts.append(c_last[None])
                results.append(fn.extract(tuple(accs2), live))
                carry_lanes_out.append(tuple(couts))

            out_keys = []
            carry_keys_out = []
            for (v, vd), (cv, cvd) in zip(kp, carry_keys):
                gv = jnp.take(v, src, mode="clip")
                gv = jnp.where(row0_carry, cv, gv)
                if vd is not None or cvd is not None:
                    gvd = (jnp.take(vd, src, mode="clip")
                           if vd is not None
                           else jnp.ones((cap2,), jnp.bool_))
                    cvd_s = cvd if cvd is not None else jnp.ones(
                        (), jnp.bool_)
                    gvd = jnp.where(row0_carry, cvd_s, gvd)
                else:
                    gvd = None
                out_keys.append((gv, gvd))
                nv = jnp.where(
                    has_rows, jnp.take(v, lastrow_c, mode="clip"), cv)
                nvd = None
                if vd is not None or cvd is not None:
                    pvd = (jnp.take(vd, lastrow_c, mode="clip")
                           if vd is not None
                           else jnp.ones((), jnp.bool_))
                    ovd = cvd if cvd is not None else jnp.ones(
                        (), jnp.bool_)
                    nvd = jnp.where(has_rows, pvd, ovd)
                carry_keys_out.append((nv, nvd))

            # the carry row (closed by this batch without merging) must
            # pass the predicate too: re-evaluate on the tiny output
            arrays = {k: p for k, p in zip(keys, out_keys)}
            for name, (vals, valid) in zip(self.agg_names, results):
                arrays[name] = (vals, valid)
            live = having_run(arrays, live)

            return (out_keys, results, live, carry_present_out,
                    carry_keys_out, tuple(carry_lanes_out))

        return emit

    # ------------------------------------------------------------ execute
    def _init_carry(self, batch: Batch):
        # constant device scalars memoized process-wide: fresh eager
        # zeros/full per run were ~15 mini-dispatches on the tunnel
        keys = []
        for k in self.keys:
            c = batch.column(k)
            keys.append((_const_scalar(c.values.dtype, 0),
                         _const_scalar(jnp.bool_, False)))
        lanes = tuple(
            tuple(_const_lane1(lane.dtype_of(at), lane.init_of(at))
                  for lane in fn.lanes)
            for fn, at in zip(self.fns, self.arg_types))
        return keys, lanes

    def add_input(self, batch: Batch) -> None:
        self.stats.input_batches += 1
        for k in self.keys:
            d = batch.column(k).dictionary
            if d is not None:
                self._key_dicts.setdefault(k, d)
        if self._carry is None:
            self._carry = self._init_carry(batch)
        cols = _cols_of(batch, self._needed)
        key_pairs = [cols[k] for k in self.keys]
        dense = batch.is_prefix_dense()
        cap = batch.capacity
        sig = (cap, dense,
               tuple(sorted((n, p[1] is not None)
                            for n, p in cols.items())))
        ck, cl = self._carry
        if self._use_scan and self._having_fused:
            hdicts = {
                k: batch.column(k).dictionary for k in self.keys
                if batch.column(k).dictionary is not None}
            _, hav_run = self._having_eval.pure(hdicts, "filter")

            def _col_nonneg(spec) -> bool:
                if not isinstance(spec.arg, str):
                    return False
                try:
                    st = batch.column(spec.arg).stats
                except KeyError:
                    return False
                return st is not None and st[0] >= 0

            nonneg = tuple(_col_nonneg(s) for s in self.specs)
            hsig = sig + ("hav", nonneg, tuple(sorted(
                (k, id(d)) for k, d in hdicts.items())))
            jit_a = cached_jit(
                ("stream_agg_ah", self.node.id, hsig),
                lambda: self._phase_a_hav_fn(dense, hav_run, nonneg))
            kp, lanes_data, gids, E, scalars = jit_a(
                key_pairs, cols, batch.sel, self._carry_present, ck, cl)
            # the ONE host sync (count-replay elides it on repeat runs)
            n_emit = _fetch_int(f"sagg_h:{self.node.id}", scalars[2])
            cap2 = min(round_capacity(max(n_emit + 1, 1)), cap)
            jit_b = cached_jit(
                ("stream_agg_bh", self.node.id, hsig, cap2),
                lambda: self._phase_b_hav_fn(cap, cap2, hav_run))
            (out_keys, results, closed, cp, ck2, cl2) = jit_b(
                kp, lanes_data, gids, E, scalars,
                self._carry_present, ck, cl)
            num_rows = None    # carry slot liveness is device-known
        elif self._use_scan:
            jit_a = cached_jit(
                ("stream_agg_a", self.node.id, sig),
                lambda: self._phase_a_fn(dense))
            kp, lanes_data, group_rows, scalars = jit_a(
                key_pairs, cols, batch.sel, self._carry_present, ck)
            # the ONE host sync (count-replay elides it on repeat runs)
            n_closed = max(
                _fetch_int(f"sagg:{self.node.id}", scalars[1]) - 1, 0)
            cap2 = min(round_capacity(max(n_closed, 1)), cap)
            jit_b = cached_jit(
                ("stream_agg_b", self.node.id, sig, cap2),
                lambda: self._phase_b_fn(cap, cap2))
            (out_keys, results, closed, cp, ck2, cl2) = jit_b(
                kp, lanes_data, group_rows, scalars,
                self._carry_present, ck, cl)
            num_rows = n_closed
        else:
            if self._stream_jit is None or self._stream_sig != sig:
                self._stream_jit = cached_jit(
                    ("stream_agg", self.node.id, sig),
                    lambda: self._step_fn(dense))
                self._stream_sig = sig
            (out_keys, results, closed, cp, ck2, cl2) = self._stream_jit(
                key_pairs, cols, batch.sel, self._carry_present, ck, cl)
            num_rows = None
        self._carry = (ck2, cl2)
        self._carry_present = cp
        out = {}
        for k, (gv, gvd) in zip(self.keys, out_keys):
            kt = self.output_type.find_child(k)
            out[k] = Column(
                kt, gv, gvd, _key_dict_for(self._key_dicts, kt, k))
        for name, (vals, valid) in zip(self.agg_names, results):
            out[name] = Column(
                self.output_type.find_child(name), vals, valid)
        if self._use_scan and self._having_fused:
            # emit is already sized to the passing groups (+carry slot);
            # liveness is a device mask — no extra count sync
            self._queue.append(Batch(out, closed))
        elif num_rows is not None:
            # phase B already emitted at the rounded group capacity
            b = Batch(out, closed, num_rows)
            if self._having_eval is not None:    # non-fused fallback
                b = b.with_sel(self._having_eval.filter_sel(b))
            self._queue.append(b)
        else:
            # closed groups are few relative to the input capacity;
            # prefix-compact so downstream sorts never see full width
            b = Batch(out, closed)
            if self._having_eval is not None:    # non-fused fallback
                # the mask punches holes -> full pack, not prefix slice
                b = b.with_sel(self._having_eval.filter_sel(b)).compact()
            else:
                b = b.compact_prefix()
            self._queue.append(b)
        self.stats.output_batches += 1

    def get_output(self) -> Optional[Batch]:
        if self._queue:
            return self._queue.popleft()
        if self.no_more_input_seen and not self._emitted:
            self._emitted = True
            if self._carry is None:
                return None
            # flush the open group as one final row — ONE jitted
            # program (the per-key/per-lane eager .at[0].set chain was
            # ~30 separate mini-dispatches per run on the tunnel)
            ck, cl = self._carry
            cap = round_capacity(1)
            fns = self.fns

            def make():
                def flush(present, ck, cl):
                    sel0 = (jnp.zeros((cap,), jnp.bool_)
                            .at[0].set(present))
                    keys_out = []
                    for cv, cvd in ck:
                        keys_out.append((
                            jnp.zeros((cap,), cv.dtype).at[0].set(cv),
                            jnp.zeros((cap,), jnp.bool_)
                            .at[0].set(cvd)))
                    aggs_out = []
                    for fn, lanes in zip(fns, cl):
                        full = tuple(
                            jnp.zeros((cap,), l.dtype).at[0].set(l[0])
                            for l in lanes)
                        aggs_out.append(fn.extract(full, sel0))
                    return sel0, keys_out, aggs_out
                return flush

            sel0, keys_out, aggs_out = cached_jit(
                ("sagg_flush", self.node.id, cap), make)(
                self._carry_present, ck, cl)
            cols = {}
            for k, (vals, valid) in zip(self.keys, keys_out):
                kt = self.output_type.find_child(k)
                cols[k] = Column(
                    kt, vals, valid,
                    _key_dict_for(self._key_dicts, kt, k))
            for name, (vals, valid) in zip(self.agg_names, aggs_out):
                cols[name] = Column(
                    self.output_type.find_child(name), vals, valid)
            b = Batch(cols, sel0)
            if self._having_eval is not None:
                # the flushed open group must pass HAVING too
                b = b.with_sel(self._having_eval.filter_sel(b))
            return b
        return None

    def is_finished(self) -> bool:
        return (self.no_more_input_seen and not self._queue
                and self._emitted)


class OrderByOp(Operator):
    """velox/exec/OrderBy.h:34 — buffer all, one bitonic sort at the end."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._buffer = SpillableBuffer("orderby")
        self._emitted = False

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        batches = self._buffer.drain()
        if not batches:
            return None
        big = concat_batches(batches)
        spec = [(k.name, k.descending, k.nulls_first)
                for k in self.node.keys]

        def make():
            def run(cols, sel):
                keys = [
                    (cols[n][0], cols[n][1], d, nf) for n, d, nf in spec]
                perm = sort_indices(keys, sel)
                return perm, jnp.take(sel, perm, mode="clip")
            return run

        run = cached_jit(("orderby", self.node.id), make)
        perm, sel_sorted = run(
            _cols_of(big, [k.name for k in self.node.keys]), big.sel)
        return big.gather(perm, sel_sorted, big.num_rows)

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted


class TopNOp(Operator):
    """velox/exec/TopN.h:23 — carry the running top-N across batches."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._carry: Optional[Batch] = None
        self._emitted = False
        self._jit = None

    def add_input(self, batch: Batch) -> None:
        merged = (batch if self._carry is None
                  else concat_batches([self._carry, batch]))
        if self._jit is None:
            spec = [(k.name, k.descending, k.nulls_first)
                    for k in self.node.keys]
            n = self.node.count

            def make():
                def run(cols, sel):
                    keys = [
                        (cols[nm][0], cols[nm][1], d, nf)
                        for nm, d, nf in spec]
                    return top_n_indices(keys, sel, n)
                return run

            self._jit = cached_jit(("topn", self.node.id), make)
        idx, osel = self._jit(
            _cols_of(merged, [k.name for k in self.node.keys]),
            merged.sel)
        self._carry = merged.gather(idx, osel)

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        return self._carry

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted


class LimitOp(Operator):
    """velox/exec/Limit.h — offset/limit via selection-rank masking."""

    def __init__(self, node):
        super().__init__(node)
        self._skip = node.offset
        self._left = node.count
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        if self._left <= 0:
            return
        ranks = jnp.cumsum(batch.sel.astype(jnp.int64))
        keep = jnp.logical_and(
            batch.sel,
            jnp.logical_and(ranks > self._skip,
                            ranks <= self._skip + self._left))
        n_in = int(ranks[-1])
        n_kept = min(max(n_in - self._skip, 0), self._left)
        self._skip = max(self._skip - n_in, 0)
        self._left -= n_kept
        if n_kept > 0:
            self._queue.append(batch.with_sel(keep, n_kept))

    def needs_input(self) -> bool:
        return super().needs_input() and self._left > 0

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return (not self._queue
                and (self.no_more_input_seen or self._left <= 0))


# ------------------------------------------------------------------ joins

class JoinKeyCodec:
    """Canonicalize join key columns into one int64 key.

    Single-key fast path covers TPC-H; multi-key packs value offsets into a
    normalized key (velox/exec/VectorHasher.h:130 normalized keys) using
    build-side min/max stats, with probe-side out-of-range rows invalidated
    (they cannot match by construction). All device work is traceable; the
    probe-side dictionary remap tables are host constants baked into the
    probe program (table-global dictionaries -> one compile).
    """

    def __init__(self, build_batch: Batch, build_keys: Sequence[str]):
        self.build_keys = list(build_keys)
        self.cols = [build_batch.column(k) for k in build_keys]
        self.multi = len(self.cols) > 1
        self.dicts = [c.dictionary for c in self.cols]
        self.narrow = None  # (lo, hi) when a single wide key fits int32
        self.lohi = None    # host (lo, hi) of the ENCODED key domain
        if not self.multi:
            c = self.cols[0]
            if c.dictionary is not None:
                if len(c.dictionary) > 0:
                    self.lohi = (0, len(c.dictionary) - 1)
            elif c.values.dtype != jnp.bool_ and jnp.issubdtype(
                    c.values.dtype, jnp.integer):
                v = _canon_int(c.values)
                act = build_batch.sel
                if c.valid is not None:
                    act = jnp.logical_and(act, c.valid)
                big = jnp.iinfo(v.dtype).max
                # ONE fused fetch (each int() is a tunnel round trip);
                # count-replay elides it on repeat runs
                lo, hi = (int(x) for x in _fetch_np(
                    "jk_minmax", _minmax_jit(v, act, big)))
                if lo <= hi:
                    self.lohi = (lo, hi)
                    if (v.dtype == jnp.int64
                            and lo >= -(2 ** 31) and hi < 2 ** 31):
                        self.narrow = (lo, hi)
        if self.multi:
            self.mins, self.bits = [], []
            lohis = []
            for c in self.cols:
                v = _canon_int(c.values)
                act = build_batch.sel
                if c.valid is not None:
                    act = jnp.logical_and(act, c.valid)
                big = jnp.iinfo(jnp.int64).max
                lohis.append(_minmax_jit(v.astype(jnp.int64), act, big))
            # one fetch for every key's (lo, hi); replayed on repeat
            fetched = _fetch_np("jk_minmax_multi", jnp.concatenate(lohis))
            for ki in range(len(self.cols)):
                lo, hi = int(fetched[2 * ki]), int(fetched[2 * ki + 1])
                if hi < lo:  # empty build side
                    lo, hi = 0, 0
                self.mins.append(lo)
                self.bits.append(max(int(hi - lo).bit_length(), 1))
            assert sum(self.bits) <= 63, "normalized join key overflow"
            self.lohi = (0, (1 << sum(self.bits)) - 1)
        self._remaps: Dict[tuple, np.ndarray] = {}

    def range_hint(self, max_span: int):
        """Host (lo, span) of the encoded key domain when small enough
        for a direct-address (kArray) join table, else None."""
        if self.lohi is None:
            return None
        lo, hi = self.lohi
        span = hi - lo + 1
        return (lo, span) if span <= max_span else None

    def key_sig(self) -> tuple:
        """Host constants baked into traced programs (jit-cache key part)."""
        if not self.multi:
            return (self.narrow, self.lohi)
        return (tuple(self.mins), tuple(self.bits))

    def dict_sig(self, batch: Batch, keys: Sequence[str]) -> tuple:
        return tuple(
            id(batch.column(k).dictionary) for k in keys)

    def _remap_table(self, i: int, probe_dict: Dictionary) -> np.ndarray:
        key = (i, id(probe_dict))
        t = self._remaps.get(key)
        if t is None:
            d_build = self.dicts[i]
            t = np.full(len(probe_dict) + 1, -1, np.int32)
            for ci, val in enumerate(probe_dict.values):
                t[ci + 1] = d_build.code_of(val)
            self._remaps[key] = t
        return t

    def encode(self, cols, dicts, is_probe: bool):
        """Traced: cols = [(values, valid)...] parallel to build_keys;
        dicts = host Dictionary per col (probe side's own).

        Returns ``(key, null_valid, match_valid)``: null_valid is SQL
        null-ness (drives null-aware anti semantics); match_valid marks
        rows that PROVABLY cannot match (dictionary miss, out of build
        range) — excluded from matching but NOT null."""
        null_valid = None
        match_valid = None

        def add_null(v):
            nonlocal null_valid
            null_valid = v if null_valid is None else jnp.logical_and(
                null_valid, v)

        def add_match(v):
            nonlocal match_valid
            match_valid = v if match_valid is None else jnp.logical_and(
                match_valid, v)

        vals64 = []
        for i, ((values, cvalid), pdict) in enumerate(zip(cols, dicts)):
            v = _canon_int(values)
            if cvalid is not None:
                add_null(cvalid)
            if self.dicts[i] is not None:
                d_build = self.dicts[i]
                if is_probe and pdict is not d_build:
                    assert pdict is not None, (
                        f"join key {self.build_keys[i]}: probe side not "
                        "dictionary-encoded")
                    remap = jnp.asarray(self._remap_table(i, pdict))
                    v = jnp.take(
                        remap,
                        jnp.clip(values.astype(jnp.int32), -1,
                                 len(pdict) - 1) + 1)
                    add_match(v >= 0)
            if self.multi:
                lo, b = self.mins[i], self.bits[i]
                off = v - lo
                in_range = jnp.logical_and(off >= 0, off < (1 << b))
                if is_probe:
                    add_match(in_range)
                vals64.append(jnp.where(in_range, off, 0))
            else:
                vals64.append(v)

        if not self.multi:
            v = vals64[0]
            if self.narrow is not None and v.dtype == jnp.int64:
                lo, hi = self.narrow
                if is_probe:
                    in_range = jnp.logical_and(v >= lo, v <= hi)
                    add_match(in_range)
                    v = jnp.clip(v, lo, hi)
                v = v.astype(jnp.int32)
            return v, null_valid, match_valid
        lane = jnp.int32 if sum(self.bits) <= 31 else jnp.int64
        key = jnp.zeros_like(vals64[0], dtype=lane)
        shift = 0
        for off, b in zip(vals64, self.bits):
            key = key | (off.astype(lane) << shift)
            shift += b
        return key, null_valid, match_valid


import functools


@functools.partial(jax.jit, static_argnums=2)
def _minmax_jit(v, act, big):
    """[min, max] of active values as one 2-element device array (fused
    into one fetch — per-scalar int() costs a tunnel round trip each)."""
    lo = jnp.min(jnp.where(act, v, big))
    hi = jnp.max(jnp.where(act, v, -big - 1))
    return jnp.stack([lo, hi])


def _canon_int(v: jax.Array) -> jax.Array:
    """Values -> equality-preserving integer, keeping 32-bit lanes narrow
    (the TPU narrow-lane rule applied to join keys)."""
    if jnp.issubdtype(v.dtype, jnp.floating):
        v = jnp.where(v == 0, jnp.zeros((), v.dtype), v)
        v = jnp.where(jnp.isnan(v), jnp.full((), _F64_NAN, v.dtype), v)
        width = jnp.int32 if v.dtype == jnp.float32 else jnp.int64
        return jax.lax.bitcast_convert_type(v, width)
    if v.dtype == jnp.bool_ or jnp.dtype(v.dtype).itemsize <= 4:
        return v.astype(jnp.int32)
    return v.astype(jnp.int64)


class JoinBridge:
    """velox/exec/HashJoinBridge.h analog: build-side handoff + matched
    flags for right/full joins."""

    def __init__(self, node):
        self.node = node
        self.ready = False
        self.build_batch: Optional[Batch] = None
        self.codec: Optional[JoinKeyCodec] = None
        self.sorted_keys = None
        self.perm = None
        self.n_active = None
        self.tables = ()   # kArray (tfirst, tcount) when range is small
        self.key_lo = 0
        #: device bool until first read — only anti joins ever need it,
        #: so inner/semi/left probes never pay the ~33ms scalar sync
        self._has_null_dev = None
        self._has_null: Optional[bool] = False
        self.matched = None  # accumulated build-row matched flags
        self.probe_done = False
        #: partitioned host spill: list of per-partition host fragment
        #: lists (set by HashBuildOp._spill_partitioned); probe runs one
        #: partition at a time
        self.spill_parts = None
        self.spill_empty = False
        #: fired when the build publishes (dynamic-filter pushdown
        #: happens HERE, before the probe-side scan realizes its lazy
        #: splits — velox HashProbe pushes on first input instead,
        #: exec/HashProbe.cpp:419; publishing-time pushdown lets the
        #: parquet row-group pruner see the filter too)
        self.on_ready: List[Callable] = []

    @property
    def build_has_null_key(self) -> bool:
        if self._has_null is None:
            # lazy host sync; count-replay elides it on repeat runs
            self._has_null = _fetch_bool("has_null", self._has_null_dev)
        return self._has_null

    @build_has_null_key.setter
    def build_has_null_key(self, v) -> None:
        if isinstance(v, (bool, np.bool_)):
            self._has_null = bool(v)
            self._has_null_dev = None
        else:
            self._has_null_dev = v        # device scalar, defer the sync
            self._has_null = None

    def mark_ready(self) -> None:
        self.ready = True
        for cb in self.on_ready:
            cb()


class HashBuildOp(Operator):
    """velox/exec/HashBuild.cpp — sink: buffer, concat, sort-by-key."""

    blocking = True
    #: subclass hook: how the build index is produced
    _index_build = staticmethod(build_join_index)

    def __init__(self, node, bridge: JoinBridge):
        super().__init__(node)
        self.bridge = bridge
        self._buffer = SpillableBuffer("hash_build")

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def no_more_input(self) -> None:
        if self.no_more_input_seen:
            return
        super().no_more_input()
        node = self.bridge.node
        if (self._buffer.has_spilled()
                and type(self)._index_build is build_join_index):
            # partitioned join spill: the build stays in host RAM split
            # by key hash; the probe side partitions identically and the
            # join runs one partition at a time (velox/exec/Spill.h:276
            # recursive partitioning, one level — host RAM is the file)
            self._spill_partitioned(node)
            return
        batches = self._buffer.drain()
        if batches:
            big = concat_batches(batches)
            # sparse build sides (e.g. a heavily filtered upstream kept
            # at its input capacity) shrink before index construction:
            # all build work then runs at the true row count, and the
            # bridged build_batch that every probe batch gathers from
            # stays small. compact() is a sort-based pack
            # (ops/sort.pack_indices); the count sync is skipped when
            # upstream already knows it.
            big = big.compact(big.num_rows)
        else:
            big = Batch.empty_like(
                node.right.output_type, round_capacity(1))
        self._build_state(node, big)

    def _spill_partitioned(self, node) -> None:
        import numpy as np

        from velox_tpu.exec.spill import _np_key_hash
        from velox_tpu.utils.config import config as _cfg

        P = _cfg.spill_join_partitions
        host, device = self._buffer.drain_host()
        host = host + [
            {n: (c.dtype, np.asarray(c.values),
                 None if c.valid is None else np.asarray(c.valid),
                 c.dictionary, c.stats) for n, c in b.columns.items()} |
            {"__sel__": (None, np.asarray(b.sel), None, None, None)}
            for b in device]
        parts = [[] for _ in range(P)]
        any_rows = False
        for hb in host:
            sel = hb["__sel__"][1]
            keys = [(hb[k][1], hb[k][2]) for k in node.right_keys]
            pid = (_np_key_hash(keys) % P).astype(np.int64)
            for p in range(P):
                idx = np.nonzero(np.logical_and(sel, pid == p))[0]
                if idx.shape[0] == 0:
                    continue
                any_rows = True
                parts[p].append({
                    n: (t, v[idx], None if va is None else va[idx], d, st)
                    for n, (t, v, va, d, st) in hb.items()
                    if n != "__sel__"})
        br = self.bridge
        br.spill_parts = parts
        br.spill_empty = not any_rows
        br.mark_ready()

    def _build_state(self, node, big: Batch) -> None:
        build_bridge_state(
            self.bridge, node, big, type(self)._index_build)

    def get_output(self) -> Optional[Batch]:
        return None

    def is_finished(self) -> bool:
        return self.no_more_input_seen


def build_bridge_state(bridge, node, big: Batch, index_build) -> None:
    """Compute + install the build-side join state on a bridge. Shared
    by the normal build sink and the spilled-probe per-partition
    restore (one partition's build at a time)."""
    # a SELECTIVE build (q18's 117 big orders arriving in a 4.2M-cap
    # batch) would drag its dead capacity through every probe: the
    # flip-probe rank sorts, table scatters and expand gathers all
    # cost by BUILD CAPACITY. One count fetch (replay-elided on
    # repeat runs) right-sizes it — measured 1.85s of the Q18 SF2
    # steady wall
    if big.capacity > (1 << 16):
        cnt = big.selected_count()
        if cnt * 8 < big.capacity:
            if index_build is build_join_index_presorted:
                # keep the sorted order: prefix-pack, not sort-pack
                big = big.compact(cnt) if not big.is_prefix_dense() \
                    else big.compact_prefix(cnt)
            else:
                big = big.compact(cnt)
    codec = JoinKeyCodec(big, node.right_keys)
    from velox_tpu.utils.config import config as _cfg

    rng_hint = codec.range_hint(_cfg.karray_join_span)

    cols = [(big.column(k).values, big.column(k).valid)
            for k in node.right_keys]
    dicts = [big.column(k).dictionary for k in node.right_keys]

    if True:
        def make():
            def build(cols, sel):
                key, null_valid, match_valid = codec.encode(
                    cols, dicts, is_probe=False)
                valid = null_valid
                if match_valid is not None:
                    valid = (match_valid if valid is None
                             else jnp.logical_and(valid, match_valid))
                sorted_keys, perm, n_active = index_build(
                    key, valid, sel)
                has_null = (
                    jnp.any(jnp.logical_and(
                        sel, jnp.logical_not(null_valid)))
                    if null_valid is not None else jnp.asarray(False))
                tables = ()
                if rng_hint is not None:
                    tables = build_join_table(
                        sorted_keys, n_active, rng_hint[0], rng_hint[1])
                return sorted_keys, perm, n_active, has_null, tables
            return build

        build = cached_jit(
            ("join_build", node.id, tuple(id(d) for d in dicts),
             codec.key_sig(), rng_hint,
             index_build is build_join_index_presorted), make)
        sorted_keys, perm, n_active, has_null, tables = build(cols, big.sel)
        br = bridge
        br.build_batch = big
        br.codec = codec
        br.sorted_keys, br.perm, br.n_active = sorted_keys, perm, n_active
        br.tables, br.key_lo = tables, (rng_hint[0] if rng_hint else 0)
        br.matched = _const_zeros_bool(big.capacity)
        br.build_has_null_key = has_null    # device scalar; lazy sync
        br.mark_ready()


class HashProbeOp(AdaptiveOutput, Operator):
    """velox/exec/HashProbe.cpp — vectorized probe over the sorted build
    index; all 8 join types. Two jitted programs per batch shape: probe
    (counts) and expand+gather (keyed by output capacity)."""

    #: subclass hook: how probe (first, count) runs are produced
    _index_probe = staticmethod(probe_join_index)

    def __init__(self, node: HashJoinNode, bridge: JoinBridge):
        super().__init__(node)
        self.bridge = bridge
        self.jt = node.join_type
        self._queue: collections.deque = collections.deque()
        self._filter_exprs = None
        if node.filter is not None:
            self._filter_exprs = ExprEvaluator(
                [node.filter], _join_filter_schema(node))
        self._final_emitted = False
        self._probe_jits: Dict[tuple, Callable] = {}
        self._expand_jits: Dict[tuple, Callable] = {}
        self._pushdown_scan = None  # set by LocalPlanner
        self._pushdown_done = False
        bridge.on_ready.append(self._on_build_ready)
        self._probe_buf = None       # spilled-build probe buffering
        self._spill_pending = None   # partition ids left to process
        self._probe_parts = None     # per-partition probe host fragments
        self._spill_global_null = False

    #: value sets at most this large push as exact sorted IN-tables
    _SET_PUSH_MAX = 4096
    #: string sets at most this large push as IN literal lists (bound
    #: per probe dictionary — works across differing dictionaries)
    _STR_SET_MAX = 100
    #: build columns beyond this capacity skip pushdown (D2H cost)
    _PUSH_CAP_MAX = 1 << 21

    def _on_build_ready(self) -> None:
        if not self._pushdown_done and self._pushdown_scan is not None:
            self._push_dynamic_filter()

    def _push_dynamic_filter(self) -> None:
        """Push build-side key filters into the probe-side scan: exact
        IN-sets for small builds (incl. dictionary string keys and
        every eligible key of a multi-key join), min/max ranges, and a
        bloom bitmask for large integer builds
        (velox/exec/HashProbe.cpp:419-444 dynamic filters; value sets +
        bloom per velox/common/base/BloomFilter.h, build pattern
        velox/exec/HashTable.cpp:1036-1048). Fires at build
        publication — BEFORE the scan realizes lazy parquet splits, so
        the row-group pruner (io/catalog.py _may_match) prunes on
        these filters too."""
        self._pushdown_done = True
        scan = self._pushdown_scan
        br = self.bridge
        if (scan is None or not br.ready or br.spill_parts is not None
                or br.build_batch is None):
            return
        if (scan._splits_cache is not None
                and not scan._splits_cache):
            # drained scan: every push below is wasted tunnel traffic
            return
        big = br.build_batch
        if big.capacity > self._PUSH_CAP_MAX:
            return
        from velox_tpu.expr.ir import (
            Call as _Call, FieldRef as _FR, Literal as _Lit, and_,
            field, gte, lit, lte,
        )

        scan_cols = set(getattr(scan.node, "all_columns",
                                scan.node.columns))
        # ONE device->host transfer for everything the push reads (each
        # np.asarray is a full ~33ms round trip on the tunneled backend)
        fetch = {"__sel__": big.sel}
        for lk, rk in zip(self.node.left_keys, self.node.right_keys):
            if lk not in scan_cols:
                continue
            col = big.column(rk)
            fetch[f"v.{rk}"] = col.values
            if col.valid is not None:
                fetch[f"m.{rk}"] = col.valid
        host = _fetch_tree(f"dynfilter:{self.node.id}", fetch)
        sel_host = host["__sel__"]
        if not sel_host.any():
            scan.dynamic_filters.append(ExprEvaluator(
                [lit(False)], scan._fschema))
            return
        conjs = []
        for lk, rk in zip(self.node.left_keys, self.node.right_keys):
            if lk not in scan_cols:
                continue
            col = big.column(rk)
            vals = host[f"v.{rk}"]
            m = sel_host
            if col.valid is not None:
                m = np.logical_and(m, host[f"m.{rk}"])
            live = vals[m]
            if live.size == 0:
                continue
            if col.dictionary is not None:
                # decode distinct build codes; the IN literal list
                # re-binds against the PROBE side's own dictionary
                codes = np.unique(live)
                codes = codes[codes >= 0]
                if len(codes) > self._STR_SET_MAX:
                    continue
                svals = [str(col.dictionary.values[c]) for c in codes]
                conjs.append(_Call(BOOLEAN, "in", tuple(
                    [field(lk)] + [_Lit(None, s) for s in svals])))
                continue
            u = np.unique(live)
            f = field(lk)
            if len(u) <= self._SET_PUSH_MAX:
                table = np.ascontiguousarray(u)
                conjs.append(_Call(BOOLEAN, "__in_table",
                                   (f, _Lit(BIGINT, table))))
            else:
                conjs.append(and_(gte(f, lit(u[0].item())),
                                  lte(f, lit(u[-1].item()))))
                from velox_tpu.ops.bloom import build_bloom

                words = build_bloom(u)
                conjs.append(_Call(BOOLEAN, "__bloom_contains",
                                   (f, _Lit(BIGINT, words))))
        if not conjs:
            return
        expr = conjs[0]
        for c in conjs[1:]:
            expr = _Call(BOOLEAN, "and", (expr, c))
        scan.dynamic_filters.append(
            ExprEvaluator([expr], scan._fschema))

    # ------------------------------------------------------------ helpers
    @property
    def _semi_like(self) -> bool:
        return self.jt in (JoinType.LEFT_SEMI, JoinType.ANTI,
                           JoinType.ANTI_SIMPLE)

    @property
    def _left_like(self) -> bool:
        return self.jt in (JoinType.LEFT, JoinType.FULL)

    def _probe_sorted(self, batch: Batch) -> bool:
        """Hash probes assume nothing about probe order (MergeJoinProbeOp
        overrides with a device-verified sortedness check)."""
        return False

    def _probe_fn(self, batch: Batch) -> Callable:
        br = self.bridge
        node = self.node
        keys = node.left_keys
        dicts = [batch.column(k).dictionary for k in keys]
        # bridge-state hints (incl. the build key codec, whose key
        # normalization offsets differ per build) are baked into the
        # closure: key them BY VALUE — key_sig() captures exactly the
        # host constants the closure bakes, so a fresh Task over the
        # same data reuses the compiled probe (keying by codec identity
        # forced a re-trace + remote-compile round trip per run: ~1s
        # per probe on the tunneled backend), while spilled-probe
        # per-partition restores still get distinct programs
        # only the ANTI family bakes the build-null flag into the traced
        # program — reading it lazily keeps inner/semi/left probes free
        # of the build's has-null host sync (JoinBridge property)
        null_flag = (br.build_has_null_key
                     if self.jt in (JoinType.ANTI, JoinType.ANTI_SIMPLE)
                     else False)
        merge_flip = self._probe_sorted(batch)
        sig = (tuple(id(d) for d in dicts), len(br.tables), br.key_lo,
               null_flag, br.codec.key_sig(), merge_flip)
        fn = self._probe_jits.get(sig)
        if fn is not None:
            return fn
        jt = self.jt
        codec = br.codec
        no_filter_semi = self._semi_like and self._filter_exprs is None
        build_has_null = null_flag
        left_like = self._left_like
        # "repair" pre-repairs the lane inside the closure (see
        # repair_tail below), then uses the raw flipped probe
        index_probe = {
            False: type(self)._index_probe,
            "raw": probe_join_index_merge,
            "repair": probe_join_index_merge,
        }[merge_flip]
        # kArray double-gather first whenever the range table exists:
        # two span-table gathers (~100ms at 8.4M probe x 12M span on
        # v5e) beat the flip probe's rank sorts (~260ms) and the
        # probe-width binary search by a wide margin (round-5 on-chip
        # measurement; the round-4 note claiming the flip won predates
        # the sort-rank rework and the table path's range clipping)
        use_table = len(br.tables) == 2
        key_lo = br.key_lo

        repair_tail = merge_flip == "repair"

        def make():
            def probe(cols, sel, sorted_keys, n_active, tables):
                key, null_valid, match_valid = codec.encode(
                    cols, dicts, is_probe=True)
                if repair_tail:
                    # suffix-repair the lane BEFORE folding in
                    # match_valid: the codec's range mask marks real,
                    # sorted rows as unmatchable for OUTPUT purposes —
                    # overwriting those would clobber live run
                    # boundaries (the join-fuzzer iter-8 bug). Only
                    # rows absent from the lane order (padding tails,
                    # trailing null keys under NULLS LAST) fill with
                    # the lane max.
                    okf = (sel if null_valid is None
                           else jnp.logical_and(sel, null_valid))
                    cnt = jnp.sum(okf.astype(jnp.int32))
                    idx = jnp.arange(key.shape[0], dtype=jnp.int32)
                    pk = key.astype(sorted_keys.dtype)
                    key = jnp.where(idx < cnt, pk,
                                    jnp.iinfo(pk.dtype).max)
                valid = null_valid
                if match_valid is not None:
                    valid = (match_valid if valid is None
                             else jnp.logical_and(valid, match_valid))
                if use_table:
                    first, count = probe_join_table(
                        tables[0], tables[1], key_lo, key, valid, sel)
                elif merge_flip:
                    # host key stats enable the int32-packed rank sort
                    first, count = index_probe(
                        sorted_keys, n_active, key, valid, sel,
                        key_range=codec.lohi)
                else:
                    first, count = index_probe(
                        sorted_keys, n_active, key, valid, sel)
                if no_filter_semi:
                    if jt == JoinType.LEFT_SEMI:
                        out = jnp.logical_and(sel, count > 0)
                    elif jt == JoinType.ANTI_SIMPLE:
                        out = jnp.logical_and(sel, count == 0)
                    else:  # null-aware NOT IN: null probe keys drop,
                        # provably-unmatchable non-null keys survive
                        if build_has_null:
                            out = jnp.zeros_like(sel)
                        else:
                            out = jnp.logical_and(sel, count == 0)
                            if null_valid is not None:
                                out = jnp.logical_and(out, null_valid)
                    return out
                emit = sel if left_like else None
                total = match_total(count, emit)
                pvalid = (null_valid if null_valid is not None
                          else jnp.ones_like(sel))
                return first, count, pvalid, total

            return probe

        fn = cached_jit(
            ("join_probe", node.id, sig, codec.key_sig(),
             bool(build_has_null), use_table, key_lo), make)
        self._probe_jits[sig] = fn
        return fn

    def _expand_fn(self, batch: Batch, out_cap: int) -> Callable:
        node = self.node
        sig = (out_cap,) + tuple(
            id(batch.column(k).dictionary) for k in node.left_keys)
        fn = self._expand_jits.get(sig)
        if fn is not None:
            return fn
        jt = self.jt
        left_like = self._left_like
        semi_like = self._semi_like
        lt_names = list(node.left.output_type.names)
        rt_names = list(node.right.output_type.names)
        filter_eval = self._filter_exprs
        bb = self.bridge.build_batch
        filter_set = None
        if filter_eval is not None:
            dicts = {
                n: c.dictionary for n, c in
                list(batch.columns.items()) + list(bb.columns.items())
                if c.dictionary is not None}
            from velox_tpu.expr.compiler import ExprSet

            filter_set = ExprSet(
                filter_eval.exprs, filter_eval.schema, dicts)
        track_matched = jt in (
            JoinType.RIGHT, JoinType.FULL, JoinType.RIGHT_SEMI) or (
            filter_set is not None and semi_like)

        def expand(pcols, bcols, first, count, sel, flags, build_perm):
            cap = sel.shape[0]
            bcap = flags.shape[0]
            emit = sel if left_like else None
            probe_rows, build_rows, matched, osel = expand_matches(
                first, count, build_perm, out_cap, emit)
            out = {}
            for n in lt_names:
                v, va = pcols[n]
                out[n] = (
                    jnp.take(v, probe_rows, mode="clip"),
                    None if va is None
                    else jnp.take(va, probe_rows, mode="clip"))
            for n in rt_names:
                v, va = bcols[n]
                gv = jnp.take(v, build_rows, mode="clip")
                gva = (matched if va is None
                       else jnp.logical_and(
                           jnp.take(va, build_rows, mode="clip"), matched))
                out[n] = (gv, gva)

            passing = None
            if filter_set is not None:
                arrays = {
                    n: out[n] for n in filter_set.field_names}
                (fv, fva) = filter_set.evaluate(arrays)[0]
                passing = jnp.logical_and(osel, fv)
                if fva is not None:
                    passing = jnp.logical_and(passing, fva)

            new_flags = flags
            if track_matched:
                hit = jnp.logical_and(matched, osel)
                if passing is not None:
                    hit = jnp.logical_and(hit, passing)
                new_flags = jnp.logical_or(
                    flags, build_matched_flags(
                        bcap, build_rows, hit, jnp.ones_like(osel)))

            pass_cnt = None
            if passing is not None and (left_like or semi_like):
                hit = jnp.logical_and(
                    jnp.logical_and(matched, osel), passing)
                pass_cnt = (
                    jnp.zeros((cap,), jnp.int32)
                    .at[jnp.where(hit, probe_rows, cap)]
                    .add(1, mode="drop"))

            out_sel = osel
            resurrect = None
            if passing is not None:
                if left_like:
                    keep_matched = jnp.logical_and(matched, passing)
                    no_pass = jnp.take(
                        pass_cnt, probe_rows, mode="clip") == 0
                    keep_unmatched = jnp.logical_and(
                        jnp.logical_not(matched), no_pass)
                    out_sel = jnp.logical_and(
                        osel, jnp.logical_or(keep_matched, keep_unmatched))
                    resurrect = jnp.logical_and(
                        jnp.logical_and(sel, count > 0), pass_cnt == 0)
                    # invalidate build columns of now-unmatched rows
                    ok = jnp.logical_and(matched, passing)
                    for n in rt_names:
                        v, va = out[n]
                        out[n] = (v, ok if va is None
                                  else jnp.logical_and(va, ok))
                elif semi_like:
                    pass  # handled via pass_cnt below
                else:
                    out_sel = jnp.logical_and(osel, passing)
            return out, out_sel, new_flags, pass_cnt, resurrect

        fn = cached_jit(("join_expand", node.id, sig), lambda: expand)
        self._expand_jits[sig] = fn
        return fn

    def _project_out(self, b: Batch) -> Batch:
        out = Batch(
            {n: b.columns[n] for n in self.output_type.names}, b.sel,
            b.num_rows)
        out._prefix_dense = b._prefix_dense   # sel unchanged
        return out

    # -------------------------------------------------------------- input
    def add_input(self, batch: Batch) -> None:
        if self.bridge.spill_parts is not None:
            # spilled build: buffer the probe side; the join runs one
            # hash partition at a time at finish (velox spilled-probe
            # restore, exec/HashProbe.cpp spillInput)
            from velox_tpu.exec.spill import SpillableBuffer

            if self._probe_buf is None:
                self._probe_buf = SpillableBuffer(
                    f"join_probe:{self.node.id}")
            self._probe_buf.append(batch)
            return
        self._probe_batch(batch)

    def _probe_batch(self, batch: Batch) -> None:
        br = self.bridge
        assert br.ready, "probe before build finished"
        if not self._pushdown_done:
            self._push_dynamic_filter()
        jt = self.jt
        node = self.node
        pf = self._probe_fn(batch)
        key_cols = [(batch.column(k).values, batch.column(k).valid)
                    for k in node.left_keys]

        if self._semi_like and self._filter_exprs is None:
            new_sel = pf(key_cols, batch.sel, br.sorted_keys, br.n_active,
                         br.tables)
            self._queue.append(
                self._project_out(batch.with_sel(new_sel)))
            return

        first, count, pvalid, total = pf(
            key_cols, batch.sel, br.sorted_keys, br.n_active, br.tables)
        # single host sync per batch (count-replay elides it on repeat)
        total = _fetch_int(f"probe:{self.node.id}", total)
        if total == 0:
            if self._filter_exprs is not None and jt in (
                    JoinType.ANTI, JoinType.ANTI_SIMPLE):
                sel = batch.sel
                if jt == JoinType.ANTI:
                    if br.build_has_null_key:
                        sel = jnp.zeros_like(sel)
                    else:
                        sel = jnp.logical_and(sel, pvalid)
                self._queue.append(self._project_out(batch.with_sel(sel)))
            return
        out_cap = round_capacity(total)
        ef = self._expand_fn(batch, out_cap)
        pcols = _cols_of(batch, node.left.output_type.names)
        bcols = _cols_of(br.build_batch, node.right.output_type.names)
        out, out_sel, new_flags, pass_cnt, resurrect = ef(
            pcols, bcols, first, count, batch.sel, br.matched, br.perm)
        br.matched = new_flags

        if self._filter_exprs is not None and self._semi_like:
            if jt == JoinType.LEFT_SEMI:
                sel = jnp.logical_and(batch.sel, pass_cnt > 0)
            else:
                sel = jnp.logical_and(batch.sel, pass_cnt == 0)
                if jt == JoinType.ANTI:
                    if br.build_has_null_key:
                        sel = jnp.zeros_like(sel)
                    else:
                        sel = jnp.logical_and(sel, pvalid)
            self._queue.append(self._project_out(batch.with_sel(sel)))
            return
        if jt == JoinType.RIGHT_SEMI:
            return  # build rows emitted at finish

        joined = self._joined_batch(
            batch, out, out_sel,
            # unfiltered expansions emit a packed prefix of exactly
            # `total` rows (ops/join.py expand_matches out_sel) — record
            # it so downstream dense fast paths need no count sync
            total if self._filter_exprs is None else None)
        self._queue.append(self._project_out(joined))
        if resurrect is not None:
            self._queue.append(self._null_extended(batch, resurrect))

    def _joined_batch(self, batch: Batch, out, out_sel,
                      num_rows: Optional[int] = None) -> Batch:
        node = self.node
        cols = {}
        for n in node.left.output_type.names:
            src = batch.column(n)
            v, va = out[n]
            cols[n] = Column(src.dtype, v, va, src.dictionary)
        for n in node.right.output_type.names:
            src = self.bridge.build_batch.column(n)
            v, va = out[n]
            cols[n] = Column(src.dtype, v, va, src.dictionary)
        b = Batch(cols, out_sel, num_rows)
        if num_rows is not None:
            b._prefix_dense = True
        return b

    def _null_extended(self, batch: Batch, sel) -> Batch:
        """Probe rows + all-null build columns (left-outer no-match)."""
        cols = {}
        for n in self.node.left.output_type.names:
            cols[n] = batch.column(n)
        for n, t in zip(self.node.right.output_type.names,
                        self.node.right.output_type.children):
            c = self.bridge.build_batch.column(n)
            cols[n] = Column(
                t, jnp.zeros((batch.capacity,), c.values.dtype),
                jnp.zeros((batch.capacity,), jnp.bool_), c.dictionary)
        return self._project_out(Batch(cols, sel))

    # ------------------------------------------------------------- output
    def get_output(self) -> Optional[Batch]:
        if self._queue:
            return self._shape_output(self._queue.popleft())
        if (self.no_more_input_seen
                and self.bridge.spill_parts is not None
                and not self._final_emitted):
            if self._spill_pending is None:
                self._prepare_spill_probe()
            while self._spill_pending and not self._queue:
                self._process_spill_partition(self._spill_pending.pop())
            if self._queue:
                return self._shape_output(self._queue.popleft())
            self._final_emitted = True
            return None
        if (self.no_more_input_seen and not self._final_emitted
                and self.jt in (JoinType.RIGHT, JoinType.FULL,
                                JoinType.RIGHT_SEMI)):
            self._final_emitted = True
            return self._shape_output(self._emit_build_side())
        return None

    # ------------------------------------- spilled-build partitioning
    def _prepare_spill_probe(self) -> None:
        import numpy as np

        from velox_tpu.exec.spill import _np_key_hash
        from velox_tpu.utils.config import config as _cfg

        br = self.bridge
        P = len(br.spill_parts)
        self._pushdown_done = True
        # global null-key flag (null-aware ANTI needs the whole build)
        self._spill_global_null = any(
            frag[k][2] is not None and not frag[k][2].all()
            for part in br.spill_parts for frag in part
            for k in self.node.right_keys)
        # split buffered probe batches by the SAME key-hash partition fn
        self._probe_parts = [[] for _ in range(P)]
        if self._probe_buf is not None:
            host, device = self._probe_buf.drain_host()
            host = host + [
                {n: (c.dtype, np.asarray(c.values),
                     None if c.valid is None else np.asarray(c.valid),
                     c.dictionary, c.stats)
                 for n, c in b.columns.items()} |
                {"__sel__": (None, np.asarray(b.sel), None, None, None)}
                for b in device]
            for hb in host:
                sel = hb["__sel__"][1]
                keys = [(hb[k][1], hb[k][2])
                        for k in self.node.left_keys]
                pid = (_np_key_hash(keys) % P).astype(np.int64)
                for p in range(P):
                    idx = np.nonzero(np.logical_and(sel, pid == p))[0]
                    if idx.shape[0] == 0:
                        continue
                    self._probe_parts[p].append({
                        n: (t, v[idx],
                            None if va is None else va[idx], d, st)
                        for n, (t, v, va, d, st) in hb.items()
                        if n != "__sel__"})
        self._spill_pending = list(range(P))

    @staticmethod
    def _restore_fragments(frags, schema, cap_min=1) -> Optional[Batch]:
        import numpy as np

        if not frags:
            return None
        total = sum(next(iter(f.values()))[1].shape[0] for f in frags)
        cap = round_capacity(max(total, cap_min))
        cols = {}
        for n in frags[0]:
            t, _, _, d, st = frags[0][n]
            vals = np.concatenate([f[n][1] for f in frags])
            buf = np.zeros(cap, dtype=vals.dtype)
            buf[:total] = vals
            if any(f[n][2] is not None for f in frags):
                va = np.concatenate([
                    f[n][2] if f[n][2] is not None
                    else np.ones(f[n][1].shape[0], bool) for f in frags])
                vbuf = np.zeros(cap, dtype=bool)
                vbuf[:total] = va
                valid = jnp.asarray(vbuf)
            else:
                valid = None
            cols[n] = Column(t, jnp.asarray(buf), valid, d, st)
        sel = np.zeros(cap, dtype=bool)
        sel[:total] = True
        return Batch(cols, jnp.asarray(sel), total)

    def _process_spill_partition(self, p: int) -> None:
        br = self.bridge
        node = self.node
        build = self._restore_fragments(
            br.spill_parts[p], node.right.output_type)
        if build is None:
            build = Batch.empty_like(
                node.right.output_type, round_capacity(1))
        build_bridge_state(br, node, build, build_join_index)
        br.build_has_null_key = self._spill_global_null
        probe = self._restore_fragments(
            self._probe_parts[p], node.left.output_type)
        if probe is not None:
            self._probe_batch(probe)
        if self.jt in (JoinType.RIGHT, JoinType.FULL,
                       JoinType.RIGHT_SEMI):
            out = self._emit_build_side()
            if out is not None:
                self._queue.append(out)

    def _emit_build_side(self) -> Optional[Batch]:
        br = self.bridge
        big = br.build_batch
        if self.jt == JoinType.RIGHT_SEMI:
            sel = jnp.logical_and(big.sel, br.matched)
            return self._project_out(big.with_sel(sel))
        # RIGHT/FULL: unmatched build rows with null probe columns
        sel = jnp.logical_and(big.sel, jnp.logical_not(br.matched))
        if _fetch_int("rsemi_count", jnp.sum(sel)) == 0:
            return None
        cols = {}
        for n, t in zip(self.node.left.output_type.names,
                        self.node.left.output_type.children):
            cols[n] = Column(
                t, jnp.zeros((big.capacity,), np.dtype(t.dtype)),
                jnp.zeros((big.capacity,), jnp.bool_))
        for n in self.node.right.output_type.names:
            cols[n] = big.column(n)
        return self._project_out(Batch(cols, sel))

    def is_finished(self) -> bool:
        if not self.no_more_input_seen or self._queue:
            return False
        if self.bridge.spill_parts is not None:
            return self._final_emitted
        if self.jt in (JoinType.RIGHT, JoinType.FULL, JoinType.RIGHT_SEMI):
            return self._final_emitted
        return True


def _join_filter_schema(node):
    from velox_tpu.types.types import row_type

    lt, rt = node.left.output_type, node.right.output_type
    return row_type(
        tuple(lt.names) + tuple(rt.names),
        tuple(lt.children) + tuple(rt.children))


# ------------------------------------------------------------- cross join

class MergeJoinBuildOp(HashBuildOp):
    """velox/exec/MergeJoin.h:47 build half: the plan guarantees the
    right input arrives ASCENDING on the join keys, so the build index is
    a null-packing ``nonzero`` gather — no lax.sort kernel ever compiles
    (the streaming answer to the TPU remote-compiler's erratic large-sort
    compiles, BASELINE.md Q3 note)."""

    _index_build = staticmethod(build_join_index_presorted)


class MergeJoinProbeOp(HashProbeOp):
    """velox/exec/MergeJoin.h:47 probe half over sorted input: match runs
    come from the flipped merge (build-width binary searches into the
    sorted probe lane + difference-array prefix sums — ops/join.py
    probe_join_index_merge) when a device check proves the probe lane
    ascending, else per-probe binary search. All join types, filters, and
    the downstream expand/gather machinery are shared with the hash
    probe."""

    _index_probe = staticmethod(probe_join_index_presorted)

    def _probe_sorted(self, batch: Batch):
        node = self.node
        if len(node.left_keys) != 1:
            return False
        col = batch.column(node.left_keys[0])
        if col.dictionary is not None:
            return False
        if col.values.dtype not in (jnp.int32, jnp.int64):
            return False
        # plan contract says ascending, but invalid-row slots may hold
        # arbitrary lane values (batch tails padded to capacity):
        # classify on device. The cummax over the full lane is the
        # most expensive device work in TPC-H Q18's steady state
        # (~700ms/8.4M-row batch on the tunneled v5e — int64 cummax
        # is emulated) and count-replay's validation RE-RUNS it every
        # replay; the verdict is a pure function of (plan node, split
        # lanes), so memoize it on the immutable split buffers and
        # skip the device work entirely on repeat runs.
        # 2 = raw lane ascending (flip directly), 1 = only the valid
        # subsequence ascends (flip with cummax repair —
        # ops/join.py probe_join_index_merge_repair), 0 = fall back
        from velox_tpu.utils.replay import _EPOCH

        memo_key = (node.id, _EPOCH[0], id(col.values), id(col.valid))
        code = _MJ_SORTED_MEMO.get(memo_key)
        if code is None:
            has_valid = col.valid is not None
            chk = cached_jit(
                ("mj_probe_sorted3", col.values.dtype.name, has_valid),
                lambda: (lambda v, sel, va: valid_ascending_code(
                    v, sel if va is None else jnp.logical_and(sel, va))))
            # a PLAIN blocking read, never fetch_int: this fetch only
            # exists on memo misses, and a recorded fetch that later
            # runs skip would diverge every first replay
            code = int(chk(col.values, batch.sel, col.valid))
            if len(_MJ_SORTED_MEMO) > 4096:
                _MJ_SORTED_MEMO.clear()
            _MJ_SORTED_MEMO[memo_key] = code
        return {0: False, 1: "repair", 2: "raw"}[code]


#: (node id, probe-lane buffer ids) -> ascending classification; the
#: lanes are immutable device buffers so identity keys are sound
_MJ_SORTED_MEMO: Dict[tuple, int] = {}


class CrossBuildOp(Operator):
    """velox/exec/NestedLoopJoinBuild.h:33 — sink the (small) build side."""

    blocking = True

    def __init__(self, node, bridge: JoinBridge):
        super().__init__(node)
        self.bridge = bridge
        self._buffer = SpillableBuffer("cross_build")

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def no_more_input(self) -> None:
        if self.no_more_input_seen:
            return
        super().no_more_input()
        node = self.bridge.node
        batches = self._buffer.drain()
        if batches:
            big = concat_batches(batches)
        else:
            big = Batch.empty_like(node.right.output_type, round_capacity(1))
        # compact actives to the front
        perm = compact_indices(big.sel)
        sel_sorted = jnp.take(big.sel, perm, mode="clip")
        self.bridge.build_batch = big.gather(perm, sel_sorted)
        self.bridge.n_active = _fetch_int("cross_active", jnp.sum(big.sel))
        self.bridge.mark_ready()

    def get_output(self) -> Optional[Batch]:
        return None

    def is_finished(self) -> bool:
        return self.no_more_input_seen


class CrossProbeOp(Operator):
    """velox/exec/NestedLoopJoinProbe.h:68 — cartesian expansion + filter."""

    def __init__(self, node: CrossJoinNode, bridge: JoinBridge):
        super().__init__(node)
        self.bridge = bridge
        if node.join_type != JoinType.INNER:
            raise NotImplementedError(
                f"nested-loop join type {node.join_type}")
        self._filter = None
        if node.filter is not None:
            self._filter = ExprEvaluator(
                [node.filter], _join_filter_schema(node))
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        br = self.bridge
        assert br.ready
        nb = br.n_active
        if nb == 0:
            return
        perm = compact_indices(batch.sel)
        sel_sorted = jnp.take(batch.sel, perm, mode="clip")
        compacted = batch.gather(perm, sel_sorted)
        np_active = _fetch_int("cross_probe_active", jnp.sum(batch.sel))
        if np_active == 0:
            return
        total = np_active * nb
        cap = round_capacity(total)
        j = jnp.arange(cap, dtype=jnp.int32)
        probe_rows = j // nb
        build_rows = j % nb
        osel = j < total
        cols = {}
        for n in self.node.left.output_type.names:
            c = compacted.column(n)
            cols[n] = Column(
                c.dtype, jnp.take(c.values, probe_rows, mode="clip"),
                None if c.valid is None
                else jnp.take(c.valid, probe_rows, mode="clip"),
                c.dictionary)
        for n in self.node.right.output_type.names:
            c = br.build_batch.column(n)
            cols[n] = Column(
                c.dtype, jnp.take(c.values, build_rows, mode="clip"),
                None if c.valid is None
                else jnp.take(c.valid, build_rows, mode="clip"),
                c.dictionary)
        joined = Batch(cols, osel)
        if self._filter is not None:
            joined = joined.with_sel(self._filter.filter_sel(joined))
        self._queue.append(Batch(
            {n: joined.columns[n] for n in self.output_type.names},
            joined.sel))

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


# ------------------------------------------------------------------- misc

class EnforceSingleRowOp(Operator):
    """velox/core/PlanNode.h:5069 — scalar subquery guard."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._buffer: List[Batch] = []
        self._emitted = False

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        total = sum(b.selected_count() for b in self._buffer)
        if total > 1:
            raise RuntimeError(
                "Expected single row of input. Received " f"{total} rows.")
        if total == 1:
            return concat_batches(self._buffer) if len(self._buffer) > 1 \
                else self._buffer[0]
        # empty input -> one all-null row (scalar subquery semantics)
        cap = round_capacity(1)
        cols = {}
        for n, t in zip(self.output_type.names, self.output_type.children):
            cols[n] = Column(
                t, jnp.zeros((cap,), np.dtype(t.dtype)),
                jnp.zeros((cap,), jnp.bool_))
        sel = jnp.zeros((cap,), jnp.bool_).at[0].set(True)
        return Batch(cols, sel)

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted


class AssignUniqueIdOp(Operator):
    """velox/core/PlanNode.h:5153 — monotone unique int64 per row."""

    def __init__(self, node):
        super().__init__(node)
        self._next = 0
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        from velox_tpu.types import BIGINT

        base = (jnp.cumsum(batch.sel.astype(jnp.int64)) - 1) + self._next
        ids = jnp.where(batch.sel, base, 0) | (
            jnp.int64(self.node.task_unique_id) << 40)
        self._next += _fetch_int("rownum_count", jnp.sum(batch.sel))
        self._queue.append(batch.with_column(
            self.node.id_name, Column(BIGINT, ids.astype(jnp.int64))))

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue
