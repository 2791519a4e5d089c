"""Operator base + shared expression-evaluation machinery.

The Operator ABI mirrors velox/exec/Operator.h:241-299 (addInput /
needsInput / getOutput / noMoreInput / isFinished) minus the blocking
futures — in serial mode nothing blocks (velox's BlockingReason machinery
returns with the parallel driver in velox_tpu/parallel).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from velox_tpu.types.types import RowType
from velox_tpu.expr.compiler import ExprSet
from velox_tpu.expr.ir import Expr, FieldRef
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import Column


@dataclass
class OperatorStats:
    """Per-operator runtime stats (velox/exec/OperatorStats analog)."""

    operator_type: str = ""
    plan_node_id: str = ""
    input_batches: int = 0
    input_rows: int = 0
    output_batches: int = 0
    output_rows: int = 0
    add_input_wall_s: float = 0.0
    get_output_wall_s: float = 0.0
    finish_wall_s: float = 0.0  # no_more_input work (build sinks)
    runtime: Dict[str, float] = field(default_factory=dict)


#: below this capacity padded work is already cheap — never sync to shrink
_COMPACT_MIN_CAP = 1 << 16
#: compact when live rows * this < capacity (i.e. < 12.5% live)
_COMPACT_FRACTION = 8


class AdaptiveOutput:
    """Right-size sparse outputs (config.adaptive_compact, off by
    default).

    Velox operators emit right-sized RowVectors (output batching,
    velox/core/QueryConfig.h:479); this engine's batches instead keep
    their padded capacity with a selection mask so filters cost no host
    sync, and the stateful operators (join build/probe, aggregation
    emit) right-size at sync points they need anyway. This opt-in policy
    adds sizing for long post-filter operator chains those built-ins
    can't see: on an operator's first large output batch, sync ONE count
    (~26ms fixed round-trip on the tunneled backend, BASELINE.md); a
    dense verdict is remembered so non-selective operators never pay a
    second sync, while a sparse verdict compacts every batch — re-using
    exactly the count compact() needs.
    """

    _sparse_verdict: Optional[bool] = None

    def _shape_output(self, batch: Optional[Batch]) -> Optional[Batch]:
        from velox_tpu.utils.config import config as _cfg

        if (batch is None or not _cfg.adaptive_compact
                or self._sparse_verdict is False
                or batch.capacity < _COMPACT_MIN_CAP):
            return batch
        if (batch.num_rows is not None
                and batch.num_rows * _COMPACT_FRACTION >= batch.capacity):
            return batch          # dense, known without a sync
        count = (batch.num_rows if batch.num_rows is not None
                 else batch.selected_count())
        if self._sparse_verdict is None:
            self._sparse_verdict = (
                count * _COMPACT_FRACTION < batch.capacity)
        if count * _COMPACT_FRACTION >= batch.capacity:
            return batch
        return batch.compact(count)


class Operator:
    """Base operator. Subclasses override add_input/get_output/is_finished."""

    #: blocking operators emit output only after no_more_input
    blocking = False

    def __init__(self, node):
        self.node = node
        self.output_type: RowType = node.output_type
        self.no_more_input_seen = False
        self.stats = OperatorStats(
            operator_type=type(self).__name__, plan_node_id=node.id)

    # -- input side
    def close(self) -> None:
        """Release buffered state (spill registrations, device refs) —
        called when the task finishes or is abandoned, so one query's
        leftover buffers never count against the next query's memory
        budget (velox Operator::close, exec/Operator.h:352)."""
        for attr in ("_buffer", "_probe_buf", "_store"):
            buf = getattr(self, attr, None)
            if buf is not None and hasattr(buf, "close"):
                buf.close()

    def needs_input(self) -> bool:
        return not self.no_more_input_seen

    def add_input(self, batch: Batch) -> None:
        raise NotImplementedError

    def no_more_input(self) -> None:
        self.no_more_input_seen = True

    # -- output side
    def get_output(self) -> Optional[Batch]:
        raise NotImplementedError

    def is_finished(self) -> bool:
        raise NotImplementedError


#: global (schema, exprs, dictionaries, mode) -> (ExprSet, jitted) cache;
#: survives across Task executions so re-running a plan never re-traces
_EVAL_CACHE: Dict[tuple, Tuple["ExprSet", Callable]] = {}


def eval_pairs(batch: Batch) -> Dict[str, tuple]:
    """All (values, valid) pairs expression eval can reference. ARRAY
    columns contribute three derived flat lanes (#start/#len/#elemv) that
    bind_array_funcs targets (velox_tpu/expr/compiler.py); ROW columns
    contribute their scalar children under dotted subfield names ("r.a"),
    so field access over ROW intermediates is a plain lane read with the
    row's own null mask ANDed in (velox RowVector child access)."""
    from velox_tpu.vector.column import ArrayColumn, MapColumn, RowColumn

    out: Dict[str, tuple] = {}

    def add_row(prefix: str, rc: RowColumn, parent_valid):
        rv = rc.valid
        if parent_valid is not None:
            rv = (parent_valid if rv is None
                  else jnp.logical_and(rv, parent_valid))
        for nm, kid in zip(rc.dtype.names, rc.children):
            key = f"{prefix}.{nm}"
            if isinstance(kid, RowColumn):
                add_row(key, kid, rv)
            elif not isinstance(kid, (ArrayColumn, MapColumn)):
                kv = kid.valid
                if rv is not None:
                    kv = (rv if kv is None
                          else jnp.logical_and(kv, rv))
                out[key] = (kid.values, kv)

    for n, c in batch.columns.items():
        if isinstance(c, ArrayColumn):
            out[f"{n}#start"] = (c.starts, None)
            out[f"{n}#len"] = (c.lengths, c.valid)
            if not isinstance(c.elements,
                              (RowColumn, ArrayColumn, MapColumn)):
                out[f"{n}#elemv"] = (c.elements.values, c.elements.valid)
        elif isinstance(c, MapColumn):
            out[f"{n}#start"] = (c.starts, None)
            out[f"{n}#len"] = (c.lengths, c.valid)
            out[f"{n}#kv"] = (c.keys.values, c.keys.valid)
            if not isinstance(c.values,
                              (RowColumn, ArrayColumn, MapColumn)):
                out[f"{n}#vv"] = (c.values.values, c.values.valid)
        elif isinstance(c, RowColumn):
            add_row(n, c, None)
        else:
            out[n] = (c.values, c.valid)
    return out


def eval_dicts(batch: Batch) -> Dict[str, object]:
    """Dictionaries visible to bind time, incl. array element tables."""
    from velox_tpu.vector.column import ArrayColumn, MapColumn, RowColumn

    out: Dict[str, object] = {}

    def add_row(prefix: str, rc: RowColumn):
        for nm, kid in zip(rc.dtype.names, rc.children):
            key = f"{prefix}.{nm}"
            if isinstance(kid, RowColumn):
                add_row(key, kid)
            elif (not isinstance(kid, (ArrayColumn, MapColumn))
                  and kid.dictionary is not None):
                out[key] = kid.dictionary

    for n, c in batch.columns.items():
        if isinstance(c, ArrayColumn):
            if (not isinstance(c.elements,
                               (RowColumn, ArrayColumn, MapColumn))
                    and c.elements.dictionary is not None):
                out[f"{n}#elemv"] = c.elements.dictionary
        elif isinstance(c, MapColumn):
            if c.keys.dictionary is not None:
                out[f"{n}#kv"] = c.keys.dictionary
            if (not isinstance(c.values,
                               (RowColumn, ArrayColumn, MapColumn))
                    and c.values.dictionary is not None):
                out[f"{n}#vv"] = c.values.dictionary
        elif isinstance(c, RowColumn):
            add_row(n, c)
        elif c.dictionary is not None:
            out[n] = c.dictionary
    return out


class ExprEvaluator:
    """Compile-and-cache ExprSets per (schema, dictionary) signature.

    The dictionary signature matters because string predicates bind against
    host dictionaries at compile time (velox dictionary peeling analog,
    velox_tpu/expr/compiler.py bind_strings); the catalog's table-global
    dictionaries make this a single compile in practice.
    """

    def __init__(self, exprs: Sequence[Expr], schema: RowType):
        self.exprs = list(exprs)
        self.schema = schema

    def pure(self, dicts: Dict[str, object], mode: str = "eval",
             ranges: Optional[Dict[str, tuple]] = None
             ) -> Tuple[ExprSet, Callable]:
        """(ExprSet, UNJITTED run fn) for composition into fused kernels."""
        ranges = ranges or {}
        from velox_tpu.utils.config import config as _cfg

        sig = ("pure", mode, self.schema, _cfg.session_timezone,
               tuple(str(e) for e in self.exprs)) + tuple(
            sorted((n, id(d)) for n, d in dicts.items())) + tuple(
            sorted(ranges.items()))
        hit = _EVAL_CACHE.get(sig)
        if hit is None:
            expr_set = ExprSet(self.exprs, self.schema, dicts, ranges)
            hit = (expr_set, self._make_run(expr_set, mode))
            _EVAL_CACHE[sig] = hit
        return hit

    @staticmethod
    def _make_run(expr_set: "ExprSet", mode: str) -> Callable:
        if mode == "filter":
            def run(arrays, sel):
                (vals, valid) = expr_set.evaluate(arrays)[0]
                out = jnp.logical_and(sel, vals)
                if valid is not None:
                    out = jnp.logical_and(out, valid)
                return out
        elif mode == "project":
            def run(arrays, sel):
                cap = sel.shape[0]
                out = []
                for vals, valid in expr_set.evaluate(arrays):
                    if vals.ndim == 0:
                        vals = jnp.broadcast_to(vals, (cap,))
                    if valid is not None and valid.ndim == 0:
                        valid = jnp.broadcast_to(valid, (cap,))
                    out.append((vals, valid))
                return out
        else:
            def run(arrays, sel):
                return expr_set.evaluate(arrays)
        return run

    def _get(self, batch: Batch, mode: str = "eval"
             ) -> Tuple[ExprSet, Callable]:
        dicts = eval_dicts(batch)
        ranges = {
            n: c.stats for n, c in batch.columns.items()
            if c.stats is not None
        }
        from velox_tpu.utils.config import config as _cfg

        sig = (
            mode, self.schema, _cfg.session_timezone,
            tuple(str(e) for e in self.exprs),
        ) + tuple(sorted((n, id(d)) for n, d in dicts.items())) + tuple(
            sorted(ranges.items()))
        hit = _EVAL_CACHE.get(sig)
        if hit is None:
            expr_set = ExprSet(self.exprs, self.schema, dicts, ranges)
            hit = (expr_set, jax.jit(self._make_run(expr_set, mode)))
            _EVAL_CACHE[sig] = hit
        return hit

    def _arrays(self, expr_set: ExprSet, batch: Batch):
        pairs = eval_pairs(batch)
        return {name: pairs[name] for name in expr_set.field_names}

    def evaluate(self, batch: Batch) -> List[Tuple[jax.Array, Optional[jax.Array]]]:
        expr_set, jitted = self._get(batch)
        return jitted(self._arrays(expr_set, batch), batch.sel)

    def filter_sel(self, batch: Batch) -> jax.Array:
        """Fused predicate eval + selection intersection (one program)."""
        expr_set, jitted = self._get(batch, "filter")
        return jitted(self._arrays(expr_set, batch), batch.sel)

    def project_pairs(self, batch: Batch):
        """Fused projection: ((values, valid) pairs, result dictionaries)."""
        expr_set, jitted = self._get(batch, "project")
        pairs = jitted(self._arrays(expr_set, batch), batch.sel)
        return pairs, expr_set.result_dictionaries


def result_column(dtype, pair, source_expr: Optional[Expr] = None,
                  batch: Optional[Batch] = None) -> Column:
    """Wrap an eval result into a Column, preserving dictionaries for
    passthrough field references."""
    values, valid = pair
    if (
        source_expr is not None
        and isinstance(source_expr, FieldRef)
        and batch is not None
        and source_expr.name in batch
    ):
        src = batch.column(source_expr.name)
        if src.dictionary is not None:
            return Column(src.dtype, values, valid, src.dictionary)
    return Column(dtype, values, valid)


def key_pairs(batch: Batch, names: Sequence[str]):
    """(values, valid) pairs for grouping/partition keys."""
    return [
        (batch.column(n).values, batch.column(n).valid) for n in names
    ]
