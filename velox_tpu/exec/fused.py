"""Fused linear-pipeline execution.

The analog of velox's Wave fused-kernel codegen (velox/experimental/wave:
plan -> JIT'd fused kernels, exec/ToWave.h) done the XLA way: when an
output pipeline is ``TableScan -> (Filter|Project)* -> Aggregation``, the
per-batch work of every operator composes into ONE jitted program — the
scan's pushed-down filter, every predicate, every projection, and the
aggregation's grouping + accumulation all fuse; XLA sees a single pass
over the columns, so intermediates never materialize in HBM and the host
dispatches once per split.

This is a DriverAdapter-style plan rewrite (velox/exec/Driver.h:789):
LocalPlanner calls ``maybe_fuse`` on each planned operator chain.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import Dictionary
from velox_tpu.exec.jitcache import cached_jit
from velox_tpu.exec.operator import (
    AdaptiveOutput, Operator, eval_dicts, eval_pairs,
)
from velox_tpu.exec.operators import (
    FilterOp, HashAggregationOp, ProjectOp, TableScanOp,
)
from velox_tpu.plan.nodes import AggStep


def maybe_fuse(chain: List[Operator]) -> List[Operator]:
    """Rewrite a planned operator chain into a fused one when it matches."""
    if not config.fused_pipelines or len(chain) < 2:
        return chain
    if not isinstance(chain[0], TableScanOp):
        return chain
    from velox_tpu.types.types import TypeKind

    # ARRAY/MAP/ROW columns flow through operators as offset+element or
    # child lanes that a fused env can't passthrough; leave those
    # chains unfused
    for op in chain:
        if any(t.kind in (TypeKind.ARRAY, TypeKind.MAP, TypeKind.ROW)
               for t in op.node.output_type.children):
            return chain
    # longest transform prefix after the scan
    k = 1
    while k < len(chain) and isinstance(chain[k], (FilterOp, ProjectOp)):
        k += 1
    from velox_tpu.exec.operators import StreamingAggregationOp

    if (k == len(chain) - 1 and isinstance(chain[-1], HashAggregationOp)
            and not isinstance(chain[-1], StreamingAggregationOp)
            and chain[-1].step != AggStep.FINAL
            and not chain[-1]._collect):   # collect fns buffer raw rows
        return [FusedScanAggOp(chain)]
    if k > 1:
        return [FusedScanOp(chain[:k])] + chain[k:]
    return chain


class FusedScanOp(AdaptiveOutput, Operator):
    """Scan -> filters/projects as one jit per split (no aggregation)."""

    def __init__(self, chain: List[Operator]):
        self.scan: TableScanOp = chain[0]
        self.transforms = chain[1:]
        super().__init__(chain[-1].node)
        self._step_cache: Dict[tuple, tuple] = {}

    def _compile(self, batch: Batch):
        sig = tuple(sorted(
            (n, id(c.dictionary)) for n, c in batch.columns.items()
            if c.dictionary is not None))
        hit = self._step_cache.get(sig)
        if hit is not None:
            return hit
        dicts: Dict[str, Optional[Dictionary]] = dict(eval_dicts(batch))
        ranges = {
            n: c.stats for n, c in batch.columns.items()
            if c.stats is not None}
        stages = []
        if self.scan._filter is not None:
            _, run = self.scan._filter.pure(
                {n: d for n, d in dicts.items() if d is not None},
                "filter", ranges)
            stages.append(("filter", run, None))
        for op in self.transforms:
            live = {n: d for n, d in dicts.items() if d is not None}
            if isinstance(op, FilterOp):
                _, run = op._eval.pure(live, "filter", ranges)
                stages.append(("filter", run, None))
            else:
                expr_set, run = op._eval.pure(live, "project", ranges)
                names = list(op.node.names)
                stages.append(("project", run, names))
                dicts = {
                    n: d for n, d in zip(
                        names, expr_set.result_dictionaries)}

        def step(cols, sel):
            env = cols
            for kind, run, names in stages:
                if kind == "filter":
                    sel = run(env, sel)
                else:
                    pairs = run(env, sel)
                    env = dict(zip(names, pairs))
            return env, sel

        node_ids = (self.scan.node.id,) + tuple(
            op.node.id for op in self.transforms)
        jitted = cached_jit(("fused_scan", node_ids, sig), lambda: step)
        hit = (jitted, dict(dicts))
        self._step_cache[sig] = hit
        return hit

    def get_output(self) -> Optional[Batch]:
        from velox_tpu.vector.column import Column

        if not self.scan._splits:
            return None
        b = self.scan._splits.popleft().project(
            getattr(self.scan.node, 'all_columns', self.scan.node.columns))
        for df in self.scan.dynamic_filters:
            b = b.with_sel(df.filter_sel(b))
        jitted, out_dicts = self._compile(b)
        cols = eval_pairs(b)
        env, sel = jitted(cols, b.sel)
        out_schema = self.output_type
        out_cols = {}
        for n, t in zip(out_schema.names, out_schema.children):
            vals, valid = env[n]
            out_cols[n] = Column(t, vals, valid, out_dicts.get(n))
        self.stats.output_batches += 1
        out = Batch(out_cols, sel)
        if (self.scan._filter is not None or self.scan.dynamic_filters
                or any(isinstance(op, FilterOp) for op in self.transforms)):
            out = self._shape_output(out)
        elif b.num_rows is not None:
            out = Batch(out_cols, sel, b.num_rows)
        return out

    def is_finished(self) -> bool:
        return not self.scan._splits


class FusedScanAggOp(Operator):
    """Scan -> transforms -> aggregation as one jit per split."""

    blocking = True

    def __init__(self, chain: List[Operator]):
        self.scan: TableScanOp = chain[0]
        self.transforms = chain[1:-1]
        self.agg: HashAggregationOp = chain[-1]
        super().__init__(self.agg.node)
        self._step_cache: Dict[tuple, tuple] = {}
        self._done = False

    # ------------------------------------------------------------ compile
    def _compile(self, batch: Batch):
        """Build (pure step fn, input column names, agg mode) for this
        split's dictionary signature."""
        sig = tuple(sorted(
            (n, id(c.dictionary)) for n, c in batch.columns.items()
            if c.dictionary is not None))
        hit = self._step_cache.get(sig)
        if hit is not None:
            return hit

        # thread dictionary metadata through the transform chain (host)
        dicts: Dict[str, Optional[Dictionary]] = dict(eval_dicts(batch))
        ranges = {
            n: c.stats for n, c in batch.columns.items()
            if c.stats is not None}
        stages = []
        scan = self.scan
        if scan._filter is not None:
            _, run = scan._filter.pure(
                {n: d for n, d in dicts.items() if d is not None},
                "filter", ranges)
            stages.append(("filter", run, None))
        for op in self.transforms:
            live = {n: d for n, d in dicts.items() if d is not None}
            if isinstance(op, FilterOp):
                _, run = op._eval.pure(live, "filter", ranges)
                stages.append(("filter", run, None))
            else:
                expr_set, run = op._eval.pure(live, "project", ranges)
                names = list(op.node.names)
                stages.append(("project", run, names))
                dicts = {
                    n: d for n, d in zip(
                        names, expr_set.result_dictionaries)}

        agg = self.agg
        mode = agg.decide_mode_dicts({
            k: dicts.get(k) for k in agg.keys})
        for k in agg.keys:
            d = dicts.get(k)
            if d is not None:
                agg._key_dicts.setdefault(k, d)
        agg_fn = (agg.make_array_fn() if mode == "array"
                  else agg.make_generic_fn())

        def step(cols, sel, *agg_state):
            env = cols
            for kind, run, names in stages:
                if kind == "filter":
                    sel = run(env, sel)
                else:
                    pairs = run(env, sel)
                    env = dict(zip(names, pairs))
            if mode == "array":
                return agg_fn(env, sel, *agg_state)
            return agg_fn(env, sel)

        node_ids = (self.scan.node.id,) + tuple(
            op.node.id for op in self.transforms) + (agg.node.id,)
        jitted = cached_jit(("fused", node_ids, sig), lambda: step)
        hit = (jitted, mode)
        self._step_cache[sig] = hit
        return hit

    # ------------------------------------------------------------ execute
    def _pump(self) -> None:
        agg = self.agg
        while True:
            b = self.scan._splits.popleft() if self.scan._splits else None
            if b is None:
                break
            b = b.project(getattr(self.scan.node, 'all_columns',
                                   self.scan.node.columns))
            jitted, mode = self._compile(b)
            cols = eval_pairs(b)
            if mode == "array":
                st = agg.ensure_array_state()
                st["accs"], st["seen"] = jitted(
                    cols, b.sel, st["accs"], st["seen"])
            else:
                gkeys, lanes, gsel, dreps = jitted(cols, b.sel)
                agg.push_generic_entry(gkeys, lanes, gsel, dreps)
        agg.no_more_input()
        self._done = True

    def get_output(self) -> Optional[Batch]:
        if not self._done:
            self._pump()
        return self.agg.get_output()

    def is_finished(self) -> bool:
        return self._done and self.agg.is_finished()
