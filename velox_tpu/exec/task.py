"""Task: plan -> pipelines -> serial driver loop.

Analog of velox/exec/Task.h:44 + LocalPlanner.cpp:374 + Driver.cpp:538 in
serial pull mode (Task::next, velox/exec/Task.cpp:994). The planner splits
the node tree into pipelines at join builds (velox/exec/LocalPlanner.cpp:108
mustStartNewPipeline); build pipelines run to completion first (their sink
publishes a JoinBridge), then the output pipeline streams. Parallel
multi-driver execution over device meshes lives in velox_tpu/parallel.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
from typing import Dict, Iterator, List, Optional, Tuple

from velox_tpu.vector.batch import Batch
from velox_tpu.exec.operator import Operator
from velox_tpu.exec.operators import (
    MergeJoinBuildOp, MergeJoinProbeOp, StreamingAggregationOp,
    AssignUniqueIdOp, CrossBuildOp, CrossProbeOp, EnforceSingleRowOp,
    FilterOp, HashAggregationOp, HashBuildOp, HashProbeOp, JoinBridge,
    LimitOp, OrderByOp, ProjectOp, TableScanOp, TopNOp, ValuesOp,
)
from velox_tpu.exec.window_ops import (
    ExpandOp, GroupIdOp, LocalMergeOp, LocalPartitionOp, MarkDistinctOp,
    RowNumberOp, TableWriteOp, TopNRowNumberOp, UnionAllOp, UnionBridge,
    UnionSinkOp, UnnestOp, WindowOp,
)
from velox_tpu.plan.nodes import (
    AggregationNode, AssignUniqueIdNode, CrossJoinNode,
    StreamingAggregationNode,
    EnforceSingleRowNode, ExpandNode, FilterNode, HashJoinNode, LimitNode,
    GroupIdNode, LocalPartitionNode, MarkDistinctNode, MergeJoinNode,
    OrderByNode, PlanNode, ProjectNode,
    LocalMergeNode, RowNumberNode, TableScanNode, TableWriteNode,
    TopNNode, TopNRowNumberNode, UnionAllNode, UnnestNode, ValuesNode,
    StreamingWindowNode,
    WindowNode,
)

#: extension point: node type -> factory(node, pipelines, chain) -> Operator
#: (velox/exec/Operator.h:452 translator registry analog)
_OPERATOR_REGISTRY: Dict[type, object] = {}

_SIMPLE_OPERATORS = {
    FilterNode: FilterOp,
    ProjectNode: ProjectOp,
    AggregationNode: HashAggregationOp,
    StreamingAggregationNode: StreamingAggregationOp,
    OrderByNode: OrderByOp,
    TopNNode: TopNOp,
    LimitNode: LimitOp,
    EnforceSingleRowNode: EnforceSingleRowOp,
    AssignUniqueIdNode: AssignUniqueIdOp,
    WindowNode: WindowOp,
    StreamingWindowNode: __import__('velox_tpu.exec.window_ops', fromlist=['StreamingWindowOp']).StreamingWindowOp,
    RowNumberNode: RowNumberOp,
    TopNRowNumberNode: TopNRowNumberOp,
    MarkDistinctNode: MarkDistinctOp,
    ExpandNode: ExpandOp,
    GroupIdNode: GroupIdOp,
    UnnestNode: UnnestOp,
    LocalPartitionNode: LocalPartitionOp,
    TableWriteNode: TableWriteOp,
}


def register_operator(node_type: type, factory) -> None:
    _OPERATOR_REGISTRY[node_type] = factory


def make_operator(node) -> Operator:
    """Construct the operator for a single-source plan node (used by
    trace replay, velox/tool/trace analog)."""
    cls = _SIMPLE_OPERATORS.get(type(node))
    if cls is None:
        raise NotImplementedError(
            f"replay unsupported for {type(node).__name__}")
    return cls(node)


class Pipeline:
    def __init__(self, operators: List[Operator], is_output: bool):
        self.operators = operators
        self.is_output = is_output


class LocalPlanner:
    """Split the plan tree into pipelines (velox/exec/LocalPlanner.cpp)."""

    def __init__(self, plan: PlanNode):
        from velox_tpu.exec.fused import maybe_fuse

        self.pipelines: List[Pipeline] = []
        chain = self._lower(plan)
        # fused-pipeline rewrite (DriverAdapter analog, exec/Driver.h:789)
        self.pipelines = [
            Pipeline(maybe_fuse(p.operators), p.is_output)
            for p in self.pipelines]
        self.pipelines.append(Pipeline(maybe_fuse(chain), is_output=True))

    def _lower(self, node: PlanNode) -> List[Operator]:
        if isinstance(node, ValuesNode):
            return [ValuesOp(node)]
        if isinstance(node, TableScanNode):
            return [TableScanOp(node)]
        if isinstance(node, (HashJoinNode, MergeJoinNode)):
            from velox_tpu.plan.nodes import JoinType as JT

            merge = isinstance(node, MergeJoinNode)
            bridge = JoinBridge(node)
            build_chain = self._lower(node.right)
            build_chain.append(
                (MergeJoinBuildOp if merge else HashBuildOp)(node, bridge))
            self.pipelines.append(Pipeline(build_chain, is_output=False))
            chain = self._lower(node.left)
            probe = (MergeJoinProbeOp if merge else HashProbeOp)(
                node, bridge)
            # dynamic filter pushdown: build-side key range to the probe
            # side's scan (velox/exec/HashProbe.cpp:419-444)
            if (isinstance(chain[0], TableScanOp)
                    and any(k in chain[0].node.columns
                            for k in node.left_keys)
                    and node.join_type in (
                        JT.INNER, JT.LEFT_SEMI, JT.RIGHT,
                        JT.RIGHT_SEMI)):
                probe._pushdown_scan = chain[0]
            chain.append(probe)
            return chain
        if isinstance(node, (UnionAllNode, LocalMergeNode)):
            bridge = UnionBridge()
            for src in node.inputs[1:]:
                sink_chain = self._lower(src)
                sink_chain.append(UnionSinkOp(node, bridge))
                self.pipelines.append(
                    Pipeline(sink_chain, is_output=False))
            chain = self._lower(node.inputs[0])
            chain.append(
                UnionAllOp(node, bridge)
                if isinstance(node, UnionAllNode)
                else LocalMergeOp(node, bridge))
            return chain
        if isinstance(node, CrossJoinNode):
            bridge = JoinBridge(node)
            build_chain = self._lower(node.right)
            build_chain.append(CrossBuildOp(node, bridge))
            self.pipelines.append(Pipeline(build_chain, is_output=False))
            chain = self._lower(node.left)
            chain.append(CrossProbeOp(node, bridge))
            return chain

        factory = _OPERATOR_REGISTRY.get(type(node))
        if factory is not None:
            chain = self._lower(node.sources[0]) if node.sources else []
            chain.append(factory(node))
            return chain

        cls = _SIMPLE_OPERATORS.get(type(node))
        if cls is None:
            raise NotImplementedError(
                f"no operator for {type(node).__name__}")
        chain = self._lower(node.sources[0])
        chain.append(cls(node))
        return chain


def _record_out(op: Operator, b: Optional[Batch]) -> None:
    if b is not None:
        op.stats.output_batches += 1
        if b.num_rows is not None:
            op.stats.output_rows += b.num_rows


def _sync(b):
    """Force one device value (profiling mode): on the axon backend only
    a value FETCH proves execution finished (block_until_ready returns
    early), so per-op walls are meaningless unless each operator's
    output is synced before the clock stops."""
    import numpy as _np

    _np.asarray(jnp.sum(b.sel.astype(jnp.int32)))
    return b


def _stream(ops: List[Operator], i: int,
            tracer=None) -> Iterator[Batch]:
    """Serial driver inner loop (velox/exec/Driver.cpp:615-720 analog)."""
    from velox_tpu.utils.config import config as _cfg

    sync = _cfg.profile_sync_per_op
    op = ops[i]
    if i == 0:
        while not op.is_finished():
            t0 = time.perf_counter()
            b = op.get_output()
            if b is not None and sync:
                _sync(b)
            op.stats.get_output_wall_s += time.perf_counter() - t0
            if b is None:
                break
            _record_out(op, b)
            yield b
        return
    upstream = _stream(ops, i - 1, tracer)
    for b in upstream:
        if not op.needs_input():
            break
        op.stats.input_batches += 1
        if b.num_rows is not None:
            op.stats.input_rows += b.num_rows
        if tracer is not None and tracer.wants(op.stats.plan_node_id):
            # operator input interception (velox/exec/Driver.cpp:600-611)
            tracer.record(op.stats.plan_node_id, b)
        t0 = time.perf_counter()
        op.add_input(b)
        op.stats.add_input_wall_s += time.perf_counter() - t0
        while True:
            t0 = time.perf_counter()
            out = op.get_output()
            if out is not None and sync:
                _sync(out)
            op.stats.get_output_wall_s += time.perf_counter() - t0
            if out is None:
                break
            _record_out(op, out)
            yield out
            if op.is_finished():
                upstream.close()
                return
    t0 = time.perf_counter()
    op.no_more_input()
    op.stats.finish_wall_s += time.perf_counter() - t0
    while not op.is_finished():
        t0 = time.perf_counter()
        out = op.get_output()
        op.stats.get_output_wall_s += time.perf_counter() - t0
        if out is None:
            break
        _record_out(op, out)
        yield out


class Task:
    """Owns one plan's execution (velox/exec/Task.h:44, serial mode)."""

    def __init__(self, plan: PlanNode, tracer=None):
        from velox_tpu.exec import memory as _mem
        from velox_tpu.utils.config import config

        if config.optimize_plans:
            from velox_tpu.plan.optimizer import optimize_plan

            plan = optimize_plan(plan)
        self.plan = plan
        # per-query memory pool: operators constructed under this scope
        # hang their buffers off it (exec/memory.py hierarchy —
        # velox Task::pool() under the query pool)
        self.pool = _mem.MemoryPool(
            f"query.{plan.id}", _mem.root_pool, kind="query")
        with _mem.scoped_pool(self.pool):
            self.planner = LocalPlanner(plan)
        self.tracer = tracer

    def run(self) -> Iterator[Batch]:
        from velox_tpu.exec import memory as _mem
        from velox_tpu.utils.metrics import METRIC_TASK_EXECUTIONS, reporter

        reporter.add_counter(METRIC_TASK_EXECUTIONS)
        # keep the query pool ambient for buffers created lazily
        # mid-run (e.g. the hash-probe spill buffer)
        _tok = _mem._current.set(self.pool)
        try:
            # run non-output (join build) pipelines to completion, in
            # creation order: a pipeline's bridges are always created
            # (and appended) while lowering its chain, before the
            # pipeline itself is appended, so creation order is a
            # topological order of the bridge DAG
            for p in self.planner.pipelines:
                if p.is_output:
                    continue
                for _ in _stream(p.operators, len(p.operators) - 1,
                                 self.tracer):
                    pass
                t0 = time.perf_counter()
                p.operators[-1].no_more_input()
                p.operators[-1].stats.finish_wall_s += (
                    time.perf_counter() - t0)
            out = next(
                p for p in self.planner.pipelines if p.is_output)
            yield from _stream(out.operators, len(out.operators) - 1,
                               self.tracer)
        finally:
            _mem._current.reset(_tok)
            for p in self.planner.pipelines:
                for op in p.operators:
                    op.close()
            self.pool.close()

    def stats(self):
        return [
            op.stats
            for p in self.planner.pipelines for op in p.operators
        ]

    def print_plan_with_stats(self) -> str:
        """Annotated plan tree (velox printPlanWithStats analog,
        docs/develop/debugging/print-plan-with-stats.rst)."""
        by_node: Dict[str, list] = {}
        for p in self.planner.pipelines:
            for op in p.operators:
                by_node.setdefault(op.stats.plan_node_id, []).append(
                    op.stats)

        lines: List[str] = []

        def walk(node, depth):
            pad = "  " * depth
            stats = by_node.get(node.id, [])
            ann = "".join(
                f"  [{s.operator_type}: in {s.input_rows} rows/"
                f"{s.input_batches} batches, out {s.output_rows} rows/"
                f"{s.output_batches} batches, "
                f"add {s.add_input_wall_s * 1e3:.1f}ms, "
                f"get {s.get_output_wall_s * 1e3:.1f}ms, "
                f"fin {s.finish_wall_s * 1e3:.1f}ms]"
                for s in stats)
            lines.append(f"{pad}- {node.name()}(id={node.id}){ann}")
            for src in node.sources:
                walk(src, depth + 1)

        walk(self.plan, 0)
        return "\n".join(lines)


def run_plan(plan) -> "pa.Table":
    """Execute and materialize as an Arrow table (result surface)."""
    import pyarrow as pa

    from velox_tpu.plan.builder import PlanBuilder
    from velox_tpu.vector.arrow_bridge import to_arrow, type_to_arrow

    if isinstance(plan, PlanBuilder):
        plan = plan.build()
    from velox_tpu.utils.replay import replay_run

    # Arrow conversion runs INSIDE the replay session: its
    # compact-count syncs (Batch.to_pydict) are control values too, so
    # repeat runs elide them — at ~0.2-1s per blocking round trip on
    # the tunneled backend those fetches, not device compute, dominate
    # small-result steady-state walls (TPC-H Q18 SF2 measurement)
    tables = replay_run(
        plan, lambda: [to_arrow(b) for b in Task(plan).run()])
    tables = [t for t in tables if t.num_rows >= 0]
    if not tables:
        schema = pa.schema([
            (n, type_to_arrow(t))
            for n, t in zip(plan.output_type.names,
                            plan.output_type.children)])
        return pa.table(
            {n: pa.array([], type=f.type) for n, f in zip(
                schema.names, schema)}, schema=schema)
    return pa.concat_tables(tables)


def run_plan_pydict(plan) -> Dict[str, list]:
    return run_plan(plan).to_pydict()


def run_plan_grouped(plan, num_groups: int,
                     tracer=None):
    """Grouped execution: process the output pipeline's leaf splits in
    ``num_groups`` sequential split groups with a task barrier between
    groups (velox/core/PlanFragment.h groupedExecutionLeafNodeIds +
    exec/Task.h:215 barriers). Blocking-operator state lives and dies
    within ONE group, so peak memory is a single group's working set and
    results stream out as each group finishes — the reference's bounded-
    parallelism / streaming-checkpoint mechanism.

    CORRECTNESS CONTRACT (same as the reference): stateful operators
    must be group-local — the table's splits must be bucketed so that no
    group-by/join key spans two split groups (velox validates this via
    hive bucket properties; here the caller asserts it). Stateless plans
    (scan/filter/project) are always safe.

    Yields one Arrow table per group (the barrier stream).
    """
    import pyarrow as pa

    from velox_tpu.exec.operators import TableScanOp
    from velox_tpu.plan.builder import PlanBuilder as _PB
    from velox_tpu.utils.metrics import reporter
    from velox_tpu.vector.arrow_bridge import to_arrow

    if isinstance(plan, _PB):
        plan = plan.build()
    # discover the grouped leaf's split count once
    def leaf_scan(pipelines):
        out_pipe = next(p for p in pipelines if p.is_output)
        for op in out_pipe.operators:
            if isinstance(op, TableScanOp):
                return op
            inner = getattr(op, "scan", None)  # fused scan chains
            if isinstance(inner, TableScanOp):
                return inner
        return None

    probe_task = Task(plan, tracer)
    scan0 = leaf_scan(probe_task.planner.pipelines)
    if scan0 is None:
        raise ValueError("grouped execution needs a leaf TableScan in "
                         "the output pipeline")
    all_splits = list(scan0._splits)
    for op in (o for p in probe_task.planner.pipelines
               for o in p.operators):
        op.close()

    for g in range(num_groups):
        group = all_splits[g::num_groups]
        if not group:
            continue
        task = Task(plan, tracer)
        scan = leaf_scan(task.planner.pipelines)
        scan._splits.clear()
        scan._splits.extend(group)
        outs = [to_arrow(b) for b in task.run()]
        reporter.add_counter("velox_tpu.task_barriers")
        if outs:
            yield pa.concat_tables(outs)


def profile_plan(plan) -> str:
    """Execute with per-operator value syncs and return the annotated
    plan tree with TRUE per-op walls (velox printPlanWithStats +
    the process profiler role; async dispatch otherwise mis-attributes
    device time — see config.profile_sync_per_op)."""
    from velox_tpu.plan.builder import PlanBuilder as _PB
    from velox_tpu.utils.config import config

    if isinstance(plan, _PB):
        plan = plan.build()
    old = config.profile_sync_per_op
    config.profile_sync_per_op = True
    try:
        task = Task(plan)
        for _ in task.run():
            pass
        return task.print_plan_with_stats()
    finally:
        config.profile_sync_per_op = old
