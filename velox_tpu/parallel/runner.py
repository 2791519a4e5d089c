"""Distributed plan execution over a device mesh.

The Task-level SPMD runner: the fused scan->transform->aggregate pipeline
(velox_tpu/exec/fused.py) runs under ``shard_map`` with table splits
sharded across the mesh's data axis — every device is one velox "driver"
(velox/exec/Task.h:207 maxDrivers ≙ mesh size). Per-device partial
aggregates come back as ordinary partial entries and the single-node
aggregation machinery finalizes them, so distributed and local paths
share every kernel.

High-cardinality finals can instead hash-shuffle partials across the mesh
(velox_tpu/parallel/aggregate.py) — the PartitionedOutput/Exchange
replacement (SURVEY.md D.5).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from velox_tpu.vector.batch import Batch, concat_batches, round_capacity
from velox_tpu.vector.column import Column
from velox_tpu.exec.fused import FusedScanAggOp
from velox_tpu.exec.jitcache import cached_jit
from velox_tpu.exec.task import LocalPlanner, Task
from velox_tpu.parallel.mesh import make_mesh
from velox_tpu.plan.nodes import AggStep


#: how the LAST run_plan_distributed call executed — introspection for
#: the all-22 rehearsal / coverage reporting (tools/distributed_rehearsal)
last_strategy: str = ""


def run_plan_distributed(plan, mesh=None, axis: str = "d"):
    """Execute a fused-aggregation plan SPMD over the mesh; returns an
    Arrow table. Falls back to serial Task execution for plan shapes the
    distributed runner doesn't cover yet."""
    global last_strategy

    import pyarrow as pa

    from velox_tpu.plan.builder import PlanBuilder
    from velox_tpu.vector.arrow_bridge import to_arrow

    if isinstance(plan, PlanBuilder):
        plan = plan.build()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    planner = LocalPlanner(plan)
    from velox_tpu.exec.fused import maybe_fuse

    pipelines = [
        (maybe_fuse(p.operators), p.is_output) for p in planner.pipelines]
    out_ops, _ = next(p for p in pipelines if p[1])

    joined = _try_broadcast_semi_join(
        pipelines, out_ops, mesh, n_dev, axis)
    if joined is not None:
        last_strategy = "broadcast_semi_join"
        return joined
    from velox_tpu.parallel.pipeline import try_distributed_pipeline

    res = try_distributed_pipeline(pipelines, out_ops, mesh, n_dev, axis)
    if res is not None:
        last_strategy = "distributed_pipeline"
        return res
    if not (len(out_ops) == 1 and isinstance(out_ops[0], FusedScanAggOp)
            and len(pipelines) == 1):
        # expansion joins / non-fusable shapes: serial fallback
        # (task.run_plan handles schema-typed EMPTY results)
        last_strategy = "serial_fallback"
        from velox_tpu.exec.task import run_plan as _serial_run

        return _serial_run(plan)

    fused: FusedScanAggOp = out_ops[0]
    agg = fused.agg
    agg._mode = "generic"  # partial entries merge on finish
    scan = fused.scan

    # ---- stack the table splits into one (n_dev * shard_cap,) layout
    splits = [b.project(getattr(scan.node, 'all_columns',
                                 scan.node.columns))
              for b in scan._splits]
    scan._splits.clear()
    big = concat_batches(splits) if len(splits) > 1 else splits[0]
    total = big.capacity
    shard_cap = max(-(-total // n_dev), 128)
    big = _pad_batch(big, shard_cap * n_dev)

    jitted, mode = fused._compile(big)
    cols = {n: (c.values, c.valid) for n, c in big.columns.items()}
    in_spec = jax.tree_util.tree_map(lambda _: P(axis), cols)

    def step(cols, sel):
        return jitted(cols, sel)

    out_specs = jax.tree_util.tree_map(lambda _: P(axis), jax.eval_shape(
        lambda c, s: jitted(c, s), cols, big.sel))
    key = ("dist_fused", fused.node.id, n_dev, axis,
           tuple(d.id for d in mesh.devices.flatten()))
    f = cached_jit(key, lambda: shard_map(
        step, mesh=mesh, in_specs=(in_spec, P(axis)),
        out_specs=out_specs, check_vma=False))
    gkeys, lanes, gsel, dreps = f(cols, big.sel)

    # per-device partial groups -> ordinary aggregation entries
    per_dev = gsel.shape[0] // n_dev
    for d in range(n_dev):
        sl = slice(d * per_dev, (d + 1) * per_dev)
        agg.push_generic_entry(
            [(v[sl], None if va is None else va[sl])
             for (v, va) in gkeys],
            [None if l is None else tuple(a[sl] for a in l)
             for l in lanes],
            gsel[sl],
            [None if r is None else {
                "keys": [(v[sl], None if va is None else va[sl])
                         for (v, va) in r["keys"]],
                "arg": r["arg"][sl], "sel": r["sel"][sl]}
             for r in dreps],
        )
    agg.no_more_input()
    last_strategy = "fused_scan_agg"
    out = []
    while True:
        b = agg.get_output()
        if b is None:
            break
        out.append(to_arrow(b))
    return pa.concat_tables(out)


def _pad_batch(b: Batch, capacity: int) -> Batch:
    if b.capacity == capacity:
        return b
    assert capacity > b.capacity
    pad = capacity - b.capacity
    cols = {}
    for n, c in b.columns.items():
        vals = jnp.concatenate(
            [c.values, jnp.zeros((pad,), c.values.dtype)])
        valid = (None if c.valid is None else jnp.concatenate(
            [c.valid, jnp.zeros((pad,), jnp.bool_)]))
        cols[n] = Column(c.dtype, vals, valid, c.dictionary, c.stats)
    sel = jnp.concatenate([b.sel, jnp.zeros((pad,), jnp.bool_)])
    return Batch(cols, sel, b.num_rows)


def _try_broadcast_semi_join(pipelines, out_ops, mesh, n_dev, axis):
    """Broadcast join over the mesh: the (small) build side is built
    serially and REPLICATED to every device; the probe side shards across
    the data axis and each device evaluates the probe program locally —
    no shuffle at all (the replicated-build-side form of SURVEY.md's
    "broadcast joins via pmap-style replication").

    Round-1 scope: semi-like joins (LEFT_SEMI / ANTI / ANTI_SIMPLE
    without join filters), whose probe output is a static-shape selection
    mask — match expansion joins need dynamic output sizing and stay
    serial. Downstream operators run serially on the gathered result.
    """
    import pyarrow as pa

    from velox_tpu.exec.operators import (
        HashProbeOp, JoinKeyCodec, TableScanOp,
    )
    from velox_tpu.exec.task import _stream
    from velox_tpu.plan.nodes import JoinType as JT
    from velox_tpu.vector.arrow_bridge import to_arrow

    if len(pipelines) != 2:
        return None
    if not (len(out_ops) >= 2 and isinstance(out_ops[0], TableScanOp)
            and isinstance(out_ops[1], HashProbeOp)):
        return None
    probe: HashProbeOp = out_ops[1]
    if probe.jt not in (JT.LEFT_SEMI, JT.ANTI, JT.ANTI_SIMPLE):
        return None
    if probe._filter_exprs is not None:
        return None

    # 1. build side: serial (it is the small side by plan construction)
    build_ops, _ = next(p for p in pipelines if not p[1])
    list(_stream(build_ops, len(build_ops) - 1))
    br = probe.bridge
    assert br.ready

    # 2. shard the probe scan across the mesh
    scan: TableScanOp = out_ops[0]
    splits = [b.project(getattr(scan.node, 'all_columns',
                                 scan.node.columns))
              for b in scan._splits]
    scan._splits.clear()
    big = concat_batches(splits) if len(splits) > 1 else splits[0]
    shard_cap = max(-(-big.capacity // n_dev), 128)
    big = _pad_batch(big, shard_cap * n_dev)
    if scan._filter is not None:
        big = big.with_sel(scan._filter.filter_sel(big))

    pf = probe._probe_fn(big)        # cached pure probe program
    cols = [(big.column(k).values, big.column(k).valid)
            for k in probe.node.left_keys]
    in_spec = jax.tree_util.tree_map(lambda _: P(axis), cols)

    def step(cols, sel, sorted_keys, n_active, tables):
        return pf(cols, sel, sorted_keys, n_active, tables)

    tab_spec = jax.tree_util.tree_map(lambda _: P(), br.tables)
    key = ("dist_bsemi", probe.node.id, n_dev, axis,
           len(br.tables),
           tuple(d.id for d in mesh.devices.flatten()))
    f = cached_jit(key, lambda: shard_map(
        step, mesh=mesh,
        in_specs=(in_spec, P(axis), P(), P(), tab_spec),
        out_specs=P(axis), check_vma=False))
    out_sel = f(cols, big.sel, br.sorted_keys, br.n_active, br.tables)

    # 3. downstream operators run serially on the gathered result
    result = big.with_sel(out_sel).project(
        list(probe.node.output_type.names))
    rest = out_ops[2:]
    batches = [result]
    for op in rest:
        outs = []
        for b in batches:
            op.add_input(b)
        op.no_more_input()
        while True:
            b = op.get_output()
            if b is None and op.is_finished():
                break
            if b is not None:
                outs.append(b)
        batches = outs
    return pa.concat_tables([to_arrow(b) for b in batches]) \
        if batches else None
