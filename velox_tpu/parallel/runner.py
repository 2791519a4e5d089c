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


def run_plan_distributed(plan, mesh=None, axis: str = "d"):
    """Execute a fused-aggregation plan SPMD over the mesh; returns an
    Arrow table. Falls back to serial Task execution for plan shapes the
    distributed runner doesn't cover yet."""
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
    if not (len(out_ops) == 1 and isinstance(out_ops[0], FusedScanAggOp)
            and len(pipelines) == 1):
        # joins / non-fusable shapes: serial fallback (round-1 scope)
        return pa.concat_tables([to_arrow(b) for b in Task(plan).run()])

    fused: FusedScanAggOp = out_ops[0]
    agg = fused.agg
    agg._mode = "generic"  # partial entries merge on finish
    scan = fused.scan

    # ---- stack the table splits into one (n_dev * shard_cap,) layout
    splits = [b.project(scan.node.columns) for b in scan._splits]
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
