"""Distributed probe pipelines: scan -> hash joins -> transforms -> agg
over the device mesh.

The general-plan SPMD runner (VERDICT r1 item 3): build sides are built
serially and REPLICATED to every device (broadcast join — small side by
plan construction, velox/exec/HashJoinBridge.h handoff), the probe scan
shards across the mesh's data axis, and each device runs the probe ->
transform -> partial-aggregation chain locally. Expansion joins (INNER)
need a data-dependent output capacity: phase A computes per-device match
totals under shard_map, ONE host sync picks the shared static capacity,
phase B expands — the SPMD form of HashProbe's listJoinResults output
sizing (velox/exec/HashProbe.cpp:796).

Chains handled: TableScan [-> semi/anti probe | inner probe | filter |
project]* [-> single-step hash aggregation]; remaining operators run
serially on the gathered result. Right/full joins (global matched-flag
merge) stay serial.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from velox_tpu.exec.jitcache import cached_jit
from velox_tpu.plan.nodes import AggStep, JoinType as JT
from velox_tpu.vector.batch import Batch, concat_batches
from velox_tpu.vector.column import Column


def _dummy_batch(meta: Dict[str, tuple], cap: int = 128) -> Batch:
    """Materialize column metadata (dtype/dictionary/stats) as a tiny
    batch — lets operator program factories (probe/expand/transform
    ``pure`` builders) resolve their dictionary signatures without the
    real (sharded) data."""
    cols = {}
    for n, (t, d, st) in meta.items():
        cols[n] = Column(t, jnp.zeros((cap,), dtype=t.dtype), None, d, st)
    return Batch(cols, jnp.zeros((cap,), jnp.bool_))


def try_distributed_pipeline(pipelines, out_ops, mesh, n_dev, axis):
    """Returns an Arrow table, or None if the plan shape isn't covered."""
    import pyarrow as pa

    from velox_tpu.exec.operators import (
        FilterOp, HashAggregationOp, HashProbeOp, ProjectOp,
        StreamingAggregationOp, TableScanOp,
    )
    from velox_tpu.exec.task import _stream
    from velox_tpu.vector.arrow_bridge import to_arrow

    ops = out_ops
    if not ops or not isinstance(ops[0], TableScanOp):
        return None
    scan: TableScanOp = ops[0]

    chain: List[tuple] = []
    k = 1
    agg: Optional[HashAggregationOp] = None
    n_probes = 0
    while k < len(ops):
        op = ops[k]
        if isinstance(op, HashProbeOp):
            if op._semi_like and op._filter_exprs is None:
                chain.append(("semi", op))
            elif op.jt == JT.INNER:
                chain.append(("inner", op))
            else:
                return None
            n_probes += 1
        elif isinstance(op, (FilterOp, ProjectOp)):
            chain.append(("transform", op))
        elif (isinstance(op, HashAggregationOp)
              and not isinstance(op, StreamingAggregationOp)
              and op.step == AggStep.SINGLE and not op.has_distinct
              and not op._collect
              and all(l.width == 1 for f in op.fns for l in f.lanes)):
            agg = op
            k += 1
            break
        else:
            break
        k += 1
    rest = ops[k:]
    if n_probes == 0:
        return None

    # ---- build sides: serial, results replicated via P() in_specs
    for p_ops, is_out in pipelines:
        if is_out:
            continue
        for _ in _stream(p_ops, len(p_ops) - 1):
            pass
        p_ops[-1].no_more_input()
    for kind, op in chain:
        if kind != "transform" and not op.bridge.ready:
            return None  # nested bridge shapes not covered

    # ---- shard the scan across the mesh
    splits = [b.project(getattr(scan.node, 'all_columns',
                                 scan.node.columns))
              for b in scan._splits]
    if not splits:
        return None
    scan._splits.clear()
    big = concat_batches(splits) if len(splits) > 1 else splits[0]
    shard_cap = max(-(-big.capacity // n_dev), 128)
    big = _pad_to(big, shard_cap * n_dev)

    env = {n: (c.values, c.valid) for n, c in big.columns.items()}
    meta = {n: (c.dtype, c.dictionary, c.stats)
            for n, c in big.columns.items()}
    sel = big.sel

    # scan subfilter becomes the first pure stage
    stages: List[tuple] = []  # ("filter"|"project"|"semi", fn, extra)
    if scan._filter is not None:
        _, run = scan._filter.pure(
            {n: d for n, (t, d, s) in meta.items() if d is not None},
            "filter", {n: s for n, (t, d, s) in meta.items()
                       if s is not None})
        stages.append(("filter", run, None))

    seg = 0
    extra_args: List[tuple] = []
    extra_specs: List[tuple] = []

    for kind, op in chain:
        if kind == "transform":
            live = {n: d for n, (t, d, s) in meta.items() if d is not None}
            ranges = {n: s for n, (t, d, s) in meta.items()
                      if s is not None}
            if isinstance(op, FilterOp):
                _, run = op._eval.pure(live, "filter", ranges)
                stages.append(("filter", run, None))
            else:
                expr_set, run = op._eval.pure(live, "project", ranges)
                names = list(op.node.names)
                stages.append(("project", run, names))
                meta = {
                    n: (t, d, None) for n, t, d in zip(
                        names, op.node.output_type.children,
                        expr_set.result_dictionaries)}
            continue

        probe: HashProbeOp = op
        br = probe.bridge
        dummy = _dummy_batch(meta)
        pf = probe._probe_fn(dummy)
        tabs = br.tables
        if kind == "semi":
            xi = len(extra_args)
            extra_args.append((br.sorted_keys, br.n_active, tabs))
            extra_specs.append(
                (P(), P(), jax.tree_util.tree_map(lambda _: P(), tabs)))
            stages.append(
                ("semi", pf, (list(probe.node.left_keys), xi)))
            meta = {n: meta[n]
                    for n in probe.node.output_type.names}
            # env projection happens at next flush via stage ordering:
            # semi probes only narrow sel; drop columns lazily
            continue

        # ---- inner expansion probe: flush segment + counts, host sync,
        # expand under a fresh shard_map at the synced capacity
        seg_stages = list(stages)

        def seg_and_count(env, sel, extras, probe_extra):
            env, sel = _apply_stages(seg_stages, env, sel, extras)
            skeys, nact, tables = probe_extra
            cols = [env[kn] for kn in probe.node.left_keys]
            first, count, pvalid, total = pf(
                cols, sel, skeys, nact, tables)
            return env, sel, first, count, pvalid, total[None]

        in_env_spec = jax.tree_util.tree_map(lambda _: P(axis), env)
        pe = (br.sorted_keys, br.n_active, tabs)
        pe_spec = (P(), P(), jax.tree_util.tree_map(lambda _: P(), tabs))
        key = ("dpipe_count", probe.node.id, seg, n_dev, axis,
               tuple(sorted(env)),
               tuple(d.id for d in mesh.devices.flatten()))
        f = cached_jit(key, lambda: shard_map(
            seg_and_count, mesh=mesh,
            in_specs=(in_env_spec, P(axis), tuple(extra_specs), pe_spec),
            out_specs=(in_env_spec, P(axis), P(axis), P(axis), P(axis),
                       P(axis)), check_vma=False))
        env, sel, first, count, pvalid, totals = f(
            env, sel, tuple(extra_args), pe)
        stages, extra_args, extra_specs = [], [], []
        seg += 1

        from velox_tpu.vector.batch import round_capacity

        out_cap = round_capacity(max(1, int(jnp.max(totals))))
        ef = probe._expand_fn(_dummy_batch(_merge_meta(
            meta, br.build_batch)), out_cap)
        lt = list(probe.node.left.output_type.names)
        rt = list(probe.node.right.output_type.names)
        bcols = {n: (br.build_batch.column(n).values,
                     br.build_batch.column(n).valid) for n in rt}
        flags = jnp.zeros((br.build_batch.capacity,), jnp.bool_)

        def expand_step(env, sel, first, count, bcols, flags, perm):
            pcols = {n: env[n] for n in lt}
            out, out_sel, _fl, _pc, _rz = ef(
                pcols, bcols, first, count, sel, flags, perm)
            keep = {n: out[n] for n in probe.node.output_type.names}
            return keep, out_sel

        in_env_spec = jax.tree_util.tree_map(lambda _: P(axis), env)
        b_spec = jax.tree_util.tree_map(lambda _: P(), bcols)
        key = ("dpipe_expand", probe.node.id, out_cap, n_dev, axis,
               tuple(sorted(env)),
               tuple(d.id for d in mesh.devices.flatten()))
        # per-device shapes for out_specs: run the step on one shard
        def _shard1(x):
            return jax.eval_shape(lambda a: a[:a.shape[0] // n_dev], x)
        out_shapes = jax.eval_shape(
            expand_step,
            jax.tree_util.tree_map(_shard1, env),
            jax.eval_shape(lambda a: a[:a.shape[0] // n_dev], sel),
            jax.eval_shape(lambda a: a[:a.shape[0] // n_dev], first),
            jax.eval_shape(lambda a: a[:a.shape[0] // n_dev], count),
            bcols, flags, br.perm)
        out_specs2 = jax.tree_util.tree_map(lambda _: P(axis), out_shapes)
        f2 = cached_jit(key, lambda: shard_map(
            expand_step, mesh=mesh,
            in_specs=(in_env_spec, P(axis), P(axis), P(axis), b_spec,
                      P(), P()),
            out_specs=out_specs2, check_vma=False))
        env, sel = f2(env, sel, first, count, bcols, flags, br.perm)
        meta = _merge_meta(
            {n: meta[n] for n in lt if n in meta}, br.build_batch,
            names=probe.node.output_type.names)

    # project env down to the last node's output before finishing
    return _finish(env, sel, meta, stages, extra_args, extra_specs, agg,
                   rest, mesh, n_dev, axis, scan, seg)


def _apply_stages(stages, env, sel, extras):
    for kind, run, names in stages:
        if kind == "filter":
            sel = run(env, sel)
        elif kind == "project":
            pairs = run(env, sel)
            env = dict(zip(names, pairs))
        else:
            pf, (keys, xi) = run, names
            skeys, nact, tables = extras[xi]
            cols = [env[kn] for kn in keys]
            sel = pf(cols, sel, skeys, nact, tables)
    return env, sel


def _merge_meta(meta, build_batch, names=None):
    out = dict(meta)
    for n, c in build_batch.columns.items():
        out[n] = (c.dtype, c.dictionary, None)
    if names is not None:
        out = {n: out[n] for n in names if n in out}
    return out


def _pad_to(b: Batch, capacity: int) -> Batch:
    if b.capacity == capacity:
        return b
    pad = capacity - b.capacity
    cols = {}
    for n, c in b.columns.items():
        vals = jnp.concatenate(
            [c.values, jnp.zeros((pad,), c.values.dtype)])
        valid = (None if c.valid is None else jnp.concatenate(
            [c.valid, jnp.zeros((pad,), jnp.bool_)]))
        cols[n] = Column(c.dtype, vals, valid, c.dictionary, c.stats)
    sel = jnp.concatenate([b.sel, jnp.zeros((pad,), jnp.bool_)])
    return Batch(cols, sel)


def _finish(env, sel, meta, stages, extra_args, extra_specs, agg, rest,
            mesh, n_dev, axis, scan, seg):
    """Final segment: transforms (+ partial agg) per device, then serial
    finalization + downstream operators."""
    import pyarrow as pa

    from velox_tpu.vector.arrow_bridge import to_arrow

    if agg is not None:
        agg._mode = "generic"
        for kk in agg.keys:
            t, d, s = meta.get(kk, (None, None, None))
            if d is not None:
                agg._key_dicts.setdefault(kk, d)
        agg_fn = agg.make_generic_fn()
        local = list(stages)

        def step(env, sel, extras):
            env, sel = _apply_stages(local, env, sel, extras)
            cols = {n: env[n] for n in agg._needed}
            return agg_fn(cols, sel)

        in_env_spec = jax.tree_util.tree_map(lambda _: P(axis), env)
        key = ("dpipe_agg", agg.node.id, seg, n_dev, axis,
               tuple(sorted(env)),
               tuple(d.id for d in mesh.devices.flatten()))
        out_specs = jax.tree_util.tree_map(lambda _: P(axis), jax.eval_shape(
            lambda e, s, x: step(e, s, x), env, sel, tuple(extra_args)))
        f = cached_jit(key, lambda: shard_map(
            step, mesh=mesh,
            in_specs=(in_env_spec, P(axis), tuple(extra_specs)),
            out_specs=out_specs, check_vma=False))
        gkeys, lanes, gsel, dreps = f(env, sel, tuple(extra_args))

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
                 for r in dreps])
        agg.no_more_input()
        batches = []
        while True:
            b = agg.get_output()
            if b is None:
                break
            batches.append(b)
    else:
        if stages:
            env, sel = _flush_plain(
                env, sel, stages, extra_args, extra_specs, mesh, n_dev,
                axis, scan, seg)
        cols = {}
        for n, (v, va) in env.items():
            t, d, s = meta.get(n, (None, None, None))
            if t is None:
                continue
            cols[n] = Column(t, v, va, d, s)
        batches = [Batch(cols, sel)]

    # downstream operators (TopN/OrderBy/Limit/Project...) run serially
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
    return (pa.concat_tables([to_arrow(b) for b in batches])
            if batches else None)


def _flush_plain(env, sel, stages, extra_args, extra_specs, mesh, n_dev,
                 axis, scan, seg):
    local = list(stages)

    def step(env, sel, extras):
        return _apply_stages(local, env, sel, extras)

    in_env_spec = jax.tree_util.tree_map(lambda _: P(axis), env)
    key = ("dpipe_tail", scan.node.id, seg, n_dev, axis,
           tuple(sorted(env)),
           tuple(d.id for d in mesh.devices.flatten()))
    out_env_spec = jax.tree_util.tree_map(lambda _: P(axis), jax.eval_shape(
        lambda e, s, x: step(e, s, x), env, sel, tuple(extra_args)))
    f = cached_jit(key, lambda: shard_map(
        step, mesh=mesh,
        in_specs=(in_env_spec, P(axis), tuple(extra_specs)),
        out_specs=out_env_spec, check_vma=False))
    return f(env, sel, tuple(extra_args))
