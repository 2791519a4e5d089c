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
import numpy as np
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
            elif op.jt in (JT.INNER, JT.LEFT):
                if op.jt == JT.LEFT and op._filter_exprs is not None:
                    return None  # filter resurrect rows stay serial
                chain.append(("inner", op))
            elif op.jt in (JT.RIGHT, JT.FULL):
                # matched part expands per device; unmatched build rows
                # emit once from the globally OR-reduced flags, so the
                # right/full probe must END the sharded chain
                if op._filter_exprs is not None:
                    return None
                chain.append(("inner", op))
                n_probes += 1
                k += 1
                break
            else:
                return None
            n_probes += 1
        elif isinstance(op, (FilterOp, ProjectOp)):
            chain.append(("transform", op))
        elif (isinstance(op, HashAggregationOp)
              and not isinstance(op, StreamingAggregationOp)
              and op.step in (AggStep.SINGLE, AggStep.PARTIAL)
              and not op.has_distinct
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
    tails: List[Batch] = []  # right/full unmatched-build emissions

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
        track_tail = probe.jt in (JT.RIGHT, JT.FULL)

        def expand_step(env, sel, first, count, bcols, flags, perm):
            pcols = {n: env[n] for n in lt}
            out, out_sel, fl, _pc, _rz = ef(
                pcols, bcols, first, count, sel, flags, perm)
            keep = {n: out[n] for n in probe.node.output_type.names}
            if track_tail:
                return keep, out_sel, fl
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
        if track_tail:
            env, sel, fl_all = f2(
                env, sel, first, count, bcols, flags, br.perm)
            # global matched flags: OR across device shards (the SPMD
            # analog of HashProbe's shared-bridge matched bits,
            # velox/exec/HashProbe.cpp right-join tracking)
            br.matched = jnp.any(
                fl_all.reshape(n_dev, -1), axis=0)
            tail = probe._emit_build_side()
            if tail is not None:
                tails.append(tail)
        else:
            env, sel = f2(env, sel, first, count, bcols, flags, br.perm)
        meta = _merge_meta(
            {n: meta[n] for n in lt if n in meta}, br.build_batch,
            names=probe.node.output_type.names)

    # distributed window: hash-shuffle by PARTITION BY so every
    # partition is device-local, then the serial window kernel runs
    # unchanged per shard (velox's hash-exchange-under-Window analog)
    win = _detect_window(rest, agg, tails)
    if win is not None:
        if stages:
            env, sel = _flush_plain(
                env, sel, stages, extra_args, extra_specs, mesh, n_dev,
                axis, scan, seg)
            stages, extra_args, extra_specs = [], [], []
            seg += 1
        wout = _window_flush(env, sel, win, mesh, n_dev, axis, seg)
        if wout is not None:
            env, sel = wout
            seg += 1
            for spec in win.node.functions:
                meta[spec.name] = (
                    win.output_type.find_child(spec.name), None, None)
            rest = rest[1:]

    # distributed sort reductions: a trailing TopN (or OrderBy+Limit)
    # prunes per device before the gather; a plain OrderBy range-
    # partitions + per-device-sorts so the gathered stream is globally
    # sorted (velox/exec/Merge.h:378 MergeExchange analog)
    rest = _attach_sort_reduction(
        rest, stages, agg, env, meta, n_dev, axis)
    ob = _detect_plain_orderby(rest, agg)
    if ob is not None and not tails and ob.node.keys[0].name in env:
        if stages:
            env, sel = _flush_plain(
                env, sel, stages, extra_args, extra_specs, mesh, n_dev,
                axis, scan, seg)
            stages, extra_args, extra_specs = [], [], []
            seg += 1
        sorted_out = _ranged_sort_flush(
            env, sel, ob.node, mesh, n_dev, axis, seg)
        if sorted_out is not None:
            env, sel = sorted_out
            seg += 1
            rest = rest[1:]  # stream is globally sorted

    # project env down to the last node's output before finishing
    return _finish(env, sel, meta, stages, extra_args, extra_specs, agg,
                   rest, mesh, n_dev, axis, scan, seg, tails)


def _apply_stages(stages, env, sel, extras):
    for kind, run, names in stages:
        if kind == "filter":
            sel = run(env, sel)
        elif kind == "project":
            pairs = run(env, sel)
            env = dict(zip(names, pairs))
        elif kind == "reduce":
            # per-device capacity-changing reduction (top-n prune /
            # range-partition sort); always the final stage
            env, sel = run(env, sel)
        else:
            pf, (keys, xi) = run, names
            skeys, nact, tables = extras[xi]
            cols = [env[kn] for kn in keys]
            sel = pf(cols, sel, skeys, nact, tables)
    return env, sel


def _attach_sort_reduction(rest, stages, agg, env, meta, n_dev, axis):
    """Append a per-device sort reduction stage for a trailing
    TopN / OrderBy(+Limit) / plain OrderBy; returns the (possibly
    shortened) serial ``rest``."""
    from velox_tpu.exec.operators import LimitOp, OrderByOp, TopNOp
    from velox_tpu.ops.sort import sort_indices, top_n_indices

    if agg is not None or not rest:
        return rest

    def keyspec(node):
        return [(kk.name, kk.descending, kk.nulls_first)
                for kk in node.keys]

    def gather_env(env, idx):
        return {nm: (jnp.take(v, idx, mode="clip"),
                     None if va is None
                     else jnp.take(va, idx, mode="clip"))
                for nm, (v, va) in env.items()}

    op0 = rest[0]
    if isinstance(op0, TopNOp) or (
            isinstance(op0, OrderByOp) and len(rest) > 1
            and isinstance(rest[1], LimitOp)):
        # per-device top-K prune: rows outside a device's top K cannot
        # be in the global top K (velox/exec/TopN.h bounded carry)
        if isinstance(op0, TopNOp):
            count = op0.node.count
        else:
            count = rest[1].node.count + rest[1].node.offset
        spec = keyspec(op0.node)
        if any(nm not in env for nm, _, _ in spec):
            return rest

        def prune(env, sel):
            keys = [(env[nm][0], env[nm][1], d, nf)
                    for nm, d, nf in spec]
            idx, osel = top_n_indices(keys, sel, count)
            return gather_env(env, idx), osel

        stages.append(("reduce", prune, None))
        return rest  # the serial op finalizes over n_dev*K candidates

    return rest


def _detect_window(rest, agg, tails):
    """rest[0] as a distributable WindowOp, or None. Requires hash
    partition keys (a global window without PARTITION BY has no
    parallelism to exploit) and every needed column in the stream."""
    from velox_tpu.exec.window_ops import WindowOp

    if agg is not None or tails or not rest:
        return None
    op0 = rest[0]
    if type(op0) is not WindowOp:
        return None
    if not op0.node.partition_keys:
        return None
    return op0


def _window_flush(env, sel, win_op, mesh, n_dev, axis, seg):
    """Distributed Window: all_to_all rows by hash(partition keys),
    then the op's own pure kernel per device (make_run_fn). Output
    stays sharded; function result columns join the env."""
    from velox_tpu.ops.hash import hash_columns
    from velox_tpu.parallel.shuffle import bucket_by_destination

    node = win_op.node
    needed = win_op.needed_columns()
    if any(nm not in env for nm in needed):
        return None
    run_fn = win_op.make_run_fn()
    names = sorted(env)
    valid_tag = [env[nm][1] is not None for nm in names]

    def step(env, sel):
        h = hash_columns([env[k] for k in node.partition_keys])
        dest = (h % jnp.uint64(n_dev)).astype(jnp.int32)
        arrays = []
        for nm, hv in zip(names, valid_tag):
            vv, vva = env[nm]
            arrays.append(vv)
            if hv:
                arrays.append(vva)
        bufs, bvalid, _ovf = bucket_by_destination(
            arrays, dest, sel, n_dev, sel.shape[0])
        out_arrays = [
            jax.lax.all_to_all(
                buf, axis, split_axis=0, concat_axis=0,
                tiled=False).reshape(-1)
            for buf in bufs]
        rsel = jax.lax.all_to_all(
            bvalid, axis, split_axis=0, concat_axis=0,
            tiled=False).reshape(-1)
        env2 = {}
        i = 0
        for nm, hv in zip(names, valid_tag):
            vv = out_arrays[i]
            i += 1
            vva = None
            if hv:
                vva = out_arrays[i]
                i += 1
            env2[nm] = (vv, vva)
        cols = {n: env2[n] for n in needed}
        results = run_fn(cols, rsel)
        for spec, (vals, valid) in zip(node.functions, results):
            # concrete validity lane: out_specs are declared up front
            env2[spec.name] = (
                vals, rsel if valid is None
                else jnp.logical_and(valid, rsel))
        return env2, rsel

    in_env_spec = jax.tree_util.tree_map(lambda _: P(axis), env)
    out_env_spec = {}
    for nm, hv in zip(names, valid_tag):
        out_env_spec[nm] = (P(axis), P(axis) if hv else None)
    for spec in node.functions:
        out_env_spec[spec.name] = (P(axis), P(axis))
    key = ("dpipe_window", node.id, seg, n_dev, axis,
           tuple(sorted(env)),
           tuple(d.id for d in mesh.devices.flatten()))
    f = cached_jit(key, lambda: shard_map(
        step, mesh=mesh, in_specs=(in_env_spec, P(axis)),
        out_specs=(out_env_spec, P(axis)), check_vma=False))
    return f(env, sel)


def _detect_plain_orderby(rest, agg):
    from velox_tpu.exec.operators import LimitOp, OrderByOp, TopNOp

    if agg is not None or not rest:
        return None
    op0 = rest[0]
    if not isinstance(op0, OrderByOp) or isinstance(op0, TopNOp):
        return None
    if len(rest) > 1 and isinstance(rest[1], LimitOp):
        return None  # handled by the top-K prune
    return op0


def _ranged_sort_flush(env, sel, node, mesh, n_dev, axis, seg):
    """Distributed ORDER BY: equi-depth range partition on the leading
    key (host-sampled splitters) + all_to_all + per-device full sort;
    device-ordered gather is then globally sorted (SURVEY §2.7 #5
    ordered distributed merge / velox MergeExchange analog)."""
    from velox_tpu.ops.sort import sort_indices
    from velox_tpu.parallel.shuffle import bucket_by_destination

    spec = [(kk.name, kk.descending, kk.nulls_first)
            for kk in node.keys]
    k0, desc0, nf0 = spec[0]
    v_host = np.asarray(env[k0][0])
    va = env[k0][1]
    va_host = None if va is None else np.asarray(va)
    live = v_host if va_host is None else v_host[va_host]
    if live.size == 0:
        return None
    sample = np.sort(live[:: max(1, live.size // 4096)])
    qs = np.quantile(sample, np.linspace(0, 1, n_dev + 1)[1:-1],
                     method="nearest")
    splitters = jnp.asarray(np.asarray(qs, dtype=v_host.dtype))
    names = sorted(env)
    valid_tag = [env[nm][1] is not None for nm in names]

    def step(env, sel, splitters):
        v, valid = env[k0]
        dest = jnp.searchsorted(
            splitters, v, side="right").astype(jnp.int32)
        if desc0:
            dest = (n_dev - 1) - dest
        if valid is not None:
            # device 0's shard leads the gathered output, so null rows
            # go to device 0 exactly when NULLS FIRST
            null_dest = 0 if nf0 else n_dev - 1
            dest = jnp.where(valid, dest, jnp.int32(null_dest))
        arrays = []
        for nm, hv in zip(names, valid_tag):
            vv, vva = env[nm]
            arrays.append(vv)
            if hv:
                arrays.append(vva)
        bufs, bvalid, _ovf = bucket_by_destination(
            arrays, dest, sel, n_dev, sel.shape[0])
        out_arrays = [
            jax.lax.all_to_all(
                buf, axis, split_axis=0, concat_axis=0,
                tiled=False).reshape(-1)
            for buf in bufs]
        rsel = jax.lax.all_to_all(
            bvalid, axis, split_axis=0, concat_axis=0,
            tiled=False).reshape(-1)
        env2 = {}
        i = 0
        for nm, hv in zip(names, valid_tag):
            vv = out_arrays[i]
            i += 1
            vva = None
            if hv:
                vva = out_arrays[i]
                i += 1
            env2[nm] = (vv, vva)
        keys = [(env2[nm][0], env2[nm][1], d, nf)
                for nm, d, nf in spec]
        perm = sort_indices(keys, rsel)
        env3 = {nm: (jnp.take(vv, perm, mode="clip"),
                     None if vva is None
                     else jnp.take(vva, perm, mode="clip"))
                for nm, (vv, vva) in env2.items()}
        return env3, jnp.take(rsel, perm, mode="clip")

    in_env_spec = jax.tree_util.tree_map(lambda _: P(axis), env)
    out_specs = (in_env_spec, P(axis))
    key = ("dpipe_rsort", node.id, seg, n_dev, axis,
           tuple(sorted(env)),
           tuple(d.id for d in mesh.devices.flatten()))
    f = cached_jit(key, lambda: shard_map(
        step, mesh=mesh, in_specs=(in_env_spec, P(axis), P()),
        out_specs=out_specs, check_vma=False))
    return f(env, sel, splitters)


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
            mesh, n_dev, axis, scan, seg, tails=()):
    """Final segment: transforms (+ partial agg) per device, then serial
    finalization + downstream operators. ``tails`` are serial batches
    appended after the sharded stream (right/full unmatched build
    rows)."""
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
        for n in meta:  # meta preserves the node's output column order
            if n not in env:
                continue
            v, va = env[n]
            t, d, s = meta[n]
            if t is None:
                continue
            cols[n] = Column(t, v, va, d, s)
        batches = [Batch(cols, sel)] + list(tails)

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
