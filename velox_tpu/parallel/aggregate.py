"""Distributed hash aggregation: partial -> hash shuffle -> final.

The SPMD composition of the engine's aggregation companions
(velox/exec/AggregateCompanionAdapter.h:24): every device computes local
partial groups (sort-based, ops/groupby.py), hash-partitions the *groups*
(not the raw rows — the reduction already happened) across the mesh with
one all_to_all, then finalizes its received partition. This is Velox's
partial-agg -> PartitionedOutput -> Exchange -> final-agg fragment chain
collapsed into one XLA program that runs identically on every chip.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import DataType
from velox_tpu.functions.aggregates import lookup_aggregate
from velox_tpu.ops.groupby import group_ids_sorted
from velox_tpu.parallel.shuffle import hash_repartition


def make_distributed_aggregate(
    axis: str,
    n_dev: int,
    num_keys: int,
    specs: Sequence[Tuple[str, Optional[DataType]]],
    cap_per_dest: Optional[int] = None,
):
    """Build the per-device SPMD aggregation step for shard_map.

    ``specs``: (aggregate fn name, input DataType or None for count(*)).
    Returned fn signature:
        fn(key_vals: [..], key_valids: [..|None], agg_vals: [..|None],
           sel) -> (group_key_vals, group_key_valids, results,
                    result_valids, group_sel)
    """
    fns = [lookup_aggregate(name) for name, _ in specs]
    arg_types = [at for _, at in specs]

    def step(key_vals, key_valids, agg_vals, sel):
        cap = sel.shape[0]
        keys = list(zip(key_vals, key_valids))

        if num_keys == 0:
            # keyless: local single-group partial, all_gather lane heads,
            # combine — every device holds the identical global result
            # (the analog of a broadcast final aggregation)
            gids0, _, _, _ = group_ids_sorted([], sel)
            results, result_valids = [], []
            for fn, at, vals in zip(fns, arg_types, agg_vals):
                accs = tuple(
                    jnp.full((cap,), lane.init_of(at),
                             dtype=lane.dtype_of(at))
                    for lane in fn.lanes)
                accs = fn.accumulate(accs, gids0, vals, sel)
                heads = tuple(
                    jax.lax.all_gather(a[0], axis) for a in accs)
                final = tuple(
                    jnp.full((n_dev,), lane.init_of(at),
                             dtype=lane.dtype_of(at))
                    for lane in fn.lanes)
                final = fn.combine(
                    final, jnp.zeros((n_dev,), jnp.int32), heads,
                    jnp.ones((n_dev,), jnp.bool_))
                gsel = jnp.zeros((n_dev,), jnp.bool_).at[0].set(True)
                vals_out, valid_out = fn.extract(final, gsel)
                results.append(vals_out)
                result_valids.append(valid_out)
            gsel = jnp.zeros((n_dev,), jnp.bool_).at[0].set(True)
            return [], [], results, result_valids, gsel

        # ---- local partial aggregation
        gids, group_rows, group_sel, _ = group_ids_sorted(keys, sel)
        lanes_all: List[jax.Array] = []
        lane_splits = []
        for fn, at, vals in zip(fns, arg_types, agg_vals):
            accs = tuple(
                jnp.full((cap,), lane.init_of(at), dtype=lane.dtype_of(at))
                for lane in fn.lanes)
            mask = sel
            if vals is not None:
                accs = fn.accumulate(accs, gids, vals, mask)
            else:
                accs = fn.accumulate(accs, gids, None, mask)
            lane_splits.append(len(accs))
            lanes_all.extend(accs)
        gkey_vals = [
            jnp.take(v, group_rows, mode="clip") for v in key_vals]
        gkey_valids = [
            None if va is None else jnp.take(va, group_rows, mode="clip")
            for va in key_valids]

        # ---- shuffle groups by key hash
        payload = list(gkey_vals)
        valid_idx = []
        for i, va in enumerate(gkey_valids):
            if va is not None:
                valid_idx.append(i)
                payload.append(va)
        payload.extend(lanes_all)
        key_cols = list(zip(gkey_vals, gkey_valids))
        recv, recv_sel, _overflow = hash_repartition(
            payload, key_cols, group_sel, axis, n_dev, cap_per_dest)

        r_key_vals = recv[:num_keys]
        off = num_keys
        r_key_valids: List[Optional[jax.Array]] = [None] * num_keys
        for i in valid_idx:
            r_key_valids[i] = recv[off]
            off += 1
        r_lanes = recv[off:]

        # ---- final aggregation over received partition
        rkeys = list(zip(r_key_vals, r_key_valids))
        gids2, group_rows2, group_sel2, _ = group_ids_sorted(
            rkeys, recv_sel)
        cap2 = recv_sel.shape[0]
        if num_keys == 0:
            group_sel2 = jnp.zeros_like(group_sel2).at[0].set(True)
        results, result_valids = [], []
        li = 0
        for fn, at, nsl in zip(fns, arg_types, lane_splits):
            accs = tuple(
                jnp.full((cap2,), lane.init_of(at), dtype=lane.dtype_of(at))
                for lane in fn.lanes)
            lanes = tuple(r_lanes[li + k] for k in range(nsl))
            li += nsl
            accs = fn.combine(accs, gids2, lanes, recv_sel)
            vals, valid = fn.extract(accs, group_sel2)
            results.append(vals)
            result_valids.append(valid)
        out_keys = [
            jnp.take(v, group_rows2, mode="clip") for v in r_key_vals]
        out_key_valids = [
            None if va is None
            else jnp.take(va, group_rows2, mode="clip")
            for va in r_key_valids]
        return out_keys, out_key_valids, results, result_valids, group_sel2

    return step
