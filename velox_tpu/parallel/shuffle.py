"""Hash shuffle: the ICI data plane.

Replaces velox's PartitionedOutput -> serialize -> OutputBuffer ->
ExchangeSource pipeline (velox/exec/PartitionedOutput.cpp:426;
OutputBufferManager.h:41-51) with a single device-side program: bucket
rows by hash into a (n_dev, cap) send tensor and ``jax.lax.all_to_all``
it. No serialization, no paging, no acks — SPMD synchrony is the flow
control (SURVEY.md D.5: "inside a pod slice, replace this entirely with
synchronous ragged all-to-all").

All functions here run INSIDE shard_map (they call collectives).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from velox_tpu.ops.hash import hash_columns, partition_ids


def bucket_by_destination(
    arrays: Sequence[jax.Array],
    dest: jax.Array,
    sel: jax.Array,
    n_dest: int,
    cap_per_dest: int,
) -> Tuple[List[jax.Array], jax.Array, jax.Array]:
    """Scatter rows into a (n_dest, cap_per_dest) send layout.

    Rows overflowing a destination's capacity are counted (not silently
    dropped): returns (bucketed arrays, valid (n_dest, cap), overflow
    count). Callers size cap_per_dest so overflow is impossible
    (worst-case) or detectable (optimistic + host retry) — the analog of
    velox's destination buffer growth (PartitionedOutput.h:173).
    """
    cap = dest.shape[0]
    d = jnp.where(sel, dest, jnp.int32(n_dest))
    # stable order by destination -> position within bucket
    perm = jnp.argsort(d, stable=True).astype(jnp.int32)
    sorted_d = jnp.take(d, perm, mode="clip")
    # start offset of each destination in the sorted order
    starts = jnp.searchsorted(
        sorted_d, jnp.arange(n_dest, dtype=sorted_d.dtype), side="left")
    pos = jnp.arange(cap, dtype=jnp.int32) - jnp.take(
        starts, jnp.clip(sorted_d, 0, n_dest - 1), mode="clip").astype(
        jnp.int32)
    ok = jnp.logical_and(sorted_d < n_dest, pos < cap_per_dest)
    overflow = jnp.sum(
        jnp.logical_and(sorted_d < n_dest, pos >= cap_per_dest))
    flat_slot = jnp.where(
        ok, sorted_d * cap_per_dest + pos, n_dest * cap_per_dest)

    out_arrays = []
    for a in arrays:
        sorted_a = jnp.take(a, perm, mode="clip")
        buf = jnp.zeros((n_dest * cap_per_dest,), a.dtype)
        buf = buf.at[flat_slot].set(sorted_a, mode="drop")
        out_arrays.append(buf.reshape(n_dest, cap_per_dest))
    valid = (
        jnp.zeros((n_dest * cap_per_dest,), jnp.bool_)
        .at[flat_slot].set(True, mode="drop")
        .reshape(n_dest, cap_per_dest))
    return out_arrays, valid, overflow


def hash_repartition(
    arrays: Sequence[jax.Array],
    key_cols: Sequence[Tuple[jax.Array, Optional[jax.Array]]],
    sel: jax.Array,
    axis: str,
    n_dev: int,
    cap_per_dest: Optional[int] = None,
) -> Tuple[List[jax.Array], jax.Array, jax.Array]:
    """Repartition rows across the mesh axis by key hash.

    Returns (received arrays each (n_dev*cap,), received valid mask,
    overflow count). Equal keys land on the same device afterwards —
    the contract HashAggregation/HashJoin finals rely on.
    """
    if cap_per_dest is None:
        cap_per_dest = sel.shape[0]  # worst case: everything to one dest
    dest = partition_ids(hash_columns(key_cols), n_dev)
    bufs, valid, overflow = bucket_by_destination(
        arrays, dest, sel, n_dev, cap_per_dest)
    out = []
    for buf in bufs:
        recv = jax.lax.all_to_all(
            buf, axis, split_axis=0, concat_axis=0, tiled=False)
        out.append(recv.reshape(-1))
    recv_valid = jax.lax.all_to_all(
        valid, axis, split_axis=0, concat_axis=0, tiled=False).reshape(-1)
    return out, recv_valid, overflow
