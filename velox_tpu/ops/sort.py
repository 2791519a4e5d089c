"""Multi-key sort and top-N over fixed-capacity batches.

Replaces velox's OrderBy/SortBuffer/PrefixSort stack
(velox/exec/OrderBy.h:34, SortBuffer.h:33, PrefixSort.h:100) with one XLA
sort: all key columns are encoded to int64 operands (sortkey.py) and sorted
lexicographically by ``jax.lax.sort``, which lowers to the TPU's bitonic
sort network. Unselected (padding) rows carry a leading "inactive" key so
they always sort to the back — sorting therefore doubles as row compaction
(the analog of SelectivityVector -> contiguous output copy in
velox/exec/OperatorUtils.cpp).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from velox_tpu.ops.sortkey import encode_sort_key

#: (values, valid, descending, nulls_first)
SortKey = Tuple[jax.Array, Optional[jax.Array], bool, bool]


def _operands(keys: Sequence[SortKey], sel: jax.Array) -> List[jax.Array]:
    ops: List[jax.Array] = [jnp.where(sel, jnp.int32(0), jnp.int32(1))]
    for values, valid, desc, nf in keys:
        ops.extend(
            encode_sort_key(values, valid, descending=desc, nulls_first=nf)
        )
    return ops


def sort_indices(keys: Sequence[SortKey], sel: jax.Array) -> jax.Array:
    """Stable sort; returns int32 permutation with active rows first.

    ``out[i]`` is the original row index of the i-th row in sort order.
    Callers gather every column through it and keep ``sel`` sorted alongside
    (active rows form the prefix).
    """
    n = sel.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    ops = _operands(keys, sel)
    sorted_ops = jax.lax.sort(
        ops + [perm], is_stable=True, num_keys=len(ops)
    )
    return sorted_ops[-1]


def compact_indices(sel: jax.Array) -> jax.Array:
    """Stable partition of active rows to the front (compaction)."""
    return sort_indices([], sel)


def top_n_indices(
    keys: Sequence[SortKey], sel: jax.Array, n: int
) -> Tuple[jax.Array, jax.Array]:
    """First n rows in sort order: (indices (n,), out_sel (n,)).

    The analog of velox/exec/TopN.h:23's bounded heap; on TPU a full sort
    then a static slice is faster than heap maintenance for any n that fits
    a batch (the sort network cost is already paid for compaction).
    """
    perm = sort_indices(keys, sel)
    top = perm[:n]
    active_sorted = jnp.take(sel, top, mode="clip")
    return top, active_sorted


def pack_indices(sel, fill=None):
    """Indices of True in ``sel``, front-packed in order, padded with
    ``fill`` (default: capacity) — drop-in for
    ``jnp.nonzero(sel, size=cap, fill_value=cap)[0]``, which lowers
    pathologically on the axon TPU (577ms at 6M rows vs 38ms for the
    equivalent 2-operand int32 sort this uses)."""
    import jax
    import jax.numpy as jnp

    cap = sel.shape[0]
    if fill is None:
        fill = cap
    perm = jnp.arange(cap, dtype=jnp.int32)
    flag = jnp.where(sel, jnp.int32(0), jnp.int32(1))
    _, idx = jax.lax.sort([flag, perm], is_stable=True, num_keys=1)
    n = jnp.sum(sel.astype(jnp.int32))
    return jnp.where(perm < n, idx, jnp.int32(fill))
