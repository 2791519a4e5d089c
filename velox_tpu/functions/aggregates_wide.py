"""Lexicographic min/max over long-decimal digit lanes.

The engine's long decimals are three signed-digit int64 lanes per
value (types/widedec.py); signed digits order exactly like the int128
values, so MIN/MAX is a lexicographic reduction over (d2, d1, d0).
Scatter-min does not compose lexicographically, so the reduction runs
as THREE CHAINED scatter-mins — refine on d2, then d1 among d2-ties,
then d0 — all plain segment ops, no sort (the engine's no-64-bit-sort
rule; velox/type/HugeInt.h comparison semantics).

``min_wide{2,1,0}`` / ``max_wide{2,1,0}`` each compute the full
lexicographic winner and extract one digit lane; the plan builder
emits all three per MIN/MAX call (plan/builder.py wide expansion).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT
from velox_tpu.functions.aggregates import (
    AccLane, AggregateFunction, register_aggregate,
)

_SENT = np.int64(np.iinfo(np.int64).max)  # digits are << 2^63


def _lex_best(gids, d2, d1, d0, mask, num_groups, is_min):
    """Per-group lexicographic winner triple via 3 chained scatters."""
    cap = gids.shape[0]
    sent = _SENT if is_min else -_SENT
    red = (lambda acc, idx, v: acc.at[idx].min(v, mode="drop")) \
        if is_min else (lambda acc, idx, v: acc.at[idx].max(v, mode="drop"))
    g = jnp.where(mask, gids, jnp.int32(num_groups))
    b2 = red(jnp.full((num_groups,), sent, jnp.int64), g, d2)
    tie2 = jnp.logical_and(
        mask, d2 == jnp.take(b2, jnp.clip(g, 0, num_groups - 1),
                             mode="clip"))
    g1 = jnp.where(tie2, gids, jnp.int32(num_groups))
    b1 = red(jnp.full((num_groups,), sent, jnp.int64), g1, d1)
    tie1 = jnp.logical_and(
        tie2, d1 == jnp.take(b1, jnp.clip(g, 0, num_groups - 1),
                             mode="clip"))
    g0 = jnp.where(tie1, gids, jnp.int32(num_groups))
    b0 = red(jnp.full((num_groups,), sent, jnp.int64), g0, d0)
    return b2, b1, b0


def _lex_merge(a2, a1, a0, b2, b1, b0, is_min):
    """Elementwise lexicographic pick between two winner triples."""
    lt = jnp.logical_or(
        b2 < a2, jnp.logical_and(
            b2 == a2, jnp.logical_or(
                b1 < a1, jnp.logical_and(b1 == a1, b0 < a0))))
    take_b = lt if is_min else jnp.logical_or(
        b2 > a2, jnp.logical_and(
            b2 == a2, jnp.logical_or(
                b1 > a1, jnp.logical_and(b1 == a1, b0 > a0))))
    return (jnp.where(take_b, b2, a2), jnp.where(take_b, b1, a1),
            jnp.where(take_b, b0, a0))


def _make(is_min: bool, out_digit: int) -> AggregateFunction:
    word = "min" if is_min else "max"
    sent = int(_SENT if is_min else -_SENT)

    def accumulate(accs, gids, values, mask):
        (v2, va), (v1, _), (v0, _) = values
        m = mask
        if va is not None:
            m = jnp.logical_and(m, va)
        g = accs[0].shape[0]
        b2, b1, b0 = _lex_best(gids, v2, v1, v0, m, g, is_min)
        return _lex_merge(*accs, b2, b1, b0, is_min)

    def combine(accs, gids, lanes, mask):
        p2, p1, p0 = lanes
        g = accs[0].shape[0]
        b2, b1, b0 = _lex_best(gids, p2, p1, p0, mask, g, is_min)
        return _lex_merge(*accs, b2, b1, b0, is_min)

    # lane order is (d2, d1, d0)
    lane_idx = {2: 0, 1: 1, 0: 2}[out_digit]

    def extract(accs, group_mask):
        seen = accs[0] != sent
        return accs[lane_idx], jnp.logical_and(group_mask, seen)

    return AggregateFunction(
        name=f"{word}_wide{out_digit}",
        resolve_type=lambda t: BIGINT,
        lanes=tuple(
            AccLane(f"d{d}", lambda at: np.dtype(np.int64),
                    lambda at, s=sent: s) for d in (2, 1, 0)),
        accumulate=accumulate,
        combine=combine,
        extract=extract,
        lane_types=lambda at: (BIGINT, BIGINT, BIGINT),
        final_type=lambda lts: BIGINT,
    )


def register_wide_minmax() -> None:
    for is_min in (True, False):
        for d in (2, 1, 0):
            register_aggregate(_make(is_min, d))
