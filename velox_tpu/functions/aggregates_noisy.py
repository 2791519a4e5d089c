"""Noisy (differential-privacy) gaussian aggregates.

Reference: velox/functions/prestosql/aggregates/NoisyCountGaussianAggregate.cpp,
NoisyCountIfGaussianAggregate.cpp, NoisySumGaussianAggregate.cpp,
NoisyAvgGaussianAggregate.cpp. Exact sums/counts ride the ordinary
scatter lanes; the gaussian draw happens once per GROUP at extract via a
counter-based hash (two uint32 mixes + Box-Muller in f32 — no f64
transcendentals, which hang this backend's compiler, and no stateful
PRNG, which jit could not retrace deterministically).

Deviation (documented): ``random_seed`` omitted means seed 0 — the draw
is a fixed gaussian sample per (seed, group) rather than fresh entropy
per query. Every seeded form matches Presto's determinism contract; the
unseeded form trades per-query entropy for reproducibility. The draw is
keyed by the final group SLOT (sorted-key rank) — stable across
single and partial-final execution, but not vs the streaming
operator's arrival-order slots or the spill path's per-partition slots (Presto's seeded draws are likewise
per-accumulator, not strategy-stable).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.functions.aggregates import (
    AccLane, AggregateFunction, register_aggregate,
)


def _mix_u32(x):
    """lowbias32 integer finalizer (public-domain hash construction)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def group_gaussian(seed, ng: int):
    """One standard-normal draw per group slot: counter-based hash ->
    two uniforms -> Box-Muller (f32 throughout; f64 log/cos are
    compiler hazards on the axon backend)."""
    g = jnp.arange(ng, dtype=jnp.uint32)
    s = seed.astype(jnp.uint32) * jnp.uint32(2654435761)
    h1 = _mix_u32(s ^ (g * jnp.uint32(2)))
    h2 = _mix_u32(s ^ (g * jnp.uint32(2) + jnp.uint32(1)))
    u1 = (h1.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -32)
    u2 = (h2.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -32)
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
        jnp.float32(2.0 * np.pi) * u2)
    return z.astype(jnp.float64)


def _noisy_lanes():
    return (
        AccLane("sum", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("count", lambda t: np.dtype(np.int64), lambda t: 0),
        AccLane("scale", lambda t: np.dtype(np.float64), lambda t: 0.0),
        AccLane("seed", lambda t: np.dtype(np.int64), lambda t: 0),
    )


def _unpack(values):
    """(x, scale[, seed]) argument columns -> components."""
    x = values[0]
    scale = values[1]
    seed = values[2] if len(values) > 2 else None
    return x, scale, seed


def _make_noisy(name: str, kind: str, result_type):
    is_count = kind in ("count", "count_if")

    def accumulate(accs, gids, values, mask):
        s, n, sc, sd = accs
        (xv, xvd), (scv, _), sdp = _unpack(values)
        m = mask
        if xvd is not None:
            m = jnp.logical_and(m, xvd)
        if kind == "count_if":
            m = jnp.logical_and(m, xv)
            contrib = jnp.ones_like(xv, jnp.float64)
        elif kind == "count":
            contrib = jnp.ones(xv.shape, jnp.float64)
        else:
            contrib = xv.astype(jnp.float64)
        s = s.at[gids].add(jnp.where(m, contrib, 0.0), mode="drop")
        n = n.at[gids].add(m.astype(jnp.int64), mode="drop")
        sc = sc.at[gids].max(jnp.where(mask, scv, 0.0), mode="drop")
        if sdp is not None:
            sd = sd.at[gids].max(
                jnp.where(mask, sdp[0].astype(jnp.int64), 0),
                mode="drop")
        return (s, n, sc, sd)

    def combine(accs, gids, lanes, mask):
        s, n, sc, sd = accs
        ps, pn, psc, psd = lanes
        s = s.at[gids].add(jnp.where(mask, ps, 0.0), mode="drop")
        n = n.at[gids].add(jnp.where(mask, pn, 0), mode="drop")
        sc = sc.at[gids].max(jnp.where(mask, psc, 0.0), mode="drop")
        sd = sd.at[gids].max(jnp.where(mask, psd, 0), mode="drop")
        return (s, n, sc, sd)

    def extract(accs, gm):
        s, n, sc, sd = accs
        z = group_gaussian(sd, s.shape[0])
        valid = jnp.logical_and(gm, n > 0)
        if is_count:
            v = jnp.maximum(
                jnp.round(s + sc * z), 0.0).astype(jnp.int64)
            return v, valid
        if kind == "avg":
            v = s / jnp.maximum(n, 1).astype(jnp.float64) + sc * z
        else:
            v = s + sc * z
        return v, valid

    register_aggregate(AggregateFunction(
        name=name,
        resolve_type=lambda t: result_type,
        lanes=_noisy_lanes(),
        accumulate=accumulate,
        combine=combine,
        extract=extract,
        lane_types=lambda t: (DOUBLE, BIGINT, DOUBLE, BIGINT),
        final_type=lambda lanes: result_type,
        input_type_from_lanes=lambda lts: (DOUBLE, DOUBLE, BIGINT),
    ))


_make_noisy("noisy_count_gaussian", "count", BIGINT)
_make_noisy("noisy_count_if_gaussian", "count_if", BIGINT)
_make_noisy("noisy_sum_gaussian", "sum", DOUBLE)
_make_noisy("noisy_avg_gaussian", "avg", DOUBLE)
