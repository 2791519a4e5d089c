"""Collect-mode aggregation finish: array_agg / map_agg / map_union /
approx_percentile over one global grouping.

The execution half of functions/aggregates_collect.py: the operator
(HashAggregationOp mode "collect") buffers raw input batches and calls
:func:`finish_collect` once. One jitted program groups all rows
(sort-is-the-hash-table), runs scalar aggregates directly against the
final group ids (no partial/merge round needed — all rows are present),
and lays collect results out as group-contiguous element runs, which IS
the ArrayColumn/MapColumn representation.

Reference: velox/exec/GroupingSet.cpp + ValueList-based accumulators
(velox/functions/prestosql/aggregates/ArrayAggAggregate.cpp,
MapAggAggregate.cpp, MapUnionAggregate.cpp,
ApproxPercentileAggregate.cpp) — re-designed with zero per-group
dynamic buffers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from velox_tpu.functions.aggregates_collect import (
    collect_runs, dedupe_first, percentile_values,
)
from velox_tpu.ops.groupby import group_ids_sorted
from velox_tpu.ops.sortkey import encode_sort_key
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import ArrayColumn, Column, MapColumn


def element_owners(starts, lengths, ecap: int):
    """Flat-element index -> owning row (+ in-range mask).

    Requires ``starts`` ascending over rows with ``lengths > 0`` — the
    construction invariant of make_map_column/concat (Arrow offsets
    contract). Scatter each live row at its start, forward max-scan.
    """
    cap = starts.shape[0]
    rows = jnp.arange(cap, dtype=jnp.int32)
    live = lengths > 0
    head = (jnp.full((ecap,), -1, jnp.int32)
            .at[jnp.where(live, starts, ecap)]
            .max(rows, mode="drop"))
    owner = jax.lax.associative_scan(jnp.maximum, head)
    e = jnp.arange(ecap, dtype=jnp.int32)
    osafe = jnp.maximum(owner, 0)
    within = jnp.logical_and(
        owner >= 0,
        e < (jnp.take(starts, osafe, mode="clip")
             + jnp.take(lengths, osafe, mode="clip")))
    return osafe, within


def _spec_mask(op, i, cols, sel):
    """Row mask for spec i: batch sel AND the spec's boolean mask col."""
    spec = op.specs[i]
    m = sel
    if spec.mask is not None:
        mv, mvd = cols[spec.mask]
        m = jnp.logical_and(m, mv)
        if mvd is not None:
            m = jnp.logical_and(m, mvd)
    return m


def _valid_or_none(valid, take_idx):
    return (None if valid is None
            else jnp.take(valid, take_idx, mode="clip"))


def finish_collect(op, big: Batch) -> Batch:
    """Run the whole aggregation (scalar + collect specs) in one pass."""
    from velox_tpu.exec.jitcache import cached_jit

    cap = big.capacity
    cols_in: Dict[str, tuple] = {}
    maps_in: Dict[str, dict] = {}
    for n in op._needed:
        c = big.column(n)
        if isinstance(c, MapColumn):
            maps_in[n] = {
                "starts": c.starts, "lengths": c.lengths,
                "valid": c.valid, "kv": c.keys.values,
                "kvd": c.keys.valid, "vv": c.values.values,
                "vvd": c.values.valid,
            }
        elif isinstance(c, ArrayColumn):
            maps_in[n] = {
                "starts": c.starts, "lengths": c.lengths,
                "valid": c.valid, "ev": c.elements.values,
                "evd": c.elements.valid,
            }
        else:
            cols_in[n] = (c.values, c.valid)

    def run(cols, maps, sel):
        key_pairs = [cols[k] for k in op.keys]
        gids, group_rows, group_sel, _ = group_ids_sorted(key_pairs, sel)
        if not op.keys:
            # global aggregation emits one row even on empty input
            group_sel = jnp.zeros_like(group_sel).at[0].set(True)
        out_keys = [
            (jnp.take(v, group_rows, mode="clip"),
             _valid_or_none(va, group_rows))
            for (v, va) in key_pairs]

        results: List[tuple] = []
        for i, (spec, fn) in enumerate(zip(op.specs, op.fns)):
            m = _spec_mask(op, i, cols, sel)
            kind = fn.collect_kind
            if kind is None:
                results.append(_scalar_result(
                    op, i, fn, spec, cols, gids, m, group_sel, cap))
            elif kind in ("array", "set"):
                av, avd = cols[spec.arg]
                if kind == "set":
                    m = dedupe_first(
                        gids, encode_sort_key(av, avd), m)
                perm, counts, starts = collect_runs(gids, m)
                results.append((
                    counts, starts,
                    jnp.take(av, perm, mode="clip"),
                    _valid_or_none(avd, perm),
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "histogram":
                av, avd = cols[spec.arg]
                mm = m if avd is None else jnp.logical_and(m, avd)
                # one sub-grouping by (group, value): representatives
                # carry the pair's occurrence count
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(gids, None), (av, None)], mm)
                pair_cnt = (jnp.zeros((cap,), jnp.int64)
                            .at[g2].add(mm.astype(jnp.int64),
                                        mode="drop"))
                r2 = jnp.clip(rows2, 0, cap - 1)
                pk = jnp.take(av, r2, mode="clip")
                pgid = jnp.where(
                    sel2, jnp.take(gids, r2, mode="clip"),
                    jnp.int32(cap))
                perm, counts, starts = collect_runs(pgid, sel2)
                results.append((
                    counts, starts,
                    jnp.take(pk, perm, mode="clip"), None,
                    jnp.take(pair_cnt, perm, mode="clip"), None,
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "map":
                kf, vf = spec.arg
                kv, kvd = cols[kf]
                vv, vvd = cols[vf]
                mm = m if kvd is None else jnp.logical_and(m, kvd)
                keep = dedupe_first(gids, encode_sort_key(kv, None), mm)
                perm, counts, starts = collect_runs(gids, keep)
                results.append((
                    counts, starts,
                    jnp.take(kv, perm, mode="clip"), None,
                    jnp.take(vv, perm, mode="clip"),
                    _valid_or_none(vvd, perm),
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "multimap":
                kf, vf = spec.arg
                kv, kvd = cols[kf]
                vv, vvd = cols[vf]
                mm = m if kvd is None else jnp.logical_and(m, kvd)
                key_ops = encode_sort_key(kv, None)
                # flat values in (group, key, arrival) order
                perm, _gc, _gs = collect_runs(gids, mm, key_ops)
                # distinct (group, key) entries carry value counts
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(gids, None), (kv, None)], mm)
                pair_cnt = (jnp.zeros((cap,), jnp.int32)
                            .at[g2].add(mm.astype(jnp.int32),
                                        mode="drop"))
                r2 = jnp.clip(rows2, 0, cap - 1)
                pk = jnp.take(kv, r2, mode="clip")
                pgid = jnp.where(
                    sel2, jnp.take(gids, r2, mode="clip"),
                    jnp.int32(cap))
                perm2, kcounts, kstarts = collect_runs(
                    pgid, sel2, encode_sort_key(pk, None))
                pc = jnp.take(pair_cnt, perm2, mode="clip")
                pc = jnp.where(jnp.take(sel2, perm2, mode="clip"),
                               pc, 0)
                vstarts = (jnp.cumsum(pc) - pc).astype(jnp.int32)
                results.append((
                    kcounts, kstarts,
                    jnp.take(pk, perm2, mode="clip"),
                    pc, vstarts,
                    jnp.take(vv, perm, mode="clip"),
                    _valid_or_none(vvd, perm),
                    jnp.logical_and(group_sel, kcounts > 0)))
            elif kind == "set_union":
                ai = maps[spec.arg]
                ecap = ai["ev"].shape[0]
                arow = m if ai["valid"] is None else jnp.logical_and(
                    m, ai["valid"])
                owner, within = element_owners(
                    ai["starts"], ai["lengths"], ecap)
                egid = jnp.where(
                    jnp.logical_and(
                        within, jnp.take(arow, owner, mode="clip")),
                    jnp.take(gids, owner, mode="clip"), jnp.int32(ecap))
                em = egid < ecap
                keep = dedupe_first(
                    egid, encode_sort_key(ai["ev"], ai["evd"]), em)
                perm, counts, starts = collect_runs(egid, keep)
                results.append((
                    _fit(counts, cap), _fit(starts, cap),
                    jnp.take(ai["ev"], perm, mode="clip"),
                    _valid_or_none(ai["evd"], perm),
                    jnp.logical_and(group_sel, _fit(counts, cap) > 0)))
            elif kind == "most_frequent":
                kf, vf = spec.arg
                kv, _ = cols[kf]    # k literal column (uniform)
                vv, vvd = cols[vf]
                mm = m if vvd is None else jnp.logical_and(m, vvd)
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(gids, None), (vv, None)], mm)
                pair_cnt = (jnp.zeros((cap,), jnp.int64)
                            .at[g2].add(mm.astype(jnp.int64),
                                        mode="drop"))
                r2 = jnp.clip(rows2, 0, cap - 1)
                pk = jnp.take(vv, r2, mode="clip")
                pgid = jnp.where(
                    sel2, jnp.take(gids, r2, mode="clip"),
                    jnp.int32(cap))
                # group-major, count-DESC element order; then truncate
                # each group's run to k
                order = [(-pair_cnt).astype(jnp.int64)]
                perm, counts, starts = collect_runs(pgid, sel2, order)
                topk = jnp.take(kv, jnp.argmax(m), mode="clip")
                counts = jnp.minimum(counts, topk.astype(jnp.int32))
                results.append((
                    counts, starts,
                    jnp.take(pk, perm, mode="clip"), None,
                    jnp.take(pair_cnt, perm, mode="clip"), None,
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "map_union_sum":
                mi = maps[spec.arg]
                ecap = mi["kv"].shape[0]
                mrow = m if mi["valid"] is None else jnp.logical_and(
                    m, mi["valid"])
                owner, within = element_owners(
                    mi["starts"], mi["lengths"], ecap)
                egid = jnp.where(
                    jnp.logical_and(
                        within, jnp.take(mrow, owner, mode="clip")),
                    jnp.take(gids, owner, mode="clip"), jnp.int32(ecap))
                em = egid < ecap
                vvd = mi["vvd"]
                if vvd is not None:
                    em = jnp.logical_and(em, vvd)
                # sub-group by (gid, key): reps carry per-key value sums
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(egid, None), (mi["kv"], mi["kvd"])], em)
                sdt = (jnp.float64 if jnp.issubdtype(
                    mi["vv"].dtype, jnp.floating) else jnp.int64)
                vsum = (jnp.zeros((ecap,), sdt)
                        .at[g2].add(jnp.where(em, mi["vv"], 0).astype(
                            sdt), mode="drop"))
                r2 = jnp.clip(rows2, 0, ecap - 1)
                pk = jnp.take(mi["kv"], r2, mode="clip")
                pkd = _valid_or_none(mi["kvd"], r2)
                pgid = jnp.where(
                    sel2, jnp.take(egid, r2, mode="clip"),
                    jnp.int32(ecap))
                perm, counts, starts = collect_runs(pgid, sel2)
                results.append((
                    _fit(counts, cap), _fit(starts, cap),
                    jnp.take(pk, perm, mode="clip"),
                    _valid_or_none(pkd, perm),
                    jnp.take(vsum, perm, mode="clip"), None,
                    jnp.logical_and(group_sel, _fit(counts, cap) > 0)))
            elif kind == "classification":
                bf, of, pf = spec.arg[:3]
                bv, _ = cols[bf]
                ov, ovd = cols[of]
                pv, pvd = cols[pf]
                mm = m
                for d in (ovd, pvd):
                    if d is not None:
                        mm = jnp.logical_and(mm, d)
                b = jnp.take(bv, jnp.argmax(m), mode="clip").astype(
                    jnp.float64)
                bucket = jnp.clip(
                    jnp.floor(pv.astype(jnp.float64) * b), 0,
                    jnp.maximum(b - 1, 0)).astype(jnp.int32)
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(gids, None), (bucket, None)], mm)
                t_w = (jnp.zeros((cap,), jnp.float64)
                       .at[g2].add(jnp.where(
                           jnp.logical_and(mm, ov), 1.0, 0.0),
                           mode="drop"))
                f_w = (jnp.zeros((cap,), jnp.float64)
                       .at[g2].add(jnp.where(
                           jnp.logical_and(mm, ~ov), 1.0, 0.0),
                           mode="drop"))
                r2 = jnp.clip(rows2, 0, cap - 1)
                pgid = jnp.where(
                    sel2, jnp.take(gids, r2, mode="clip"),
                    jnp.int32(cap))
                pbucket = jnp.take(bucket, r2, mode="clip")
                perm, counts, starts = collect_runs(
                    pgid, sel2, [pbucket])
                results.append((
                    counts, starts,
                    jnp.take(pbucket, perm, mode="clip"),
                    jnp.take(t_w, perm, mode="clip"),
                    jnp.take(f_w, perm, mode="clip"),
                    b.astype(jnp.int32),
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "vector_sum":
                ai = maps[spec.arg]
                ecap = ai["ev"].shape[0]
                arow = m if ai["valid"] is None else jnp.logical_and(
                    m, ai["valid"])
                owner, within = element_owners(
                    ai["starts"], ai["lengths"], ecap)
                egid = jnp.where(
                    jnp.logical_and(
                        within, jnp.take(arow, owner, mode="clip")),
                    jnp.take(gids, owner, mode="clip"), jnp.int32(ecap))
                em = egid < ecap
                e = jnp.arange(ecap, dtype=jnp.int32)
                ordinal = e - jnp.take(ai["starts"], owner,
                                       mode="clip")
                evd = ai["evd"]         # null elements count as 0
                # sub-group by (gid, ordinal): reps carry position sums
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(egid, None), (ordinal, None)], em)
                sdt = (jnp.float64 if jnp.issubdtype(
                    ai["ev"].dtype, jnp.floating) else jnp.int64)
                contrib = jnp.where(em, ai["ev"], 0).astype(sdt)
                if evd is not None:
                    contrib = jnp.where(evd, contrib, 0)
                vsum = (jnp.zeros((ecap,), sdt)
                        .at[g2].add(contrib, mode="drop"))
                r2 = jnp.clip(rows2, 0, ecap - 1)
                pord = jnp.take(ordinal, r2, mode="clip")
                pgid = jnp.where(
                    sel2, jnp.take(egid, r2, mode="clip"),
                    jnp.int32(ecap))
                # group-major, ordinal-ascending element layout
                perm, counts, starts = collect_runs(
                    pgid, sel2, [pord])
                results.append((
                    _fit(counts, cap), _fit(starts, cap),
                    jnp.take(vsum, perm, mode="clip"), None,
                    jnp.logical_and(group_sel, _fit(counts, cap) > 0)))
            elif kind == "map_union":
                mi = maps[spec.arg]
                ecap = mi["kv"].shape[0]
                mrow = m if mi["valid"] is None else jnp.logical_and(
                    m, mi["valid"])
                owner, within = element_owners(
                    mi["starts"], mi["lengths"], ecap)
                egid = jnp.where(
                    jnp.logical_and(
                        within, jnp.take(mrow, owner, mode="clip")),
                    jnp.take(gids, owner, mode="clip"), jnp.int32(ecap))
                em = egid < ecap
                keep = dedupe_first(
                    egid, encode_sort_key(mi["kv"], None), em)
                perm, counts, starts = collect_runs(egid, keep)
                # counts/starts live at ecap length; group slots use the
                # first cap entries (group ids < cap <= ecap is NOT
                # guaranteed — slice/pad to cap)
                results.append((
                    _fit(counts, cap), _fit(starts, cap),
                    jnp.take(mi["kv"], perm, mode="clip"),
                    _valid_or_none(mi["kvd"], perm),
                    jnp.take(mi["vv"], perm, mode="clip"),
                    _valid_or_none(mi["vvd"], perm),
                    jnp.logical_and(group_sel, _fit(counts, cap) > 0)))
            elif kind == "reduce":
                av, avd = cols[spec.arg]
                mm = m if avd is None else jnp.logical_and(m, avd)
                init_v, lam = spec.options
                comb = _lambda_comb(lam, big.column(spec.arg).dtype)
                perm, counts, starts = collect_runs(gids, mm)
                sv = jnp.take(av, perm, mode="clip")
                head = (jnp.zeros((cap,), jnp.bool_)
                        .at[jnp.where(counts > 0, starts, cap)]
                        .set(True, mode="drop"))

                def seg(a, b):
                    (avv, af) = a
                    (bvv, bf) = b
                    return (jnp.where(bf, bvv, comb(avv, bvv)),
                            jnp.logical_or(af, bf))

                scanned, _ = jax.lax.associative_scan(
                    seg, (sv, head))
                ends = jnp.clip(starts + counts - 1, 0, cap - 1)
                red = jnp.take(scanned, ends, mode="clip")
                init_arr = jnp.full(
                    red.shape, init_v, red.dtype)
                vals = comb(init_arr, red)
                results.append((
                    jnp.where(counts > 0, vals, init_arr),
                    group_sel))
            elif kind == "winsorized":
                xf, lof, hif = spec.arg
                xv, xvd = cols[xf]
                lo = jnp.take(cols[lof][0], jnp.argmax(m), mode="clip")
                hi = jnp.take(cols[hif][0], jnp.argmax(m), mode="clip")
                mm = m if xvd is None else jnp.logical_and(m, xvd)
                perm, counts, starts = collect_runs(
                    gids, mm, encode_sort_key(xv, None))
                sv = jnp.take(xv, perm, mode="clip").astype(jnp.float64)
                og = jnp.take(jnp.where(mm, gids, jnp.int32(cap)),
                              perm, mode="clip")
                ogs = jnp.minimum(og, cap - 1)
                n1 = jnp.maximum(
                    jnp.take(counts, ogs, mode="clip") - 1, 0)
                st = jnp.take(starts, ogs, mode="clip")
                lo_pos = st + jnp.floor(
                    lo.astype(jnp.float32) * n1.astype(jnp.float32)
                ).astype(jnp.int32)
                hi_pos = st + jnp.floor(
                    hi.astype(jnp.float32) * n1.astype(jnp.float32)
                ).astype(jnp.int32)
                cl = jnp.clip(sv,
                              jnp.take(sv, lo_pos, mode="clip"),
                              jnp.take(sv, hi_pos, mode="clip"))
                tot = (jnp.zeros((cap,), jnp.float64)
                       .at[og].add(jnp.where(og < cap, cl, 0.0),
                                   mode="drop"))
                mean = tot / jnp.maximum(counts, 1)
                results.append((
                    mean, jnp.logical_and(group_sel, counts > 0)))
            elif kind == "numeric_histogram":
                bf, xf = spec.arg
                bv, _ = cols[bf]
                xv, xvd = cols[xf]
                mm = m if xvd is None else jnp.logical_and(m, xvd)
                b = jnp.take(bv, jnp.argmax(m), mode="clip").astype(
                    jnp.float64)
                x = xv.astype(jnp.float64)
                gmin = (jnp.full((cap,), jnp.inf)
                        .at[jnp.where(mm, gids, cap)]
                        .min(x, mode="drop"))
                gmax = (jnp.full((cap,), -jnp.inf)
                        .at[jnp.where(mm, gids, cap)]
                        .max(x, mode="drop"))
                gsafe = jnp.minimum(gids, cap - 1)
                span = (jnp.take(gmax, gsafe, mode="clip")
                        - jnp.take(gmin, gsafe, mode="clip"))
                rel = jnp.where(span > 0,
                                (x - jnp.take(gmin, gsafe, mode="clip"))
                                / jnp.where(span > 0, span, 1.0), 0.0)
                bucket = jnp.clip(jnp.floor(rel * b), 0,
                                  jnp.maximum(b - 1, 0)).astype(jnp.int32)
                g2, rows2, sel2, _ = group_ids_sorted(
                    [(gids, None), (bucket, None)], mm)
                pair_cnt = (jnp.zeros((cap,), jnp.float64)
                            .at[g2].add(mm.astype(jnp.float64),
                                        mode="drop"))
                pair_sum = (jnp.zeros((cap,), jnp.float64)
                            .at[g2].add(jnp.where(mm, x, 0.0),
                                        mode="drop"))
                center = pair_sum / jnp.maximum(pair_cnt, 1.0)
                r2 = jnp.clip(rows2, 0, cap - 1)
                pgid = jnp.where(
                    sel2, jnp.take(gids, r2, mode="clip"),
                    jnp.int32(cap))
                perm, counts, starts = collect_runs(pgid, sel2)
                results.append((
                    counts, starts,
                    jnp.take(center, perm, mode="clip"), None,
                    jnp.take(pair_cnt, perm, mode="clip"), None,
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind in ("digest", "digest_merge"):
                av, avd = cols[spec.arg]
                mm = m if avd is None else jnp.logical_and(m, avd)
                order = (encode_sort_key(av, None)
                         if kind == "digest" else None)
                perm, counts, starts = collect_runs(gids, mm, order)
                results.append((
                    counts, starts,
                    jnp.take(av, perm, mode="clip"),
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "hll":
                # approx_set / make_set_digest: distinct-sketch blobs
                # are built on host from the group runs (values sorted
                # so the host pass dedupes with one diff)
                av, avd = cols[spec.arg]
                mm = m if avd is None else jnp.logical_and(m, avd)
                perm, counts, starts = collect_runs(
                    gids, mm, encode_sort_key(av, None))
                results.append((
                    counts, starts,
                    jnp.take(av, perm, mode="clip"),
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "khll":
                xf, uf = spec.arg
                xv, xvd = cols[xf]
                uv, uvd = cols[uf]
                mm = m
                if xvd is not None:
                    mm = jnp.logical_and(mm, xvd)
                if uvd is not None:
                    mm = jnp.logical_and(mm, uvd)
                perm, counts, starts = collect_runs(gids, mm)
                results.append((
                    counts, starts,
                    jnp.take(xv, perm, mode="clip"),
                    jnp.take(uv, perm, mode="clip"),
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "reservoir":
                # bottom-k-by-hash priority sample: group runs ordered
                # by a per-row hash, counts clamped to k — uniform
                # without replacement, deterministic, mergeable
                from velox_tpu.ops.hash import hash_i64

                xf, kf = spec.arg
                xv, xvd = cols[xf]
                kv, _ = cols[kf]
                mm = m if xvd is None else jnp.logical_and(m, xvd)
                k = jnp.take(kv, jnp.argmax(mm), mode="clip").astype(
                    jnp.int32)
                pri = (hash_i64(jnp.arange(cap, dtype=jnp.int64))
                       >> jnp.uint64(33)).astype(jnp.int32)
                perm, counts, starts = collect_runs(gids, mm, [pri])
                # mm already excludes invalid rows from the runs, so
                # the element lane needs no validity of its own
                results.append((
                    jnp.minimum(counts, jnp.maximum(k, 0)), starts,
                    jnp.take(xv, perm, mode="clip"), None,
                    jnp.logical_and(group_sel, counts > 0)))
            elif kind == "percentile":
                vf, qf = spec.arg
                vv, vvd = cols[vf]
                qv, _ = cols[qf]
                mm = m if vvd is None else jnp.logical_and(m, vvd)
                q = jnp.take(qv, jnp.argmax(mm), mode="clip")
                vals, ok = percentile_values(
                    gids, vv, encode_sort_key(vv, None), mm, q)
                results.append(
                    (vals, jnp.logical_and(group_sel, ok)))
            else:
                raise NotImplementedError(kind)
        return out_keys, results, group_sel

    jitted = cached_jit(("agg_collect", op.node.id, cap), lambda: run)
    out_keys, results, group_sel = jitted(
        cols_in, maps_in, big.sel)

    out: Dict[str, Column] = {}
    for k, (gv, gvd) in zip(op.keys, out_keys):
        out[k] = Column(op.output_type.find_child(k), gv, gvd,
                        op._key_dicts.get(k))
    sfx = getattr(op, "_collect_suffix", "")
    for name, spec, fn, res in zip(
            op.agg_names, op.specs, op.fns, results):
        name = name + sfx  # partial pages are name$0 columns
        t = op.output_type.find_child(name)
        kind = fn.collect_kind
        if kind is None or kind in ("percentile", "reduce",
                                    "winsorized"):
            vals, valid = res
            out[name] = Column(t, vals, valid)
        elif kind in ("digest", "digest_merge"):
            out[name] = _digest_column(op, big, t, spec, fn, res)
        elif kind in ("hll", "khll"):
            out[name] = _sketch_column(op, big, t, spec, fn, res)
        elif kind == "reservoir":
            counts, starts, ev, evd, gvalid = res
            src = big.column(spec.arg[0])
            out[name] = ArrayColumn(
                t, starts, counts,
                Column(t.element, ev, evd, src.dictionary), gvalid)
        elif kind == "classification":
            out[name] = _classification_column(t, fn, res)
        elif kind == "multimap":
            kcounts, kstarts, ekv, pc, vstarts, evv, evvd, gvalid = res
            kf, vf = spec.arg
            inner = ArrayColumn(
                t.value, vstarts, pc,
                Column(t.value.element, evv, evvd,
                       big.column(vf).dictionary), None)
            out[name] = MapColumn(
                t, kstarts, kcounts,
                Column(t.key, ekv, None, big.column(kf).dictionary),
                inner, gvalid)
        elif kind in ("array", "set", "set_union", "vector_sum"):
            counts, starts, ev, evd, gvalid = res
            src = big.column(spec.arg)
            edict = (src.elements.dictionary
                     if kind in ("set_union", "vector_sum")
                     else src.dictionary)
            out[name] = ArrayColumn(
                t, starts, counts,
                Column(t.element, ev, evd, edict), gvalid)
        else:  # map / map_union / histogram
            counts, starts, ekv, ekvd, evv, evvd, gvalid = res
            if kind in ("map_union", "map_union_sum"):
                src = big.column(spec.arg)
                kdict, vdict = src.keys.dictionary, src.values.dictionary
            elif kind == "histogram":
                kdict = big.column(spec.arg).dictionary
                vdict = None
            elif kind == "numeric_histogram":
                kdict = None
                vdict = None
            elif kind == "most_frequent":
                kf, vf = spec.arg
                kdict = big.column(vf).dictionary
                vdict = None
            else:
                kf, vf = spec.arg
                kdict = big.column(kf).dictionary
                vdict = big.column(vf).dictionary
            out[name] = MapColumn(
                t, starts, counts,
                Column(t.key, ekv, ekvd, kdict),
                Column(t.value, evv, evvd, vdict), gvalid)
    return Batch(out, group_sel)


def _classification_column(t, fn, res):
    """Host half of the classification metrics: per-group suffix sums
    over present (bucket, true/false weight) reps -> length-b metric
    arrays (ClassificationAggregation.cpp output contract)."""
    import numpy as np

    counts, starts, bucket, tw, fw, b, gvalid = (
        np.asarray(x) for x in res)
    b = int(b)
    nslots = len(counts)
    metric = fn.name.split("classification_")[1]
    arrays, lens = [], np.zeros(nslots, np.int64)
    for g in np.nonzero(counts > 0)[0]:
        sl = slice(starts[g], starts[g] + counts[g])
        tmat = np.zeros(b)
        fmat = np.zeros(b)
        tmat[bucket[sl]] = tw[sl]
        fmat[bucket[sl]] = fw[sl]
        # TP(i)/FP(i): weights at buckets >= i (suffix sums); FN/TN: < i
        tp = np.cumsum(tmat[::-1])[::-1]
        fp = np.cumsum(fmat[::-1])[::-1]
        fn_ = tmat.sum() - tp
        tn = fmat.sum() - fp
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = {
                "precision": tp / (tp + fp),
                "recall": tp / (tp + fn_),
                "miss_rate": fn_ / (tp + fn_),
                "fall_out": fp / (fp + tn),
                "thresholds": np.arange(b) / b,
            }[metric]
        vals = np.nan_to_num(vals, nan=0.0)
        arrays.append(vals)
        lens[g] = b
    flat = (np.concatenate(arrays) if arrays else np.zeros(0))
    ecap = max(128, 1 << (max(len(flat), 1) - 1).bit_length())
    elems = np.zeros(ecap)
    elems[:len(flat)] = flat
    st = np.cumsum(lens) - lens
    return ArrayColumn(
        t, jnp.asarray(st.astype(np.int32)),
        jnp.asarray(lens.astype(np.int32)),
        Column(t.element, jnp.asarray(elems), None),
        jnp.asarray(counts > 0))


def _digest_column(op, big, t, spec, fn, res):
    """Host half of tdigest_agg / qdigest_agg / merge: serialize each
    group's (sorted) run into a digest blob; blobs live in a string
    Dictionary like any VARBINARY column."""
    import numpy as np

    from velox_tpu.functions.digest import (
        build_group_digests, merge_digests,
    )
    from velox_tpu.types.types import TypeKind
    from velox_tpu.vector.column import Dictionary

    counts, starts, ev, gvalid = (np.asarray(x) for x in res)
    if fn.collect_kind == "digest":
        src_t = big.column(spec.arg).dtype
        k = "f" if src_t.kind in (TypeKind.REAL, TypeKind.DOUBLE) else "i"
        tag = "QD1" if fn.name == "qdigest_agg" else "TD1"
        strs = build_group_digests(counts, starts, ev, k, tag)
    else:
        from velox_tpu.functions.sketch import merge_blobs

        d = big.column(spec.arg).dictionary
        strs = [None] * len(counts)
        for g in np.nonzero(counts > 0)[0]:
            codes = ev[starts[g]:starts[g] + counts[g]]
            strs[g] = merge_blobs(
                [d.values[c] for c in codes if c >= 0])
    nd = Dictionary(sorted({s for s in strs if s is not None}))
    codes = np.array(
        [-1 if s is None else nd.code_of(s) for s in strs], np.int32)
    valid = jnp.asarray(np.array([s is not None for s in strs]))
    return Column(t, jnp.asarray(codes), valid, nd)


def _sketch_column(op, big, t, spec, fn, res):
    """Host half of approx_set / make_set_digest / khyperloglog_agg:
    build each group's sketch blob from its (value-sorted) run.
    Dictionary-coded inputs hash their decoded values so sketches
    from different columns share one hash domain."""
    import numpy as np

    from velox_tpu.functions import sketch as SK
    from velox_tpu.vector.column import Dictionary

    def decode(field, arr):
        d = big.column(field).dictionary
        if d is None:
            return arr
        vals = np.asarray(d.values, dtype=object)
        out = np.empty(len(arr), object)
        okc = arr >= 0
        out[okc] = vals[arr[okc]]
        out[~okc] = None
        return out

    if fn.collect_kind == "hll":
        counts, starts, ev, gvalid = (np.asarray(x) for x in res)
        total = int(counts.sum())  # runs pack from offset 0
        vals = decode(spec.arg, ev[:total])
        build = (SK.hll_build if fn.name == "approx_set"
                 else SK.setdigest_build)
        strs = [None] * len(counts)
        for g in np.nonzero(counts > 0)[0]:
            strs[g] = build(vals[starts[g]:starts[g] + counts[g]])
    else:  # khll
        counts, starts, xv, uv, gvalid = (np.asarray(x) for x in res)
        total = int(counts.sum())
        xf, uf = spec.arg
        xh = SK.hash64_array(decode(xf, xv[:total]))
        uh = SK.hash64_array(decode(uf, uv[:total]))
        strs = [None] * len(counts)
        for g in np.nonzero(counts > 0)[0]:
            sl = slice(starts[g], starts[g] + counts[g])
            strs[g] = SK.khll_build(xh[sl], uh[sl])
    nd = Dictionary(sorted({s for s in strs if s is not None}))
    codes = np.array(
        [-1 if s is None else nd.code_of(s) for s in strs], np.int32)
    valid = jnp.asarray(np.array([s is not None for s in strs]))
    return Column(t, jnp.asarray(codes), valid, nd)


def _lambda_comb(lam, dtype):
    """Compile a two-parameter combine lambda into an elementwise pure
    fn over two arrays (exec/Aggregate ReduceAgg lambda, run through
    the ordinary expression compiler)."""
    from velox_tpu.expr.compiler import ExprSet, resolve_types
    from velox_tpu.expr.ir import FieldRef
    from velox_tpu.types.types import row_type

    a, b = lam.params
    schema = row_type([a, b], [dtype, dtype])
    es = ExprSet([lam.body], schema)

    def comb(x, y):
        (v, _valid) = es.evaluate(
            {a: (x, None), b: (y, None)})[0]
        return v.astype(x.dtype)

    return comb


def _fit(a, cap: int):
    """Slice or zero-pad a 1-D array to length cap."""
    n = a.shape[0]
    if n == cap:
        return a
    if n > cap:
        return a[:cap]
    return jnp.concatenate([a, jnp.zeros((cap - n,), a.dtype)])


def _scalar_result(op, i, fn, spec, cols, gids, m, group_sel, cap):
    """Ordinary scatter-ABI aggregate evaluated against the final gids."""
    accs = tuple(
        jnp.full((cap,) if lane.width == 1 else (cap, lane.width),
                 lane.init_of(op.arg_types[i]),
                 dtype=lane.dtype_of(op.arg_types[i]))
        for lane in fn.lanes)
    spec_arg = spec.arg
    if spec_arg is None:
        vals = None
    elif isinstance(spec_arg, tuple):
        vals = tuple(cols[a] for a in spec_arg)
    else:
        av, avd = cols[spec_arg]
        if avd is not None:
            m = jnp.logical_and(m, avd)
        vals = av
    if spec.distinct:
        _, drows, dsel, _ = group_ids_sorted(
            [(gids, None), (vals, None)], m)
        rep = (jnp.zeros((cap,), jnp.bool_)
               .at[jnp.where(dsel, drows, cap)]
               .set(True, mode="drop"))
        accs = fn.accumulate(accs, gids, vals, rep)
    else:
        accs = fn.accumulate(accs, gids, vals, m)
    return fn.extract(accs, group_sel)
