"""Extended array/map projections (round 3 breadth).

Each function here is a ProjectOp applier: ``fn(op, batch, e, out_t)``
-> output column for one top-level projection. They share one
expansion skeleton — canonicalize a row-segmented lane into a compact
(row, ordinal) layout with ONE host sync for the element total, then
express the per-row semantics as flat sorts/scans/packs — the TPU
answer to the reference's per-row loops in
velox/functions/prestosql/ArrayFunctions.h and MapFunctions.h.

Registered in ``EXT_APPLIERS``; ProjectOp dispatches any top-level
``Call`` whose name appears there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, BOOLEAN, DOUBLE, INTEGER, VARCHAR
from velox_tpu.types.types import (
    ArrayType, MapType, TypeKind, array as array_type,
)
from velox_tpu.expr.ir import Call, FieldRef, Lambda, Literal
from velox_tpu.vector.column import ArrayColumn, Column, MapColumn


def _round_capacity(n: int) -> int:
    from velox_tpu.vector.batch import round_capacity

    return round_capacity(n)


def _valid_take(valid, idx):
    return None if valid is None else jnp.take(valid, idx, mode="clip")


# ------------------------------------------------------------ expansion

class _Expanded:
    """Canonical (row, ordinal) layout of a segmented lane set."""

    __slots__ = ("nst", "lens", "row_of", "ordinal", "in_run",
                 "src_idx", "ecap", "total")


def expand(starts, lengths, sel, cap: int) -> _Expanded:
    """Canonicalize arbitrary (possibly shared/gathered) offsets into a
    compact layout. ONE host sync (the element total)."""
    from velox_tpu.utils.replay import fetch_int as _fetch_int

    lens = jnp.where(sel, lengths, 0)
    total = _fetch_int("cfn_total", jnp.sum(lens))  # host sync
    ecap = _round_capacity(max(total, 1))
    nst = (jnp.cumsum(lens) - lens).astype(jnp.int32)
    rows = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.where(lens > 0, nst, ecap)
    heads = jnp.zeros((ecap,), jnp.int32).at[pos].max(
        rows + 1, mode="drop")
    row_of = jnp.maximum(
        jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
    p = jnp.arange(ecap, dtype=jnp.int32)
    ordinal = p - jnp.take(nst, row_of, mode="clip")
    out = _Expanded()
    out.nst, out.lens, out.row_of, out.ordinal = nst, lens, row_of, ordinal
    out.in_run = p < total
    out.src_idx = jnp.take(starts, out.row_of, mode="clip") + ordinal
    out.ecap, out.total = ecap, total
    return out


def _gather_elem(col: Column, idx) -> tuple:
    return (jnp.take(col.values, idx, mode="clip"),
            _valid_take(col.valid, idx))


def _pack_rows(ex: _Expanded, keep, cap: int):
    """Pack kept elements preserving current order; returns
    (perm, new_starts, new_lengths)."""
    from velox_tpu.ops.sort import pack_indices

    kcnt = (jnp.zeros((cap,), jnp.int32)
            .at[jnp.where(keep, ex.row_of, cap)].add(1, mode="drop"))
    perm = pack_indices(keep, ex.ecap)
    nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
    return perm, nst, kcnt


def _sort_within_rows(ex: _Expanded, key_ops, extra=()):
    """Stable sort elements by (row, *key_ops); returns the permutation
    over the expanded lane."""
    p = jnp.arange(ex.ecap, dtype=jnp.int32)
    row_key = jnp.where(ex.in_run, ex.row_of, jnp.int32(ex.ecap))
    ops = jax.lax.sort([row_key, *key_ops, *extra, p],
                       is_stable=True, num_keys=1 + len(key_ops))
    return ops[-1], ops[0]


def _out_child(out_t, name, node):
    return dict(zip(node.names, node.output_type.children))[name]


# ----------------------------------------------------- array functions

def _array_cum_sum(op, batch, e, out_t):
    """array_cum_sum (ArrayFunctions.h): within-row inclusive prefix
    sum; elements after a NULL are NULL (Presto rule)."""
    src = batch.column(e.args[0].name)
    ev, evd = src.elements.values, src.elements.valid
    wide = (jnp.float64 if jnp.issubdtype(ev.dtype, jnp.floating)
            else jnp.int64)
    v0 = ev.astype(wide) if evd is None else jnp.where(
        evd, ev.astype(wide), 0)
    pref = jnp.cumsum(v0)
    base_idx = jnp.take(src.starts, jnp.arange(
        src.capacity, dtype=jnp.int32), mode="clip")
    # per-element base: prefix just before the row's start
    from velox_tpu.exec.collect_agg import element_owners

    owner, within = element_owners(
        src.starts, src.lengths, ev.shape[0])
    st_of = jnp.take(src.starts, owner, mode="clip")
    base = jnp.where(st_of > 0,
                     jnp.take(pref, jnp.maximum(st_of - 1, 0),
                              mode="clip"), 0)
    out = pref - base
    valid = within
    if evd is not None:
        n0 = (~evd).astype(jnp.int32)
        npref = jnp.cumsum(n0)
        nbase = jnp.where(st_of > 0,
                          jnp.take(npref, jnp.maximum(st_of - 1, 0),
                                   mode="clip"), 0)
        valid = jnp.logical_and(valid, (npref - nbase) == 0)
    elem = Column(out_t.element, out, valid)
    return ArrayColumn(out_t, src.starts, src.lengths, elem, src.valid)


def _array_normalize(op, batch, e, out_t):
    """array_normalize(a, p): x / ||x||_p; zero norm returns the input
    unchanged (ArrayNormalize.h)."""
    from velox_tpu.exec.operator import ExprEvaluator

    src = batch.column(e.args[0].name)
    ev, evd = src.elements.values, src.elements.valid
    p_ev = ExprEvaluator([e.args[1]], batch.schema)
    (pv, _), = p_ev.evaluate(batch)
    x = ev.astype(jnp.float64)
    contrib = jnp.abs(x)
    from velox_tpu.exec.collect_agg import element_owners

    owner, within = element_owners(src.starts, src.lengths, ev.shape[0])
    pe = jnp.take(pv.astype(jnp.float64), owner, mode="clip")
    contrib = jnp.power(contrib, pe)
    if evd is not None:
        contrib = jnp.where(evd, contrib, 0.0)
    contrib = jnp.where(within, contrib, 0.0)
    sums = (jnp.zeros((src.capacity,), jnp.float64)
            .at[jnp.where(within, owner, src.capacity)]
            .add(contrib, mode="drop"))
    norm = jnp.power(sums, 1.0 / jnp.maximum(
        pv.astype(jnp.float64), 1e-300))
    ne = jnp.take(norm, owner, mode="clip")
    out = jnp.where(ne > 0, x / ne, x)
    elem = Column(out_t.element, out, evd)
    return ArrayColumn(out_t, src.starts, src.lengths, elem, src.valid)


def _map_normalize(op, batch, e, out_t):
    """map_normalize(m): values divided by the sum of all non-null
    values in the map (MapNormalize.h)."""
    src = batch.column(e.args[0].name)
    vv, vvd = src.values.values, src.values.valid
    from velox_tpu.exec.collect_agg import element_owners

    owner, within = element_owners(src.starts, src.lengths, vv.shape[0])
    x = vv.astype(jnp.float64)
    contrib = x if vvd is None else jnp.where(vvd, x, 0.0)
    contrib = jnp.where(within, contrib, 0.0)
    sums = (jnp.zeros((src.capacity,), jnp.float64)
            .at[jnp.where(within, owner, src.capacity)]
            .add(contrib, mode="drop"))
    se = jnp.take(sums, owner, mode="clip")
    out = jnp.where(se != 0, x / se, x)
    return MapColumn(out_t, src.starts, src.lengths, src.keys,
                     Column(out_t.value, out, vvd), src.valid)


def _transform_with_index(op, batch, e, out_t):
    """transform_with_index(a, (x, i) -> body): 1-based ordinal lane
    joins the element lane in the lambda scope."""
    from velox_tpu.exec.collect_agg import element_owners
    from velox_tpu.exec.operators import (
        _gather_captures, _lambda_capture_names,
    )
    from velox_tpu.exec.operator import ExprEvaluator
    from velox_tpu.types.types import row_type
    from velox_tpu.vector.batch import Batch as _Batch

    src = batch.column(e.args[0].name)
    lam = e.args[1]
    px, pi = lam.params
    ecap = src.elements.capacity
    owner, within = element_owners(src.starts, src.lengths, ecap)
    st_of = jnp.take(src.starts, owner, mode="clip")
    idx = (jnp.arange(ecap, dtype=jnp.int32) - st_of + 1).astype(
        jnp.int64)
    fcols = {px: src.elements,
             pi: Column(BIGINT, idx, None)}
    names, types = [px, pi], [src.dtype.element, BIGINT]
    caps = _lambda_capture_names(lam.body, lam.params, batch)
    if caps:
        ccols, ctypes = _gather_captures(batch, caps, owner, within)
        fcols.update(ccols)
        names += caps
        types += [ctypes[n] for n in caps]
    fake = _Batch(fcols, jnp.ones((ecap,), jnp.bool_))
    ev2 = ExprEvaluator([lam.body], row_type(names, types))
    pairs, dicts = ev2.project_pairs(fake)
    vals, valid = pairs[0]
    elem = Column(out_t.element, vals, valid, dicts[0])
    return ArrayColumn(out_t, src.starts, src.lengths, elem, src.valid)


def _shuffle(op, batch, e, out_t):
    """shuffle(a): uniform random within-row permutation. The stream is
    fixed per compiled program (trace-time seed) — same XLA-honest
    contract as rand()."""
    import os as _os

    src = batch.column(e.args[0].name)
    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    ev, evd = _gather_elem(src.elements, ex.src_idx)
    key = jax.random.PRNGKey(int.from_bytes(_os.urandom(4), "little"))
    rnd = jax.random.bits(key, (ex.ecap,), dtype=jnp.uint32)
    perm, _ = _sort_within_rows(ex, [rnd.astype(jnp.int64)])
    elem = Column(out_t.element, jnp.take(ev, perm, mode="clip"),
                  _valid_take(evd, perm), src.elements.dictionary)
    return ArrayColumn(out_t, ex.nst, ex.lens, elem, src.valid)


def _remove_nulls(op, batch, e, out_t):
    src = batch.column(e.args[0].name)
    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    ev, evd = _gather_elem(src.elements, ex.src_idx)
    keep = ex.in_run if evd is None else jnp.logical_and(ex.in_run, evd)
    perm, nst, kcnt = _pack_rows(ex, keep, batch.capacity)
    elem = Column(out_t.element, jnp.take(ev, perm, mode="clip"),
                  None, src.elements.dictionary)
    return ArrayColumn(out_t, nst, kcnt, elem, src.valid)


def _trim_array(op, batch, e, out_t):
    """trim_array(a, n): drop the last n elements (offsets-only)."""
    from velox_tpu.exec.operator import ExprEvaluator

    src = batch.column(e.args[0].name)
    (nv, _), = ExprEvaluator([e.args[1]], batch.schema).evaluate(batch)
    new_len = jnp.clip(src.lengths - nv.astype(jnp.int32), 0,
                       src.lengths)
    return ArrayColumn(out_t, src.starts, new_len, src.elements,
                       src.valid)


def _sort_keys_for(ev, evd, descending, nulls_first):
    from velox_tpu.ops.sortkey import encode_sort_key

    return encode_sort_key(ev, evd, descending=descending,
                           nulls_first=nulls_first)


def _array_sort_desc(op, batch, e, out_t):
    src = batch.column(e.args[0].name)
    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    ev, evd = _gather_elem(src.elements, ex.src_idx)
    ops = _sort_keys_for(ev, evd, True, False)
    perm, _ = _sort_within_rows(ex, ops)
    elem = Column(out_t.element, jnp.take(ev, perm, mode="clip"),
                  _valid_take(evd, perm), src.elements.dictionary)
    return ArrayColumn(out_t, ex.nst, ex.lens, elem, src.valid)


def _array_duplicates(op, batch, e, out_t):
    """array_duplicates (ArrayDuplicates.cpp): distinct values occurring
    more than once, ascending, null first."""
    src = batch.column(e.args[0].name)
    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    ev, evd = _gather_elem(src.elements, ex.src_idx)
    ops = _sort_keys_for(ev, evd, False, True)
    perm, srow = _sort_within_rows(ex, ops)
    sv = jnp.take(ev, perm, mode="clip")
    svd = _valid_take(evd, perm)
    keys = [srow] + [jnp.take(k, perm, mode="clip") for k in ops]
    same_prev = jnp.ones((ex.ecap,), jnp.bool_).at[0].set(False)
    for k in keys:
        same_prev = jnp.logical_and(same_prev, jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), k[1:] == k[:-1]]))
    prev_same = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), same_prev[:-1]])
    keep = jnp.logical_and(same_prev, ~prev_same)  # 2nd of each run
    keep = jnp.logical_and(keep, srow < ex.ecap)
    # pack in sorted order: elements already sorted, pack by keep
    from velox_tpu.ops.sort import pack_indices

    kcnt = (jnp.zeros((batch.capacity,), jnp.int32)
            .at[jnp.where(keep, srow, batch.capacity)]
            .add(1, mode="drop"))
    pperm = pack_indices(keep, ex.ecap)
    nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
    elem = Column(out_t.element, jnp.take(sv, pperm, mode="clip"),
                  _valid_take(svd, pperm), src.elements.dictionary)
    return ArrayColumn(out_t, nst, kcnt, elem, src.valid)


def _array_has_duplicates(op, batch, e, out_t):
    """array_has_duplicates -> BOOLEAN (scalar output column)."""
    src = batch.column(e.args[0].name)
    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    ev, evd = _gather_elem(src.elements, ex.src_idx)
    ops = _sort_keys_for(ev, evd, False, True)
    perm, srow = _sort_within_rows(ex, ops)
    keys = [srow] + [jnp.take(k, perm, mode="clip") for k in ops]
    same_prev = jnp.ones((ex.ecap,), jnp.bool_).at[0].set(False)
    for k in keys:
        same_prev = jnp.logical_and(same_prev, jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), k[1:] == k[:-1]]))
    dup = jnp.logical_and(same_prev, srow < ex.ecap)
    hits = (jnp.zeros((batch.capacity,), jnp.int32)
            .at[jnp.where(dup, srow, batch.capacity)]
            .add(1, mode="drop"))
    return Column(BOOLEAN, hits > 0, src.valid)


def _array_top_n(op, batch, e, out_t):
    """array_top_n(a, n): n largest elements, descending; nulls last
    count toward n only when fewer than n non-null (ArrayTopN)."""
    from velox_tpu.exec.operator import ExprEvaluator

    src = batch.column(e.args[0].name)
    (nv, _), = ExprEvaluator([e.args[1]], batch.schema).evaluate(batch)
    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    ev, evd = _gather_elem(src.elements, ex.src_idx)
    ops = _sort_keys_for(ev, evd, True, False)
    perm, srow = _sort_within_rows(ex, ops)
    # ordinal within row AFTER the sort
    p = jnp.arange(ex.ecap, dtype=jnp.int32)
    sord = p - jnp.take(ex.nst, jnp.minimum(srow, batch.capacity - 1),
                        mode="clip")
    ne = jnp.take(nv.astype(jnp.int32),
                  jnp.minimum(srow, batch.capacity - 1), mode="clip")
    keep = jnp.logical_and(srow < ex.ecap, sord < ne)
    sv = jnp.take(ev, perm, mode="clip")
    svd = _valid_take(evd, perm)
    from velox_tpu.ops.sort import pack_indices

    kcnt = (jnp.zeros((batch.capacity,), jnp.int32)
            .at[jnp.where(keep, srow, batch.capacity)]
            .add(1, mode="drop"))
    pperm = pack_indices(keep, ex.ecap)
    nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
    elem = Column(out_t.element, jnp.take(sv, pperm, mode="clip"),
                  _valid_take(svd, pperm), src.elements.dictionary)
    return ArrayColumn(out_t, nst, kcnt, elem, src.valid)


# ------------------------------------------------------- map functions

def _pack_map(src: MapColumn, out_t, keep, cap: int,
              owner, new_keys=None, new_vals=None):
    from velox_tpu.ops.sort import pack_indices

    kcnt = (jnp.zeros((cap,), jnp.int32)
            .at[jnp.where(keep, owner, cap)].add(1, mode="drop"))
    perm = pack_indices(keep, src.keys.capacity)
    nk = new_keys if new_keys is not None else src.keys
    nv = new_vals if new_vals is not None else src.values
    nkc = Column(nk.dtype, jnp.take(nk.values, perm, mode="clip"),
                 _valid_take(nk.valid, perm), nk.dictionary)
    nvc = Column(nv.dtype, jnp.take(nv.values, perm, mode="clip"),
                 _valid_take(nv.valid, perm), nv.dictionary)
    nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
    return MapColumn(out_t, nst, kcnt, nkc, nvc, src.valid)


def _key_lit_codes(src: MapColumn, lits):
    """Literal key values -> the key lane's comparison space (dict
    codes for string keys, raw values otherwise)."""
    if src.keys.dictionary is not None:
        return [src.keys.dictionary.code_of(v) for v in lits]
    return list(lits)


def _lit_array_values(e) -> list:
    assert (isinstance(e, Call)
            and e.name == "array_constructor"
            and all(isinstance(a, Literal) for a in e.args)), (
        "expected a literal ARRAY[...] argument")
    return [a.value for a in e.args]


def _map_key_pred(op, batch, e, out_t, mode):
    """map_subset / map_intersect keep keys in the set; map_except
    drops them (MapSubset.h, MapIntersect.h, MapExcept.h)."""
    from velox_tpu.exec.collect_agg import element_owners

    src = batch.column(e.args[0].name)
    codes = _key_lit_codes(src, _lit_array_values(e.args[1]))
    kv = src.keys.values
    owner, within = element_owners(
        src.starts, src.lengths, kv.shape[0])
    hit = jnp.zeros(kv.shape, jnp.bool_)
    for c in codes:
        hit = jnp.logical_or(hit, kv == c)
    keep = jnp.logical_and(within, hit if mode == "keep" else ~hit)
    return _pack_map(src, out_t, keep, batch.capacity, owner)


def _map_values_in_range(op, batch, e, out_t):
    """Entries whose value is in [lo, hi]; null values preserved
    (MapValuesInRange.h)."""
    from velox_tpu.exec.collect_agg import element_owners
    from velox_tpu.exec.operator import ExprEvaluator

    src = batch.column(e.args[0].name)
    ev = ExprEvaluator(list(e.args[1:]), batch.schema)
    (lo, lov), (hi, hiv) = ev.evaluate(batch)
    vv, vvd = src.values.values, src.values.valid
    owner, within = element_owners(
        src.starts, src.lengths, vv.shape[0])
    loe = jnp.take(lo, owner, mode="clip").astype(vv.dtype)
    hie = jnp.take(hi, owner, mode="clip").astype(vv.dtype)
    ok = jnp.logical_and(vv >= loe, vv <= hie)
    if lov is not None:  # null bound -> bound not applied
        ok = jnp.logical_or(
            ok, ~jnp.take(lov, owner, mode="clip") & (vv <= hie))
    if hiv is not None:
        ok = jnp.logical_or(
            ok, ~jnp.take(hiv, owner, mode="clip") & (vv >= loe))
    if vvd is not None:  # null values preserved
        ok = jnp.logical_or(ok, ~vvd)
    keep = jnp.logical_and(within, ok)
    return _pack_map(src, out_t, keep, batch.capacity, owner)


def _map_remove_null_values(op, batch, e, out_t):
    from velox_tpu.exec.collect_agg import element_owners

    src = batch.column(e.args[0].name)
    vvd = src.values.valid
    owner, within = element_owners(
        src.starts, src.lengths, src.values.capacity)
    keep = within if vvd is None else jnp.logical_and(within, vvd)
    return _pack_map(src, out_t, keep, batch.capacity, owner)


def _map_top_n_perm(src, batch, n_expr, by):
    """Shared: expanded sort of map entries by value desc (ties key
    desc — MapTopNImpl.h comparator) or key desc; returns
    (expanded, perm, srow, keep, kv, kvd, vv, vvd)."""
    from velox_tpu.exec.operator import ExprEvaluator

    ex = expand(src.starts, src.lengths, batch.sel, batch.capacity)
    kv, kvd = _gather_elem(src.keys, ex.src_idx)
    vv, vvd = _gather_elem(src.values, ex.src_idx)
    if by == "value":
        ops = (_sort_keys_for(vv, vvd, True, False)
               + _sort_keys_for(kv, kvd, True, False))
    else:
        ops = _sort_keys_for(kv, kvd, True, False)
    perm, srow = _sort_within_rows(ex, ops)
    (nv, _), = ExprEvaluator([n_expr], batch.schema).evaluate(batch)
    p = jnp.arange(ex.ecap, dtype=jnp.int32)
    sord = p - jnp.take(ex.nst, jnp.minimum(srow, batch.capacity - 1),
                        mode="clip")
    ne = jnp.take(nv.astype(jnp.int32),
                  jnp.minimum(srow, batch.capacity - 1), mode="clip")
    keep = jnp.logical_and(srow < ex.ecap, sord < ne)
    return ex, perm, srow, keep, kv, kvd, vv, vvd


def _pack_expanded(ex, srow, keep, vals, valid, cap, dtype, dic):
    from velox_tpu.ops.sort import pack_indices

    kcnt = (jnp.zeros((cap,), jnp.int32)
            .at[jnp.where(keep, srow, cap)].add(1, mode="drop"))
    pperm = pack_indices(keep, ex.ecap)
    nst = (jnp.cumsum(kcnt) - kcnt).astype(jnp.int32)
    col = Column(dtype, jnp.take(vals, pperm, mode="clip"),
                 _valid_take(valid, pperm), dic)
    return nst, kcnt, col


def _map_top_n(op, batch, e, out_t):
    src = batch.column(e.args[0].name)
    ex, perm, srow, keep, kv, kvd, vv, vvd = _map_top_n_perm(
        src, batch, e.args[1], "value")
    sk = jnp.take(kv, perm, mode="clip")
    skd = _valid_take(kvd, perm)
    sv2 = jnp.take(vv, perm, mode="clip")
    svd = _valid_take(vvd, perm)
    nst, kcnt, kcol = _pack_expanded(
        ex, srow, keep, sk, skd, batch.capacity, out_t.key,
        src.keys.dictionary)
    _, _, vcol = _pack_expanded(
        ex, srow, keep, sv2, svd, batch.capacity, out_t.value,
        src.values.dictionary)
    return MapColumn(out_t, nst, kcnt, kcol, vcol, src.valid)


def _map_top_n_lane(op, batch, e, out_t, by, lane):
    src = batch.column(e.args[0].name)
    ex, perm, srow, keep, kv, kvd, vv, vvd = _map_top_n_perm(
        src, batch, e.args[1], by)
    v, vd, dic = ((kv, kvd, src.keys.dictionary) if lane == "key"
                  else (vv, vvd, src.values.dictionary))
    sv2 = jnp.take(v, perm, mode="clip")
    svd = _valid_take(vd, perm)
    nst, kcnt, col = _pack_expanded(
        ex, srow, keep, sv2, svd, batch.capacity, out_t.element, dic)
    return ArrayColumn(out_t, nst, kcnt, col, src.valid)


def _map_ctor(op, batch, e, out_t):
    """map(keys_array, values_array) -> MAP (MapFunctions.h map());
    entry i of row r pairs the i-th elements of both arrays."""
    karr = batch.column(e.args[0].name)
    varr = batch.column(e.args[1].name)
    ex = expand(karr.starts, karr.lengths, batch.sel, batch.capacity)
    kv, kvd = _gather_elem(karr.elements, ex.src_idx)
    vidx = (jnp.take(varr.starts, ex.row_of, mode="clip") + ex.ordinal)
    in_v = ex.ordinal < jnp.take(varr.lengths, ex.row_of, mode="clip")
    vv = jnp.take(varr.elements.values, vidx, mode="clip")
    vvd = _valid_take(varr.elements.valid, vidx)
    vvd = in_v if vvd is None else jnp.logical_and(vvd, in_v)
    valid = karr.valid
    if varr.valid is not None:
        valid = (varr.valid if valid is None
                 else jnp.logical_and(valid, varr.valid))
    kcol = Column(out_t.key, kv, kvd, karr.elements.dictionary)
    vcol = Column(out_t.value, vv, vvd, varr.elements.dictionary)
    return MapColumn(out_t, ex.nst, ex.lens, kcol, vcol, valid)


def _map_from_entries(op, batch, e, out_t):
    """map_from_entries(ARRAY(ROW(k, v))) — the entries array's row
    children become the key/value lanes directly (shared offsets)."""
    from velox_tpu.vector.column import RowColumn

    src = batch.column(e.args[0].name)
    assert isinstance(src.elements, RowColumn), (
        "map_from_entries expects ARRAY(ROW(k, v)) elements")
    k, v = src.elements.children[0], src.elements.children[1]
    return MapColumn(out_t, src.starts, src.lengths,
                     Column(out_t.key, k.values, k.valid, k.dictionary),
                     Column(out_t.value, v.values, v.valid,
                            v.dictionary),
                     src.valid)


def _remap_keys(op, batch, e, out_t):
    """remap_keys(m, ARRAY[from...], ARRAY[to...]) with literal key
    arrays: a where-chain over the key lane (RemapKeys.h)."""
    src = batch.column(e.args[0].name)
    frm = _lit_array_values(e.args[1])
    to = _lit_array_values(e.args[2])
    kv = src.keys.values
    dic = src.keys.dictionary
    if dic is not None:
        # string keys: rebuild the lane dictionary with renames applied
        from velox_tpu.vector.column import Dictionary

        ren = dict(zip(frm, to))
        out_vals = [ren.get(str(v), str(v)) for v in dic.values]
        nd = Dictionary(sorted(set(out_vals)))
        table = np.asarray([nd.code_of(v) for v in out_vals], np.int32)
        nk = jnp.take(jnp.asarray(table),
                      jnp.clip(kv, 0, len(table) - 1), mode="clip")
        nk = jnp.where(kv < 0, kv, nk)
        kcol = Column(out_t.key, nk, src.keys.valid, nd)
    else:
        nk = kv
        for f, t in zip(frm, to):
            nk = jnp.where(kv == f, jnp.asarray(t, kv.dtype), nk)
        kcol = Column(out_t.key, nk, src.keys.valid)
    return MapColumn(out_t, src.starts, src.lengths, kcol, src.values,
                     src.valid)


def _split_to_map(op, batch, e, out_t, multi: bool):
    """split_to_map / split_to_multimap(s, entry_delim, kv_delim):
    per-distinct host split builds flat entry tables; device work is
    one expansion + gathers (the split() design applied to maps;
    velox/functions/prestosql/SplitToMap.h). split_to_map keeps the
    LAST value for duplicate keys (Presto rule); split_to_multimap
    keeps every entry (duplicate keys repeat)."""
    from velox_tpu.vector.column import Dictionary

    name = e.args[0].name
    codes_col = batch.column(name)
    d = codes_col.dictionary
    assert d is not None, "split_to_map requires a dictionary column"
    ed = e.args[1].value
    kd = e.args[2].value
    per_code = []
    for v in d.values:
        s = str(v)
        entries = []
        seen = {}
        for part in (s.split(ed) if s else []):
            if not part:
                continue
            k, _, val = part.partition(kd)
            if multi:
                entries.append((k, val))
            else:
                seen[k] = val
        per_code.append(entries if multi else list(seen.items()))
    counts = np.asarray([0] + [len(x) for x in per_code], np.int32)
    flat_k = [k for ent in per_code for k, _ in ent]
    flat_v = [v for ent in per_code for _, v in ent]
    kdic = Dictionary(sorted(set(flat_k)))
    vdic = Dictionary(sorted(set(flat_v)))
    fk = np.asarray([kdic.code_of(k) for k in flat_k], np.int32)
    fv = np.asarray([vdic.code_of(v) for v in flat_v], np.int32)
    ent_start = np.concatenate([[0], np.cumsum(counts[1:])[:-1]]) \
        if len(counts) > 1 else np.asarray([0])
    ent_start = np.asarray(ent_start, np.int32)
    # device: per-row entry count by code, expansion, gathers
    kv = codes_col.values
    cnt = jnp.take(jnp.asarray(counts), kv + 1, mode="clip")
    sel = batch.sel
    if codes_col.valid is not None:
        sel = jnp.logical_and(sel, codes_col.valid)
    ex = expand(jnp.zeros_like(cnt), cnt, sel, batch.capacity)
    code_of_row = jnp.take(kv, ex.row_of, mode="clip")
    base = jnp.take(jnp.asarray(ent_start),
                    jnp.clip(code_of_row, 0, len(per_code) - 1),
                    mode="clip")
    src_idx = base + ex.ordinal
    fkj = jnp.asarray(fk if len(fk) else np.zeros(1, np.int32))
    fvj = jnp.asarray(fv if len(fv) else np.zeros(1, np.int32))
    kcol = Column(out_t.key, jnp.take(fkj, src_idx, mode="clip"),
                  None, kdic)
    vcol = Column(out_t.value, jnp.take(fvj, src_idx, mode="clip"),
                  None, vdic)
    return MapColumn(out_t, ex.nst, ex.lens, kcol, vcol,
                     codes_col.valid)


#: name -> applier; ProjectOp dispatches any top-level Call here
EXT_APPLIERS = {
    "array_cum_sum": _array_cum_sum,
    "array_normalize": _array_normalize,
    "map_normalize": _map_normalize,
    "transform_with_index": _transform_with_index,
    "shuffle": _shuffle,
    "remove_nulls": _remove_nulls,
    "trim_array": _trim_array,
    "array_sort_desc": _array_sort_desc,
    "array_duplicates": _array_duplicates,
    "array_has_duplicates": _array_has_duplicates,
    "array_top_n": _array_top_n,
    "map_subset": lambda op, b, e, t: _map_key_pred(op, b, e, t, "keep"),
    "map_intersect": lambda op, b, e, t: _map_key_pred(
        op, b, e, t, "keep"),
    "map_except": lambda op, b, e, t: _map_key_pred(op, b, e, t, "drop"),
    "map_values_in_range": _map_values_in_range,
    "map_remove_null_values": _map_remove_null_values,
    "map_top_n": _map_top_n,
    "map_top_n_keys": lambda op, b, e, t: _map_top_n_lane(
        op, b, e, t, "key", "key"),
    "map_top_n_values": lambda op, b, e, t: _map_top_n_lane(
        op, b, e, t, "value", "value"),
    "map_keys_by_top_n_values": lambda op, b, e, t: _map_top_n_lane(
        op, b, e, t, "value", "key"),
    "map": _map_ctor,
    "map_from_entries": _map_from_entries,
    "remap_keys": _remap_keys,
    "split_to_map": lambda op, b, e, t: _split_to_map(
        op, b, e, t, False),
    "split_to_multimap": lambda op, b, e, t: _split_to_map(
        op, b, e, t, True),
}


def _typeof(op, batch, e, out_t):
    """typeof(x) -> constant type-name string column
    (velox/functions/prestosql/TypeOfFunction.h; resolved statically)."""
    from velox_tpu.vector.column import Dictionary

    src = e.args[0]
    name = str(src.dtype).lower() if src.dtype is not None else "unknown"
    return Column(VARCHAR,
                  jnp.zeros((batch.capacity,), jnp.int32),
                  None, Dictionary([name]))


def _array_join(op, batch, e, out_t):
    """array_join(a, delim [, null_replacement]) -> VARCHAR.

    Inherently produces a fresh string per row, so this is an explicit
    HOST materialization point (one device->host sync of the row's
    elements), not a dictionary transform — the one array function
    whose output cannot stay in code space
    (velox/functions/prestosql/ArrayJoin.h)."""
    from velox_tpu.vector.column import Dictionary

    src = batch.column(e.args[0].name)
    delim = str(e.args[1].value)
    null_rep = (str(e.args[2].value)
                if len(e.args) > 2 and e.args[2].value is not None
                else None)
    starts = np.asarray(src.starts)
    lens = np.asarray(src.lengths)
    ev = np.asarray(src.elements.values)
    evd = (None if src.elements.valid is None
           else np.asarray(src.elements.valid))
    d = src.elements.dictionary
    sel = np.asarray(batch.sel)
    outs = []
    for i in range(starts.shape[0]):
        if not sel[i]:
            outs.append("")
            continue
        parts = []
        for j in range(starts[i], starts[i] + lens[i]):
            if evd is not None and not evd[j]:
                if null_rep is not None:
                    parts.append(null_rep)
                continue
            v = ev[j]
            if d is not None:
                parts.append(str(d.values[v]) if v >= 0 else "")
            elif isinstance(v, (float, np.floating)):
                parts.append(repr(float(v)))
            else:
                parts.append(str(v))
        outs.append(delim.join(parts))
    uniq = Dictionary(sorted(set(outs)))
    codes = np.asarray([uniq.code_of(s) for s in outs], np.int32)
    return Column(VARCHAR, jnp.asarray(codes), src.valid, uniq)


EXT_APPLIERS["typeof"] = _typeof
EXT_APPLIERS["array_join"] = _array_join


def _array_constructor(op, batch, e, out_t):
    """ARRAY[e1, ..., ek] over scalar expressions: elements interleave
    as k lanes per row (ArrayConstructor.h); NULL entries are null
    elements, the array itself is never null."""
    from velox_tpu.exec.operator import ExprEvaluator

    k = len(e.args)
    cap = batch.capacity
    if k == 0:
        return ArrayColumn(
            out_t, jnp.zeros((cap,), jnp.int32),
            jnp.zeros((cap,), jnp.int32),
            Column(out_t.element, jnp.zeros((1,), jnp.int64), None))
    ev = ExprEvaluator(list(e.args), batch.schema)
    pairs, dicts = ev.project_pairs(batch)
    lane = out_t.element.dtype
    vals = jnp.stack(
        [jnp.broadcast_to(v.astype(lane), (cap,)) for v, _ in pairs],
        axis=1).reshape(-1)
    valids = [vd for _, vd in pairs]
    if any(vd is not None for vd in valids):
        valid = jnp.stack(
            [jnp.broadcast_to(
                vd if vd is not None else jnp.ones((), jnp.bool_),
                (cap,)) for vd in valids],
            axis=1).reshape(-1)
    else:
        valid = None
    dic = next((d for d in dicts if d is not None), None)
    starts = (jnp.arange(cap, dtype=jnp.int32) * k)
    lens = jnp.full((cap,), k, jnp.int32)
    return ArrayColumn(out_t, starts, lens,
                       Column(out_t.element, vals, valid, dic), None)


EXT_APPLIERS["array_constructor"] = _array_constructor


# ------------------------------------------- round-5 long-tail breadth

def _flatten(op, batch, e, out_t):
    """flatten(array(array(T))) -> array(T): concatenate inner arrays,
    NULL inner arrays skipped (velox/functions/prestosql/
    ArrayFlatten.cpp:191). Two chained expansions — outer rows to
    inner-array slots, slots to elements — all device gathers."""
    src = batch.column(e.args[0].name)
    inner = src.elements
    assert isinstance(inner, ArrayColumn), "flatten expects nested arrays"
    sel = batch.sel
    if src.valid is not None:
        sel = jnp.logical_and(sel, src.valid)
    ex1 = expand(src.starts, src.lengths, sel, batch.capacity)
    in_starts = jnp.take(inner.starts, ex1.src_idx, mode="clip")
    in_lens = jnp.take(inner.lengths, ex1.src_idx, mode="clip")
    if inner.valid is not None:
        in_lens = jnp.where(
            jnp.take(inner.valid, ex1.src_idx, mode="clip"), in_lens, 0)
    in_lens = jnp.where(ex1.in_run, in_lens, 0)
    # output length per outer row = segment sum of kept inner lengths
    out_lens = jnp.zeros((batch.capacity,), jnp.int32).at[
        ex1.row_of].add(jnp.where(ex1.in_run, in_lens, 0), mode="drop")
    ex2 = expand(in_starts, in_lens,
                 jnp.ones_like(in_lens, dtype=jnp.bool_), ex1.ecap)
    ev = jnp.take(inner.elements.values, ex2.src_idx, mode="clip")
    evd = _valid_take(inner.elements.valid, ex2.src_idx)
    nst = (jnp.cumsum(out_lens) - out_lens).astype(jnp.int32)
    elem = Column(out_t.element, ev, evd, inner.elements.dictionary)
    return ArrayColumn(out_t, nst, out_lens, elem, src.valid)


def _map_zip_with(op, batch, e, out_t):
    """map_zip_with(m1, m2, (k, v1, v2) -> body): merge the two maps on
    the KEY UNION, evaluate the lambda over flat (k, v1, v2) lanes
    (velox/functions/prestosql/MapZipWith.h). TPU shape: concatenate
    both entry runs, sort (row, key) flat, collapse adjacent equal
    keys — the same sort-is-the-hash-table move the joins use."""
    from velox_tpu.exec.operator import ExprEvaluator
    from velox_tpu.ops.sort import sort_indices
    from velox_tpu.types.types import row_type as _rt
    from velox_tpu.vector.batch import Batch as _B
    from velox_tpu.vector.column import Dictionary

    ca = batch.column(e.args[0].name)
    cb = batch.column(e.args[1].name)
    lam = e.args[2]
    cap = batch.capacity
    null_valid = None
    for c in (ca, cb):
        if c.valid is not None:
            null_valid = (c.valid if null_valid is None
                          else jnp.logical_and(null_valid, c.valid))
    row_live = batch.sel
    if null_valid is not None:
        row_live = jnp.logical_and(row_live, null_valid)

    # unify key code spaces (different columns carry different
    # dictionaries; union-rank mapping as in _bind_string_cmp_pair)
    ka, kb = ca.keys, cb.keys
    kdic = None
    kav, kbv = ka.values, kb.values
    if ka.dictionary is not None or kb.dictionary is not None:
        va = np.asarray(ka.dictionary.values).astype(str)
        vb = np.asarray(kb.dictionary.values).astype(str)
        union = np.unique(np.concatenate([va, vb]))
        kdic = Dictionary(list(union))
        ta = jnp.asarray(np.concatenate(
            [[-1], np.searchsorted(union, va)]).astype(np.int32))
        tb = jnp.asarray(np.concatenate(
            [[-1], np.searchsorted(union, vb)]).astype(np.int32))
        kav = jnp.take(ta, ka.values + 1, mode="clip")
        kbv = jnp.take(tb, kb.values + 1, mode="clip")

    la = jnp.where(row_live, ca.lengths, 0)
    lb = jnp.where(row_live, cb.lengths, 0)
    lens = (la + lb).astype(jnp.int32)
    ex = expand((jnp.cumsum(lens) - lens).astype(jnp.int32), lens,
                row_live, cap)
    ra_len = jnp.take(la, ex.row_of, mode="clip")
    from_a = ex.ordinal < ra_len

    def side(col, kv, ord_):
        idx = jnp.take(col.starts, ex.row_of, mode="clip") + ord_
        return (jnp.take(kv, idx, mode="clip"),
                jnp.take(col.values.values, idx, mode="clip"),
                _valid_take(col.values.valid, idx))

    ak, av, avd = side(ca, kav, ex.ordinal)
    bk, bv, bvd = side(cb, kbv, ex.ordinal - ra_len)
    key = jnp.where(from_a, ak, bk)
    # sort flat entries by (row, key); equal keys adjacent, the a-side
    # first (stable sort, a-run precedes b-run)
    esel = ex.in_run
    perm = sort_indices(
        [(jnp.take(ex.row_of, jnp.arange(ex.ecap)), None, False, False),
         (key, None, False, False)], esel)
    srow = jnp.take(ex.row_of, perm)
    skey = jnp.take(key, perm)
    sfrom_a = jnp.take(from_a, perm)
    sav = jnp.take(jnp.where(from_a, av, av), perm)
    sbv = jnp.take(bv, perm)
    savd = None if avd is None else jnp.take(avd, perm)
    sbvd = None if bvd is None else jnp.take(bvd, perm)
    ssel = jnp.take(esel, perm)
    # adjacent duplicate (row,key): first is a-side, second b-side
    prev_same = jnp.concatenate([
        jnp.asarray([False]),
        jnp.logical_and(srow[1:] == srow[:-1], skey[1:] == skey[:-1])])
    next_same = jnp.concatenate([prev_same[1:], jnp.asarray([False])])
    keep = jnp.logical_and(ssel, ~prev_same)
    # v1 present iff this entry is a-side; v2 comes from the entry
    # itself (b-side) or the duplicate right neighbour
    nxt = jnp.minimum(jnp.arange(ex.ecap) + 1, ex.ecap - 1)
    v1 = sav
    v1d = jnp.logical_and(
        sfrom_a, jnp.ones_like(sfrom_a) if savd is None else savd)
    v2_self = jnp.where(sfrom_a, jnp.zeros_like(sbv), sbv)
    v2_nbr = jnp.take(sbv, nxt)
    v2 = jnp.where(sfrom_a & next_same, v2_nbr, v2_self)
    v2d_self = jnp.logical_and(
        ~sfrom_a, jnp.ones_like(sfrom_a) if sbvd is None else sbvd)
    v2d_nbr = (jnp.take(sbvd, nxt) if sbvd is not None
               else jnp.ones_like(sfrom_a))
    v2d = jnp.where(sfrom_a & next_same, v2d_nbr, v2d_self)
    # pack kept entries to the front preserving (row, key) order
    kidx = jnp.cumsum(keep) - 1
    ecap = ex.ecap
    pos = jnp.where(keep, kidx, ecap)
    scat = lambda x, fill: jnp.full((ecap,), fill, x.dtype).at[
        pos].set(x, mode="drop")
    out_lens = jnp.zeros((cap,), jnp.int32).at[srow].add(
        jnp.where(keep, 1, 0), mode="drop")
    out_lens = jnp.where(row_live, out_lens, 0)
    nst = (jnp.cumsum(out_lens) - out_lens).astype(jnp.int32)
    fk = scat(skey, -1)
    frow = scat(srow, 0)
    fv1, fv1d = scat(v1, 0), scat(v1d, False)
    fv2, fv2d = scat(v2, 0), scat(v2d, False)
    # lambda over flat (k, v1, v2) lanes
    kp, p1, p2 = lam.params
    kt = ca.dtype.key
    fcols = {kp: Column(kt, fk, None, kdic),
             p1: Column(ca.dtype.value, fv1, fv1d),
             p2: Column(cb.dtype.value, fv2, fv2d)}
    names, types = [kp, p1, p2], [kt, ca.dtype.value, cb.dtype.value]
    from velox_tpu.exec.operators import _lambda_capture_names as _lcn
    caps = _lcn(lam.body, lam.params, batch)
    if caps:
        from velox_tpu.exec.operators import _gather_captures as _gc
        within = jnp.arange(ecap) < jnp.sum(out_lens)
        ccols, ctypes = _gc(batch, caps, frow, within)
        fcols.update(ccols)
        names += caps
        types += [ctypes[n] for n in caps]
    ev = ExprEvaluator([lam.body], _rt(names, types))
    pairs, dicts = ev.project_pairs(
        _B(fcols, jnp.ones((ecap,), jnp.bool_)))
    vals, valid = pairs[0]
    kcol = Column(kt, fk, None, kdic)
    vcol = Column(out_t.value, vals, valid, dicts[0])
    return MapColumn(out_t, nst, out_lens, kcol, vcol, null_valid)


# ---- host-materialized long tail: inherently per-row string/combina-
# torial outputs (the same explicit host points as array_join)

def _host_rebuild(pylist, pa_type, cap):
    import pyarrow as pa

    from velox_tpu.vector.arrow_bridge import _ingest_array

    arr = pa.array(pylist, type=pa_type)
    return _ingest_array(pa.chunked_array([arr]), cap)


def _pa_of(dtype):
    import pyarrow as pa

    from velox_tpu.types.types import ArrayType, MapType

    if isinstance(dtype, ArrayType):
        return pa.list_(_pa_of(dtype.element))
    if isinstance(dtype, MapType):
        return pa.map_(_pa_of(dtype.key), _pa_of(dtype.value))
    if dtype.is_string:
        return pa.string()
    kind = dtype.kind.name
    return {
        "BOOLEAN": pa.bool_(), "TINYINT": pa.int8(),
        "SMALLINT": pa.int16(), "INTEGER": pa.int32(),
        "BIGINT": pa.int64(), "REAL": pa.float32(),
        "DOUBLE": pa.float64(), "DATE": pa.date32(),
    }.get(kind, pa.float64())


def _ngrams(op, batch, e, out_t):
    """ngrams(array(T), n) -> array(array(T))
    (velox/functions/prestosql/ArrayNgramsFunctions.h: fewer than n
    elements yields one gram with the whole array)."""
    src = batch.column(e.args[0].name)
    n = int(e.args[1].value)
    rows = src.to_pylist(batch.capacity)
    out = []
    for r in rows:
        if r is None:
            out.append(None)
        elif len(r) <= n:
            out.append([r])
        else:
            out.append([r[i:i + n] for i in range(len(r) - n + 1)])
    return _host_rebuild(out, _pa_of(out_t), batch.capacity)


def _combinations(op, batch, e, out_t):
    """combinations(array(T), k) -> array(array(T)) in lexicographic
    index order (velox/functions/prestosql/ArrayCombinationsFunction
    caps k at 5)."""
    import itertools

    src = batch.column(e.args[0].name)
    k = int(e.args[1].value)
    assert 0 <= k <= 5, "combinations supports k in [0, 5]"
    rows = src.to_pylist(batch.capacity)
    out = []
    for r in rows:
        if r is None:
            out.append(None)
        else:
            out.append([list(c) for c in
                        itertools.combinations(r, k)])
    return _host_rebuild(out, _pa_of(out_t), batch.capacity)


def _array_frequency(op, batch, e, out_t):
    """array_frequency(array(T)) -> map(T, int): per-element counts,
    NULL elements skipped, keys in first-seen order
    (velox/functions/prestosql/ArrayFunctions.h arrayFrequency)."""
    src = batch.column(e.args[0].name)
    rows = src.to_pylist(batch.capacity)
    out = []
    for r in rows:
        if r is None:
            out.append(None)
        else:
            cnt = {}
            for v in r:
                if v is None:
                    continue
                cnt[v] = cnt.get(v, 0) + 1
            out.append(list(cnt.items()))
    return _host_rebuild(out, _pa_of(out_t), batch.capacity)


def _multimap_from_entries(op, batch, e, out_t):
    """multimap_from_entries(array(row(K, V))) -> map(K, array(V)):
    duplicate keys collect every value in order
    (velox/functions/prestosql/MultimapFromEntriesFunction.h)."""
    src = batch.column(e.args[0].name)
    rows = src.to_pylist(batch.capacity)
    out = []
    for r in rows:
        if r is None:
            out.append(None)
        else:
            grouped = {}
            for ent in r:
                if ent is None:
                    continue
                if isinstance(ent, dict):       # ROW entries render as
                    k, v = list(ent.values())   # field dicts in order
                else:
                    k, v = ent
                if k is None:
                    # Presto raises on NULL keys; padding entries from
                    # zip() length mismatch drop instead (documented
                    # deviation — filters can't raise mid-kernel)
                    continue
                grouped.setdefault(k, []).append(v)
            out.append(list(grouped.items()))
    return _host_rebuild(out, _pa_of(out_t), batch.capacity)


def _cosine_similarity(op, batch, e, out_t):
    """cosine_similarity(map(varchar,double), map(varchar,double))
    (velox/functions/prestosql/Cosine...): dot over shared keys /
    (||a|| * ||b||); empty or zero-norm inputs -> NULL."""
    import math

    ca = batch.column(e.args[0].name)
    cb = batch.column(e.args[1].name)
    ra = ca.to_pylist(batch.capacity)
    rb = cb.to_pylist(batch.capacity)
    vals = np.zeros((batch.capacity,), np.float64)
    valid = np.zeros((batch.capacity,), bool)
    for i, (ma, mb) in enumerate(zip(ra, rb)):
        if ma is None or mb is None:
            continue
        da, db = dict(ma), dict(mb)
        na = math.sqrt(sum(v * v for v in da.values()
                           if v is not None))
        nb = math.sqrt(sum(v * v for v in db.values()
                           if v is not None))
        if na == 0.0 or nb == 0.0:
            continue
        dot = sum(va * db[k] for k, va in da.items()
                  if va is not None and db.get(k) is not None)
        vals[i] = dot / (na * nb)
        valid[i] = True
    return Column(DOUBLE, jnp.asarray(vals), jnp.asarray(valid))


EXT_APPLIERS["flatten"] = _flatten
EXT_APPLIERS["map_zip_with"] = _map_zip_with
EXT_APPLIERS["ngrams"] = _ngrams
EXT_APPLIERS["combinations"] = _combinations
EXT_APPLIERS["array_frequency"] = _array_frequency
EXT_APPLIERS["multimap_from_entries"] = _multimap_from_entries
EXT_APPLIERS["cosine_similarity"] = _cosine_similarity


def _array_split_into_chunks(op, batch, e, out_t):
    """array_split_into_chunks(array(T), n) -> array(array(T)) of
    consecutive n-element chunks, last chunk ragged
    (velox/functions/prestosql/ArrayFunctions.h)."""
    src = batch.column(e.args[0].name)
    n = int(e.args[1].value)
    assert n > 0, "chunk size must be positive"
    rows = src.to_pylist(batch.capacity)
    out = []
    for r in rows:
        if r is None:
            out.append(None)
        else:
            out.append([r[i:i + n] for i in range(0, len(r), n)])
    return _host_rebuild(out, _pa_of(out_t), batch.capacity)


EXT_APPLIERS["array_split_into_chunks"] = _array_split_into_chunks
