"""Window-family operators: Window, RowNumber, TopNRowNumber,
MarkDistinct, Expand, GroupId.

Window (velox/exec/Window.h:38) uses the sort-once + segmented-scan design
(velox_tpu/ops/window.py) instead of velox's per-partition iteration: one
bitonic sort by (partition, order) keys, boundary masks, scans/gathers,
then a scatter back to arrival order.
"""

from __future__ import annotations

import collections
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch, concat_batches
from velox_tpu.vector.column import Column
from velox_tpu.exec.operator import ExprEvaluator, Operator
from velox_tpu.exec.operators import _cols_of
from velox_tpu.exec.jitcache import cached_jit
from velox_tpu.exec.spill import SpillableBuffer
from velox_tpu.functions.aggregates import lookup_aggregate
from velox_tpu.ops.groupby import group_ids_sorted
from velox_tpu.ops.sort import sort_indices
from velox_tpu.ops.sortkey import encode_sort_key
from velox_tpu.ops.window import (
    ranks, row_numbers, segment_ends, segment_starts, segmented_cumsum,
    segmented_scan,
)


def _part_bsearch(sv, lo0, hi0, target, side, cap):
    """Vectorized binary search of ``target`` within each row's
    partition slice [lo0, hi0) of the (partition-contiguous, in-partition
    ascending) sorted order column."""
    lo, hi = lo0, hi0
    steps = max(1, int(np.ceil(np.log2(max(cap, 2)))) + 1)
    for _ in range(steps):
        cont = lo < hi
        mid = (lo + hi) >> 1
        mv = jnp.take(sv, jnp.clip(mid, 0, cap - 1), mode="clip")
        p = mv < target if side == "left" else mv <= target
        lo = jnp.where(jnp.logical_and(cont, p), mid + 1, lo)
        hi = jnp.where(jnp.logical_and(cont, ~p), mid, hi)
    return lo


def _frame_minmax(v, start, end, op, ident, cap):
    """Reduce arbitrary [start, end) frames with a sparse table:
    tables[j][i] = reduce over [i, i + 2^j); a frame of length L uses
    level floor(log2 L) twice (overlapping, idempotent ops only). The
    segment-tree answer for non-additive aggregates over frames
    (velox/exec/window/AggregateWindow.h incremental updates analog)."""
    tables = [v]
    t = v
    k = 1
    while k < cap:
        shifted = jnp.concatenate(
            [t[k:], jnp.full((min(k, cap),), ident, t.dtype)])[:cap]
        t = op(t, shifted)
        tables.append(t)
        k <<= 1
    length = jnp.maximum(end - start, 0)
    res = jnp.full((cap,), ident, v.dtype)
    for j, tab in enumerate(tables):
        w = 1 << j
        a = jnp.take(tab, jnp.clip(start, 0, cap - 1), mode="clip")
        b = jnp.take(tab, jnp.clip(end - w, 0, cap - 1), mode="clip")
        cand = op(a, b)
        use = jnp.logical_and(length >= w, length < 2 * w)
        res = jnp.where(use, cand, res)
    return res


def _changes(sorted_cols, cap):
    """Boundary mask: row differs from previous on any column."""
    out = jnp.zeros((cap,), jnp.bool_).at[0].set(True)
    for k in sorted_cols:
        out = jnp.logical_or(out, jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]]))
    return out


def _sorted_key_ops(cols, names_spec, perm):
    ops = []
    for item in names_spec:
        if isinstance(item, str):
            v, va = cols[item]
            keys = encode_sort_key(v, va)
        else:
            v, va = cols[item.name]
            keys = encode_sort_key(
                v, va, descending=item.descending,
                nulls_first=item.nulls_first)
        ops.extend(jnp.take(k, perm, mode="clip") for k in keys)
    return ops


class WindowOp(Operator):
    """velox/exec/Window.h:38 — sorted window evaluation."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._buffer = SpillableBuffer("window")
        self._emitted = False

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        batches = self._buffer.drain()
        if not batches:
            return None
        big = concat_batches(batches)
        return self._evaluate(big)

    def needed_columns(self) -> list:
        node = self.node
        return list(dict.fromkeys(
            list(node.partition_keys)
            + [k.name for k in node.sort_keys]
            + [f.arg for f in node.functions if f.arg is not None]))

    def _evaluate(self, big: Batch) -> Batch:
        node = self.node
        cols = _cols_of(big, self.needed_columns())
        run = cached_jit(("window", node.id), self.make_run_fn)
        results = run(cols, big.sel)
        out = Batch(dict(big.columns), big.sel, big.num_rows)
        for spec, (vals, valid) in zip(node.functions, results):
            dt = self.output_type.find_child(spec.name)
            out = out.with_column(spec.name, Column(dt, vals, valid))
        return out

    def make_run_fn(self):
        """The pure window kernel (cols, sel) -> [(vals, valid)] in
        arrival order — also the per-device body of the distributed
        window (parallel/pipeline.py: partition-key shuffle makes every
        partition device-local, then this runs unchanged per shard)."""
        node = self.node

        def run_fn(cols, sel):
            cap = sel.shape[0]
            keys = [
                (cols[k][0], cols[k][1], False, False)
                for k in node.partition_keys
            ] + [
                (cols[k.name][0], cols[k.name][1], k.descending,
                 k.nulls_first)
                for k in node.sort_keys]
            perm = sort_indices(keys, sel)
            n_valid = jnp.sum(sel.astype(jnp.int32))
            part_ops = _sorted_key_ops(
                cols, list(node.partition_keys), perm)
            order_ops = _sorted_key_ops(cols, list(node.sort_keys), perm)
            part_change = _changes(part_ops, cap)
            # no ORDER BY -> every partition row is a peer (SQL frame
            # semantics): default frames cover the whole partition
            peer_change = (_changes(order_ops, cap) if order_ops
                           else part_change)
            idx = jnp.arange(cap, dtype=jnp.int32)
            part_start = segment_starts(part_change)
            part_end = segment_ends(part_change, n_valid)
            peer_end = segment_ends(
                jnp.logical_or(part_change, peer_change), n_valid)

            results = []
            for spec in node.functions:
                results.append(self._eval_fn(
                    spec, cols, perm, idx, part_change, peer_change,
                    part_start, part_end, peer_end, n_valid))
            # scatter back to arrival order
            out = []
            for vals, valid in results:
                ov = jnp.zeros_like(vals).at[perm].set(vals)
                ova = (None if valid is None
                       else jnp.zeros((cap,), jnp.bool_)
                       .at[perm].set(valid))
                out.append((ov, ova))
            return out

        return run_fn

    def _eval_fn(self, spec, cols, perm, idx, part_change, peer_change,
                 part_start, part_end, peer_end, n_valid):
        fn = spec.fn
        cap = idx.shape[0]
        if fn == "row_number":
            return row_numbers(part_change), None
        if fn in ("rank", "dense_rank"):
            r, d = ranks(part_change, peer_change)
            return (r if fn == "rank" else d), None
        if fn == "percent_rank":
            r, _ = ranks(part_change, peer_change)
            n = (part_end - part_start).astype(jnp.float64)
            return jnp.where(
                n > 1, (r - 1).astype(jnp.float64) / jnp.maximum(n - 1, 1),
                0.0), None
        if fn == "cume_dist":
            n = (part_end - part_start).astype(jnp.float64)
            return ((peer_end - part_start).astype(jnp.float64)
                    / jnp.maximum(n, 1)), None
        if fn == "ntile":
            k = int(spec.arg_literal)
            rn = row_numbers(part_change) - 1
            n = (part_end - part_start).astype(jnp.int64)
            size = n // k
            rem = n % k
            cut = rem * (size + 1)
            bucket = jnp.where(
                rn < cut,
                rn // jnp.maximum(size + 1, 1),
                rem + (rn - cut) // jnp.maximum(size, 1))
            return bucket + 1, None

        # value functions need the sorted argument column
        if spec.arg is not None:
            av, ava = cols[spec.arg]
            sv = jnp.take(av, perm, mode="clip")
            sva = (None if ava is None
                   else jnp.take(ava, perm, mode="clip"))
        else:
            sv = sva = None

        # explicit frame: ROWS [row-lo, row+hi] clamped to the
        # partition (one global prefix-sum difference — velox kRows,
        # exec/WindowFunction.h FrameType), or RANGE/k-range bounds by
        # ORDER-BY value (velox/exec/window/KRangeFrameBound.h) found by
        # a vectorized in-partition binary search over the sorted order
        # column — the natural fit for the sort-based window design.
        if spec.frame is not None:
            if fn not in ("sum", "count", "avg", "min", "max",
                          "first_value", "last_value", "nth_value"):
                raise NotImplementedError(
                    f"frame for window function {fn}")
            lo, hi = spec.frame
            if getattr(spec, "frame_type", "rows") == "range":
                # value bounds come from the FIRST sort key (the SQL
                # one-sort-key rule relaxed: trailing keys only break
                # ties, which the value-range bsearch already spans)
                sk = self.node.sort_keys[0]
                okv, okva = cols[sk.name]
                ov = jnp.take(okv, perm, mode="clip")
                if sk.descending:
                    ov = -ov
                start = (part_start if lo is None else _part_bsearch(
                    ov, part_start, part_end,
                    ov - jnp.asarray(lo, ov.dtype), "left", cap))
                end = (part_end if hi is None else _part_bsearch(
                    ov, part_start, part_end,
                    ov + jnp.asarray(hi, ov.dtype), "right", cap))
            else:
                start = (part_start if lo is None
                         else jnp.maximum(idx - int(lo), part_start))
                end = (part_end if hi is None
                       else jnp.minimum(idx + int(hi) + 1, part_end))
            end = jnp.maximum(end, start)
            if fn in ("min", "max"):
                m = jnp.ones((cap,), jnp.bool_) if sva is None else sva
                if jnp.issubdtype(sv.dtype, jnp.floating):
                    big = jnp.finfo(sv.dtype).max
                    small = -big
                else:
                    big = jnp.iinfo(sv.dtype).max
                    small = jnp.iinfo(sv.dtype).min
                ident = big if fn == "min" else small
                op = jnp.minimum if fn == "min" else jnp.maximum
                v = jnp.where(m, sv, ident)
                vals = _frame_minmax(v, start, end, op, ident, cap)

                def pref(x):
                    return jnp.concatenate(
                        [jnp.zeros((1,), x.dtype), jnp.cumsum(x)])

                cnt = pref(m.astype(jnp.int64))
                c_at = (jnp.take(cnt, end, mode="clip")
                        - jnp.take(cnt, start, mode="clip"))
                return vals, c_at > 0
            if fn in ("first_value", "last_value", "nth_value"):
                nonempty = end > start
                if fn == "first_value":
                    pos = start
                elif fn == "last_value":
                    pos = jnp.maximum(end - 1, 0)
                else:
                    pos = start + jnp.int32(int(spec.arg_literal)) - 1
                    nonempty = jnp.logical_and(nonempty, pos < end)
                pos = jnp.clip(pos, 0, cap - 1)
                vals = jnp.take(sv, pos, mode="clip")
                valid = nonempty
                if sva is not None:
                    valid = jnp.logical_and(
                        valid, jnp.take(sva, pos, mode="clip"))
                return vals, valid
            m = jnp.ones((cap,), jnp.bool_) if sv is None else (
                jnp.ones((cap,), jnp.bool_) if sva is None else sva)

            def pref(x):
                return jnp.concatenate(
                    [jnp.zeros((1,), x.dtype), jnp.cumsum(x)])

            cnt = pref(m.astype(jnp.int64))
            c_at = (jnp.take(cnt, end, mode="clip")
                    - jnp.take(cnt, start, mode="clip"))
            if fn == "count":
                return c_at, None
            dt = jnp.float64 if jnp.issubdtype(
                sv.dtype, jnp.floating) else jnp.int64
            ps = pref(jnp.where(m, sv, 0).astype(dt))
            s_at = (jnp.take(ps, end, mode="clip")
                    - jnp.take(ps, start, mode="clip"))
            if fn == "sum":
                return s_at, c_at > 0
            return (s_at.astype(jnp.float64)
                    / jnp.maximum(c_at, 1).astype(jnp.float64),
                    c_at > 0)

        if fn in ("lead", "lag"):
            off = int(spec.arg_literal or 1)
            tgt = idx + off if fn == "lead" else idx - off
            in_part = jnp.logical_and(
                tgt >= part_start, tgt < part_end)
            vals = jnp.take(sv, jnp.clip(tgt, 0, cap - 1), mode="clip")
            valid = in_part
            if sva is not None:
                valid = jnp.logical_and(valid, jnp.take(
                    sva, jnp.clip(tgt, 0, cap - 1), mode="clip"))
            return vals, valid
        if fn == "first_value":
            vals = jnp.take(sv, part_start, mode="clip")
            valid = (None if sva is None
                     else jnp.take(sva, part_start, mode="clip"))
            return vals, valid
        if fn == "last_value":
            # default frame ends at current peer group
            pos = jnp.maximum(peer_end - 1, 0)
            vals = jnp.take(sv, pos, mode="clip")
            valid = None if sva is None else jnp.take(sva, pos, mode="clip")
            return vals, valid
        if fn == "nth_value":
            nth = int(spec.arg_literal)
            pos = part_start + nth - 1
            in_frame = pos < peer_end
            vals = jnp.take(sv, jnp.clip(pos, 0, cap - 1), mode="clip")
            valid = in_frame
            if sva is not None:
                valid = jnp.logical_and(valid, jnp.take(
                    sva, jnp.clip(pos, 0, cap - 1), mode="clip"))
            return vals, valid

        # aggregate-as-window, default frame (running to current peers):
        # segmented inclusive scan, read at peer-group end
        # (velox/exec/window/AggregateWindow.h incremental-frame analog)
        pos = jnp.maximum(peer_end - 1, 0)
        if fn == "count":
            if sv is None:
                c = segmented_cumsum(
                    jnp.ones((cap,), jnp.int64), part_change)
            else:
                m = jnp.ones((cap,), jnp.bool_) if sva is None else sva
                c = segmented_cumsum(m.astype(jnp.int64), part_change)
            return jnp.take(c, pos, mode="clip"), None
        if fn in ("sum", "avg"):
            m = jnp.ones((cap,), jnp.bool_) if sva is None else sva
            dt = jnp.float64 if jnp.issubdtype(
                sv.dtype, jnp.floating) else jnp.int64
            s = segmented_cumsum(
                jnp.where(m, sv, 0).astype(dt), part_change)
            c = segmented_cumsum(m.astype(jnp.int64), part_change)
            s_at = jnp.take(s, pos, mode="clip")
            c_at = jnp.take(c, pos, mode="clip")
            if fn == "sum":
                return s_at, c_at > 0
            return (s_at.astype(jnp.float64)
                    / jnp.maximum(c_at, 1).astype(jnp.float64),
                    c_at > 0)
        if fn in ("min", "max"):
            big = (jnp.finfo(sv.dtype).max
                   if jnp.issubdtype(sv.dtype, jnp.floating)
                   else jnp.iinfo(sv.dtype).max)
            ident = big if fn == "min" else (
                -big if jnp.issubdtype(sv.dtype, jnp.floating)
                else jnp.iinfo(sv.dtype).min)
            m = jnp.ones((cap,), jnp.bool_) if sva is None else sva
            v = jnp.where(m, sv, ident)
            op = jnp.minimum if fn == "min" else jnp.maximum
            s = segmented_scan(v, part_change, op)
            c = segmented_cumsum(m.astype(jnp.int64), part_change)
            return (jnp.take(s, pos, mode="clip"),
                    jnp.take(c, pos, mode="clip") > 0)
        raise NotImplementedError(f"window function {fn}")

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted


class StreamingWindowOp(WindowOp):
    """velox/exec/window/RowsStreamingWindowBuild.h analog: input is
    CLUSTERED by the partition keys (optimizer-verified), so complete
    partitions evaluate and emit per input batch; only the trailing
    (possibly incomplete) partition carries across batches. Peak memory
    is one batch + one partition instead of the whole input."""

    blocking = False

    def __init__(self, node):
        super().__init__(node)
        self._carry: Optional[Batch] = None
        self._queue: collections.deque = collections.deque()
        self._split_jit = None

    def _split_fn(self):
        pkeys = list(self.node.partition_keys)

        def split(cols, sel):
            from velox_tpu.ops.sort import pack_indices
            from velox_tpu.ops.sortkey import encode_sort_key

            cap = sel.shape[0]
            pk = pack_indices(sel)
            n = jnp.sum(sel.astype(jnp.int32))
            ops = []
            for k in pkeys:
                v, vd = cols[k]
                for o in encode_sort_key(v, vd):
                    ops.append(jnp.take(o, pk, mode="clip"))
            change = jnp.zeros((cap,), jnp.bool_)
            for o in ops:
                change = jnp.logical_or(change, jnp.concatenate(
                    [jnp.zeros((1,), jnp.bool_), o[1:] != o[:-1]]))
            r = jnp.arange(cap, dtype=jnp.int32)
            change = jnp.logical_and(change, r < n)
            # start of the LAST partition among packed rows
            last_start = jnp.max(jnp.where(change, r, 0))
            return pk, last_start, n

        return split

    def add_input(self, batch: Batch) -> None:
        big = (concat_batches([self._carry, batch])
               if self._carry is not None else batch)
        cols = _cols_of(big, list(self.node.partition_keys))
        if self._split_jit is None:
            self._split_jit = cached_jit(
                ("swindow_split", self.node.id), self._split_fn)
        pk, last_start, n = self._split_jit(cols, big.sel)
        # one host sync: (complete row count, total) — the task barrier
        from velox_tpu.utils.replay import fetch_np as _fetch_np

        meta = _fetch_np("swindow_meta", jnp.stack([last_start, n]))
        complete, total = int(meta[0]), int(meta[1])
        from velox_tpu.vector.batch import round_capacity as _rc

        if complete > 0:
            cap_c = _rc(complete)
            idx = pk[:cap_c]
            selc = jnp.arange(cap_c, dtype=jnp.int32) < complete
            done = big.gather(idx, selc, complete)
            self._queue.append(self._evaluate(done))
        tail = total - complete
        cap_t = _rc(max(tail, 1))
        tidx = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([pk, jnp.full((cap_t,), big.capacity,
                                          jnp.int32)]),
            complete, cap_t)
        selt = jnp.arange(cap_t, dtype=jnp.int32) < tail
        self._carry = (big.gather(tidx, selt, tail)
                       if tail > 0 else None)

    def get_output(self) -> Optional[Batch]:
        if self._queue:
            return self._queue.popleft()
        if self.no_more_input_seen and not self._emitted:
            self._emitted = True
            if self._carry is not None:
                out = self._evaluate(self._carry)
                self._carry = None
                return out
        return None

    def is_finished(self) -> bool:
        return (self.no_more_input_seen and not self._queue
                and self._emitted)


class RowNumberOp(Operator):
    """velox/exec/RowNumber.h:27 — partition row numbering (arrival
    order preserved by the stable sort)."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._buffer = SpillableBuffer("row_number")
        self._emitted = False

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def _rn(self, big: Batch, partition_keys, sort_keys):
        cols = _cols_of(big, list(dict.fromkeys(
            list(partition_keys) + [k.name for k in sort_keys])))

        def make():
            def run(cols, sel):
                cap = sel.shape[0]
                keys = [
                    (cols[k][0], cols[k][1], False, False)
                    for k in partition_keys
                ] + [
                    (cols[k.name][0], cols[k.name][1], k.descending,
                     k.nulls_first) for k in sort_keys]
                perm = sort_indices(keys, sel)
                part_ops = _sorted_key_ops(
                    cols, list(partition_keys), perm)
                part_change = _changes(part_ops, cap)
                rn_sorted = row_numbers(part_change)
                return jnp.zeros((cap,), jnp.int64).at[perm].set(rn_sorted)
            return run

        run = cached_jit(("row_number", self.node.id), make)
        return run(cols, big.sel)

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        batches = self._buffer.drain()
        if not batches:
            return None
        big = concat_batches(batches)
        node = self.node
        sort_keys = getattr(node, "sort_keys", ())
        rn = self._rn(big, node.partition_keys, sort_keys)
        sel = big.sel
        if node.limit is not None:
            sel = jnp.logical_and(sel, rn <= node.limit)
        out = big.with_sel(sel)
        if node.row_number_name is not None:
            out = out.with_column(
                node.row_number_name, Column(BIGINT, rn))
        return out

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted


class TopNRowNumberOp(RowNumberOp):
    """velox/exec/TopNRowNumber.h:79 — top-N rows per partition."""

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        batches = self._buffer.drain()
        if not batches:
            return None
        big = concat_batches(batches)
        node = self.node
        rn = self._rn(big, node.partition_keys, node.sort_keys)
        sel = jnp.logical_and(big.sel, rn <= node.limit)
        out = big.with_sel(sel)
        if node.row_number_name is not None:
            out = out.with_column(
                node.row_number_name, Column(BIGINT, rn))
        return out


class MarkDistinctOp(Operator):
    """velox/core/PlanNode.h:5638 — boolean marker on first occurrence."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._buffer = SpillableBuffer("mark_distinct")
        self._emitted = False

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch)

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        batches = self._buffer.drain()
        if not batches:
            return None
        big = concat_batches(batches)
        node = self.node
        cols = _cols_of(big, list(node.keys))

        def make():
            def run(cols, sel):
                cap = sel.shape[0]
                pairs = [cols[k] for k in node.keys]
                _, group_rows, group_sel, _ = group_ids_sorted(pairs, sel)
                return (jnp.zeros((cap,), jnp.bool_)
                        .at[jnp.where(group_sel, group_rows, cap)]
                        .set(True, mode="drop"))
            return run

        marker = cached_jit(("mark_distinct", self.node.id), make)(
            cols, big.sel)
        from velox_tpu.types import BOOLEAN

        return big.with_column(node.marker, Column(BOOLEAN, marker))

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted


class ExpandOp(Operator):
    """velox/core/PlanNode.h:1913 — each row -> N projected rows (one
    output batch per projection list)."""

    def __init__(self, node):
        super().__init__(node)
        self._evals = [
            ExprEvaluator(list(projs), node.source.output_type)
            for projs in node.projections]
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        for ev in self._evals:
            pairs, dicts = ev.project_pairs(batch)
            cols = {}
            for name, dtype, pair, d in zip(
                    self.node.names, self.output_type.children, pairs,
                    dicts):
                vals, valid = pair
                cols[name] = Column(dtype, vals, valid, d)
            self._queue.append(Batch(cols, batch.sel))

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


class GroupIdOp(Operator):
    """velox/core/PlanNode.h:2018 — GROUPING SETS expansion: one output
    batch per grouping set, absent keys nulled, plus a group_id column."""

    def __init__(self, node):
        super().__init__(node)
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        from velox_tpu.types import BIGINT

        all_keys = set()
        for gs in self.node.grouping_sets:
            all_keys.update(gs)
        for set_id, gs in enumerate(self.node.grouping_sets):
            cols = {}
            for n, t in zip(self.output_type.names,
                            self.output_type.children):
                if n == self.node.group_id_name:
                    cols[n] = Column(
                        BIGINT,
                        jnp.full((batch.capacity,), set_id, jnp.int64))
                elif n in all_keys and n not in gs:
                    src = batch.column(n)
                    cols[n] = Column(
                        src.dtype, src.values,
                        jnp.zeros((batch.capacity,), jnp.bool_),
                        src.dictionary)
                else:
                    cols[n] = batch.column(n)
            self._queue.append(Batch(cols, batch.sel))

    def get_output(self):
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


class UnnestOp(Operator):
    """velox/exec/Unnest.h:25 — explode ARRAY columns into one row per
    element, replicating the scalar columns.

    TPU-native design: no per-row loop. The output row -> input row map is
    built with the scatter + max-scan trick (also used by join match
    expansion, velox_tpu/ops/join.py expand_matches): scatter each input
    row's index at its first output slot (exclusive cumsum of lengths),
    propagate with an associative max-scan, and gather everything else.
    With several unnest columns the per-row count is the max length and
    shorter arrays pad with nulls (velox/exec/Unnest.cpp:119 semantics);
    null or empty arrays emit zero rows.
    """

    def __init__(self, node):
        super().__init__(node)
        self._queue: collections.deque = collections.deque()

    def _make_step(self, outcap: int, n_unnest: int, has_ord: bool):
        def step(rep, arrs, sel):
            cap = sel.shape[0]
            lens = None
            for starts, lengths, avalid, _, _ in arrs:
                l = jnp.where(sel, lengths, 0)
                if avalid is not None:
                    l = jnp.where(avalid, l, 0)
                lens = l if lens is None else jnp.maximum(lens, l)
            lens = lens.astype(jnp.int32)
            out_pos = jnp.cumsum(lens) - lens            # exclusive
            total = out_pos[-1] + lens[-1]
            rows = jnp.arange(cap, dtype=jnp.int32)
            pos = jnp.where(lens > 0, out_pos, outcap)   # empty rows drop
            heads = jnp.zeros((outcap,), jnp.int32).at[pos].max(
                rows + 1, mode="drop")
            row_of = jnp.maximum(
                jax.lax.associative_scan(jnp.maximum, heads) - 1, 0)
            out_sel = jnp.arange(outcap, dtype=jnp.int32) < total
            rank = (jnp.arange(outcap, dtype=jnp.int32)
                    - jnp.take(out_pos, row_of, mode="clip"))
            rep_out = []
            for vals, valid in rep:
                rep_out.append((
                    jnp.take(vals, row_of, mode="clip"),
                    jnp.take(valid, row_of, mode="clip")
                    if valid is not None else None))
            elem_out = []
            for starts, lengths, _, evals, evalid in arrs:
                in_len = rank < jnp.take(lengths, row_of, mode="clip")
                eidx = jnp.clip(
                    jnp.take(starts, row_of, mode="clip") + rank,
                    0, evals.shape[0] - 1)
                mask = in_len
                if evalid is not None:
                    mask = jnp.logical_and(mask, jnp.take(evalid, eidx))
                elem_out.append((jnp.take(evals, eidx), mask))
            ord_out = ((rank + 1).astype(jnp.int64) if has_ord else None)
            return rep_out, elem_out, ord_out, out_sel
        return step

    def add_input(self, batch: Batch) -> None:
        from velox_tpu.vector.batch import round_capacity
        from velox_tpu.vector.column import ArrayColumn

        node = self.node
        acols = [batch.column(n) for n in node.unnest]
        for a in acols:
            assert isinstance(a, ArrayColumn), (
                f"unnest input {node.unnest} must be ARRAY columns")
            assert isinstance(a.elements, Column), (
                "nested ARRAY unnest not supported")
        outcap = round_capacity(sum(a.elements.capacity for a in acols))
        has_ord = node.ordinality is not None
        key = ("unnest", node.id, batch.capacity, outcap,
               tuple((c.valid is not None) for c in acols),
               tuple(batch.column(n).valid is not None
                     for n in node.replicated),
               tuple(a.elements.valid is not None for a in acols))
        step = cached_jit(
            key, lambda: self._make_step(outcap, len(acols), has_ord))
        rep = [(batch.column(n).values, batch.column(n).valid)
               for n in node.replicated]
        arrs = [(a.starts, a.lengths, a.valid,
                 a.elements.values, a.elements.valid) for a in acols]
        rep_out, elem_out, ord_out, out_sel = step(rep, arrs, batch.sel)

        out_types = dict(zip(self.output_type.names,
                             self.output_type.children))
        cols = {}
        for n, (vals, valid) in zip(node.replicated, rep_out):
            src = batch.column(n)
            cols[n] = Column(out_types[n], vals, valid, src.dictionary,
                             src.stats)
        for n, a, (vals, mask) in zip(node.unnest, acols, elem_out):
            # single unnest column + non-null elements: rank < length holds
            # on every selected row, so the mask is redundant with sel —
            # skip it (no host sync). Multi-column max-length padding and
            # null elements need the real mask.
            valid = (None if len(acols) == 1
                     and a.elements.valid is None else mask)
            cols[n] = Column(out_types[n], vals, valid,
                             a.elements.dictionary)
        if node.ordinality is not None:
            cols[node.ordinality] = Column(out_types[node.ordinality],
                                           ord_out)
        self.stats.input_batches += 1
        self._queue.append(Batch(cols, out_sel))

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


class LocalPartitionOp(Operator):
    """velox/exec/LocalPartition.h:153 — in-task repartition/gather.

    The serial Task runs one driver per pipeline, so the local exchange
    degenerates to an identity pass-through; the real repartition lives in
    velox_tpu/parallel/shuffle.hash_repartition (device all_to_all), which
    the distributed runner substitutes for this node over a mesh.
    """

    def __init__(self, node):
        super().__init__(node)
        self._queue: collections.deque = collections.deque()

    def add_input(self, batch: Batch) -> None:
        self._queue.append(batch)

    def get_output(self) -> Optional[Batch]:
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return self.no_more_input_seen and not self._queue


class TableWriteOp(Operator):
    """velox/exec/TableWriter.h:170 — file sink. Batches stream off the
    device through the arrow bridge; pyarrow writes parquet (optionally
    hive-partitioned key=value/ directories, HiveDataSink.h:406
    partitioned-write analog). Emits one ROW<rows BIGINT> summary row."""

    blocking = True

    def __init__(self, node):
        super().__init__(node)
        self._tables: List = []
        self._emitted = False

    def add_input(self, batch: Batch) -> None:
        from velox_tpu.vector.arrow_bridge import to_arrow

        self._tables.append(to_arrow(batch))
        self.stats.input_batches += 1

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        import pyarrow as pa

        node = self.node
        assert node.format == "parquet", f"unsupported sink {node.format}"
        if self._tables:
            table = pa.concat_tables(self._tables)
        else:
            from velox_tpu.vector.arrow_bridge import type_to_arrow

            src = node.source.output_type
            table = pa.table({
                n: pa.array([], type_to_arrow(t))
                for n, t in zip(src.names, src.children)})
        if getattr(node, "scale_writers", 1) > 1:
            from velox_tpu.exec.scale_writer import scaled_write
            from velox_tpu.utils.config import config

            self.stats.runtime["files_written"] = scaled_write(
                table, node.path, list(node.partition_by),
                node.scale_writers, config.writer_min_partition_bytes)
        elif node.partition_by:
            import pyarrow.dataset as ds

            ds.write_dataset(
                table, node.path, format="parquet",
                partitioning=ds.partitioning(
                    table.schema.empty_table().select(
                        list(node.partition_by)).schema, flavor="hive"),
                existing_data_behavior="overwrite_or_ignore")
        else:
            import pyarrow.parquet as pq

            pq.write_table(table, node.path)
        self._emitted = True
        self.stats.output_batches += 1
        return Batch.from_pydict(
            {"rows": [table.num_rows]}, {"rows": BIGINT})

    def is_finished(self) -> bool:
        return self._emitted


class UnionBridge:
    """Buffered batches from the non-first union/merge sources (the
    JoinBridge pattern applied to MixedUnion, velox/exec/JoinBridge.h)."""

    def __init__(self):
        self.batches: List[Batch] = []


class UnionSinkOp(Operator):
    """Sink pipeline terminal for sources[1:] of a union/merge."""

    blocking = True

    def __init__(self, node, bridge: UnionBridge):
        super().__init__(node)
        self.bridge = bridge

    def add_input(self, batch: Batch) -> None:
        self.bridge.batches.append(batch)

    def get_output(self) -> Optional[Batch]:
        return None

    def is_finished(self) -> bool:
        return self.no_more_input_seen


class UnionAllOp(Operator):
    """velox MixedUnion: buffer the first source, then at drain combine
    with the sibling pipelines' bridged batches (they ran to completion
    first — pipeline creation order is topological). Before emitting,
    string columns whose branches carry DIFFERENT dictionaries (e.g.
    per-branch constant channel labels) are re-encoded onto one merged
    sorted dictionary, so streaming consumers downstream (aggregation
    key capture, sort ranks) see a single dictionary — velox wraps a
    dictionary layer per branch instead."""

    def __init__(self, node, bridge: UnionBridge):
        super().__init__(node)
        self.bridge = bridge
        self._drained = False
        self._queue: collections.deque = collections.deque()
        self._names = list(node.output_type.names)

    def add_input(self, batch: Batch) -> None:
        self._queue.append(batch.project(self._names))

    def get_output(self) -> Optional[Batch]:
        if self.no_more_input_seen and not self._drained:
            self._drained = True
            from velox_tpu.vector.batch import harmonize_dictionaries

            batches = list(self._queue) + [
                b.project(self._names) for b in self.bridge.batches]
            self._queue = collections.deque(
                harmonize_dictionaries(batches))
        if not self._drained:
            return None
        return self._queue.popleft() if self._queue else None

    def is_finished(self) -> bool:
        return (self.no_more_input_seen and self._drained
                and not self._queue)


class LocalMergeOp(Operator):
    """velox/exec/Merge.h:33 k-way ordered merge — on TPU the union of
    the (already sorted) streams goes through ONE bitonic sort, which is
    the merge network the hardware actually has."""

    blocking = True

    def __init__(self, node, bridge: UnionBridge):
        super().__init__(node)
        self.bridge = bridge
        self._buffer = SpillableBuffer("local_merge")
        self._emitted = False
        self._names = list(node.output_type.names)

    def add_input(self, batch: Batch) -> None:
        self._buffer.append(batch.project(self._names))

    def get_output(self) -> Optional[Batch]:
        if not self.no_more_input_seen or self._emitted:
            return None
        self._emitted = True
        batches = (self._buffer.drain()
                   + [b.project(self._names) for b in self.bridge.batches])
        if not batches:
            return None
        big = concat_batches(batches)
        spec = [(k.name, k.descending, k.nulls_first)
                for k in self.node.keys]

        def make():
            def run(cols, sel):
                keys = [(cols[n][0], cols[n][1], d, nf)
                        for n, d, nf in spec]
                perm = sort_indices(keys, sel)
                return perm, jnp.take(sel, perm, mode="clip")
            return run

        run = cached_jit(("local_merge", self.node.id), make)
        from velox_tpu.exec.operators import _cols_of as _cols

        perm, sel_sorted = run(
            _cols(big, [k.name for k in self.node.keys]), big.sel)
        return big.gather(perm, sel_sorted, big.num_rows)

    def is_finished(self) -> bool:
        return self.no_more_input_seen and self._emitted
