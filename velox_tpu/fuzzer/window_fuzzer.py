"""Window fuzzer: random functions x random frames vs an exact
row-by-row python oracle (velox/exec/fuzzer/WindowFuzzer.cpp analog —
there the oracle is DuckDB/Presto; here frames are small enough to
evaluate literally)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE
from velox_tpu.vector.batch import Batch

_FNS = ["row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
        "sum", "count", "avg", "min", "max", "first_value", "last_value",
        "lead", "lag"]
_FRAME_FNS = {"sum", "count", "avg", "min", "max", "first_value",
              "last_value"}


def _frame_text(rng):
    kind = str(rng.choice(["rows", "range"]))
    lo = rng.choice(["unbounded preceding", "current row", "k preceding"])
    hi = rng.choice(["unbounded following", "current row", "k following"])
    klo = int(rng.integers(0, 5))
    khi = int(rng.integers(0, 5))
    lo_t = str(lo).replace("k ", f"{klo} ")
    hi_t = str(hi).replace("k ", f"{khi} ")
    lo_v = None if "unbounded" in lo_t else (
        0 if "current" in lo_t else klo)
    hi_v = None if "unbounded" in hi_t else (
        0 if "current" in hi_t else khi)
    return (f" {kind.upper()} BETWEEN {lo_t} AND {hi_t}",
            kind, lo_v, hi_v)


def _oracle_frame(rows, i, kind, lo, hi, order_vals):
    """Index list of row i's frame inside its partition slice."""
    n = len(rows)
    if kind == "rows":
        s = 0 if lo is None else max(0, i - lo)
        e = n if hi is None else min(n, i + hi + 1)
        return rows[s:e] if e > s else []
    v = order_vals[i]
    out = []
    for j, ov in enumerate(order_vals):
        if lo is not None and ov < v - lo:
            continue
        if hi is not None and ov > v + hi:
            continue
        out.append(rows[j])
    return out


def run_window_fuzz(iterations: int = 40, seed: int = 0,
                    verbose: bool = False) -> None:
    rng = np.random.default_rng(seed)
    for i in range(iterations):
        if i and i % 15 == 0:
            import jax

            # every random plan compiles fresh XLA executables;
            # unbounded accumulation exhausts the process mmap
            # budget (LLVM 'Cannot allocate memory') long before
            # RAM — drop them periodically
            jax.clear_caches()
        n = int(rng.integers(8, 120))
        data = {
            "p": [int(v) for v in rng.integers(0, 4, n)],
            "o": [int(v) for v in rng.integers(0, 30, n)],
            "v": [float(np.round(v, 3)) for v in rng.normal(size=n)],
            "rid": list(range(n)),
        }
        fn = str(rng.choice(_FNS))
        framed = fn in _FRAME_FNS and bool(rng.random() < 0.6)
        frame_txt, kind, lo, hi = (
            _frame_text(rng) if framed else ("", None, None, None))
        if fn in ("row_number", "rank", "dense_rank", "percent_rank",
                  "cume_dist"):
            call = f"{fn}()"
        elif fn in ("lead", "lag"):
            call = f"{fn}(v, 1)"
        else:
            call = f"{fn}(v)"
        expr = f"{call}{frame_txt} as w"
        out = run_plan_pydict(
            PlanBuilder()
            .values([Batch.from_pydict(
                data, {"p": BIGINT, "o": BIGINT, "v": DOUBLE,
                       "rid": BIGINT})])
            .window(["p"], ["o", "rid"], [expr])
            .order_by(["rid"]).build())
        got = out["w"]

        # ---------------- literal python oracle
        import pandas as pd

        df = pd.DataFrame(data).sort_values(["p", "o", "rid"])
        exp = {}
        for _, part in df.groupby("p"):
            vals = part["v"].tolist()
            os_ = part["o"].tolist()
            rids = part["rid"].tolist()
            idxs = list(range(len(vals)))
            peers_end = {}
            for j in range(len(vals)):
                k = j
                while (k + 1 < len(vals)
                       and os_[k + 1] == os_[j]
                       and rids[k + 1] == rids[j]):
                    k += 1
                peers_end[j] = k
            for j, rid in enumerate(rids):
                if fn == "row_number":
                    exp[rid] = j + 1
                    continue
                if fn in ("rank", "dense_rank", "percent_rank",
                          "cume_dist"):
                    key = (os_[j], rids[j])
                    keys = [(o, r) for o, r in zip(os_, rids)]
                    lesser = sum(1 for kk in keys if kk < key)
                    if fn == "rank":
                        exp[rid] = lesser + 1
                    elif fn == "dense_rank":
                        exp[rid] = len({kk for kk in keys if kk < key}) + 1
                    elif fn == "percent_rank":
                        exp[rid] = (lesser / (len(keys) - 1)
                                    if len(keys) > 1 else 0.0)
                    else:
                        exp[rid] = (sum(1 for kk in keys if kk <= key)
                                    / len(keys))
                    continue
                if fn == "lead":
                    exp[rid] = vals[j + 1] if j + 1 < len(vals) else None
                    continue
                if fn == "lag":
                    exp[rid] = vals[j - 1] if j >= 1 else None
                    continue
                if framed:
                    fr = _oracle_frame(vals, j, kind, lo, hi, os_)
                else:
                    # default frame: partition start .. current peers
                    fr = vals[: peers_end[j] + 1]
                if fn == "count":
                    exp[rid] = len(fr)
                elif not fr:
                    exp[rid] = None
                elif fn == "sum":
                    exp[rid] = sum(fr)
                elif fn == "avg":
                    exp[rid] = sum(fr) / len(fr)
                elif fn == "min":
                    exp[rid] = min(fr)
                elif fn == "max":
                    exp[rid] = max(fr)
                elif fn == "first_value":
                    exp[rid] = fr[0]
                elif fn == "last_value":
                    exp[rid] = fr[-1]
        for rid in range(n):
            g, e = got[rid], exp[rid]
            if e is None:
                assert g is None or g == 0, (i, expr, rid, g, e)
            else:
                assert g is not None and abs(g - e) < 1e-9 + 1e-9 * abs(
                    e), (i, expr, rid, g, e)
        if verbose:
            print(f"iter {i}: {expr} ok")
