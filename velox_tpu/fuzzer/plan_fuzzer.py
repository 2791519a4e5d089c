"""Plan fuzzer: randomized scan/filter/join/aggregate plans vs pandas.

Analog of velox's JoinFuzzer + AggregationFuzzer
(velox/exec/fuzzer/JoinFuzzer.h, AggregationFuzzer.h): generate random
relational plans over random tables, execute through the engine, and
compare against an independently-computed pandas result with SQL null
semantics (null join keys never match; aggregates skip nulls).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch

_JOINS = ["inner", "left", "left_semi", "anti_simple"]
_AGGS = [("sum", "sum"), ("count", "count"), ("min", "min"),
         ("max", "max"), ("avg", "mean")]


def _table(rng, n, key_space, null_p):
    return {
        "k": [None if rng.random() < null_p else int(x)
              for x in rng.integers(0, key_space, n)],
        "v": [None if rng.random() < null_p else
              float(np.round(x, 3)) for x in rng.normal(size=n)],
        "g": [int(x) for x in rng.integers(0, 5, n)],
    }


def _batches(rng, data, types):
    """Split into 1-3 batches to exercise multi-split paths."""
    n = len(data["k"])
    cuts = sorted(rng.choice(range(1, n), size=int(rng.integers(0, 3)),
                             replace=False)) if n > 3 else []
    bounds = [0] + [int(c) for c in cuts] + [n]
    return [
        Batch.from_pydict(
            {c: data[c][lo:hi] for c in data}, types)
        for lo, hi in zip(bounds, bounds[1:])]


def run_plan_fuzz(iterations: int = 50, seed: int = 0,
                  verbose: bool = False) -> None:
    rng = np.random.default_rng(seed)
    types = {"k": BIGINT, "v": DOUBLE, "g": BIGINT}
    for i in range(iterations):
        if i and i % 15 == 0:
            import jax

            # every random plan compiles fresh XLA executables;
            # unbounded accumulation exhausts the process mmap
            # budget (LLVM 'Cannot allocate memory') long before
            # RAM — drop them periodically
            jax.clear_caches()
        nl = int(rng.integers(5, 120))
        nr = int(rng.integers(3, 60))
        ks = int(rng.integers(2, 40))
        left = _table(rng, nl, ks, float(rng.uniform(0, 0.3)))
        right = _table(rng, nr, ks, float(rng.uniform(0, 0.3)))
        jt = str(rng.choice(_JOINS))
        thresh = float(np.round(rng.normal(), 2))
        use_filter = rng.random() < 0.5
        agg_keyed = rng.random() < 0.6
        agg_fn, pd_fn = _AGGS[int(rng.integers(0, len(_AGGS)))]

        pb = PlanBuilder().values(_batches(rng, left, types))
        if use_filter:
            pb = pb.filter(f"v > {thresh}")
        rb = (PlanBuilder()
              .values(_batches(rng, right, types))
              .project(["k as rk", "v as rv"]))
        pb = pb.hash_join(rb, ["k"], ["rk"], jt)
        if agg_keyed:
            pb = pb.aggregate(["g"], [f"{agg_fn}(v) as a",
                                      "count(*) as c"])
        else:
            pb = pb.aggregate([], [f"{agg_fn}(v) as a", "count(*) as c"])
        got = run_plan_pydict(pb.build())
        # ---------------- pandas oracle with SQL null-join semantics
        ldf = pd.DataFrame(left)
        rdf = pd.DataFrame(right).rename(
            columns={"k": "rk", "v": "rv"})[["rk", "rv"]]
        if use_filter:
            ldf = ldf[ldf["v"] > thresh]
        lnn = ldf[ldf["k"].notna()]
        rnn = rdf[rdf["rk"].notna()]
        if jt == "inner":
            j = lnn.merge(rnn, left_on="k", right_on="rk")
        elif jt == "left":
            matched = lnn.merge(rnn, left_on="k", right_on="rk")
            unmatched = ldf[~ldf.index.isin(
                lnn[lnn["k"].isin(rnn["rk"])].index)].copy()
            unmatched["rk"] = np.nan
            unmatched["rv"] = np.nan
            j = pd.concat([matched, unmatched], ignore_index=True)
        elif jt == "left_semi":
            j = ldf[ldf["k"].isin(set(rnn["rk"]))]
        else:  # anti_simple (NOT EXISTS)
            j = ldf[~ldf["k"].isin(set(rnn["rk"]))]

        if agg_keyed:
            if len(j):
                orc = j.groupby("g").agg(
                    a=("v", pd_fn), c=("v", "size")).reset_index()
            else:
                orc = pd.DataFrame({"g": [], "a": [], "c": []})
            gd = pd.DataFrame(got).sort_values("g").reset_index(drop=True)
            od = orc.sort_values("g").reset_index(drop=True)
            assert gd["g"].tolist() == od["g"].astype(int).tolist(), \
                _fail(i, jt, use_filter, agg_fn, got, orc)
            assert gd["c"].tolist() == od["c"].astype(int).tolist(), \
                _fail(i, jt, use_filter, agg_fn, got, orc)
            _close(gd["a"], od["a"], (i, jt, use_filter, agg_fn))
        else:
            exp_c = len(j)
            assert got["c"] == [exp_c], \
                _fail(i, jt, use_filter, agg_fn, got, exp_c)
            exp_a = getattr(j["v"], pd_fn)() if len(j) else None
            ga = got["a"][0]
            if exp_a is None or (isinstance(exp_a, float)
                                 and np.isnan(exp_a)):
                if agg_fn == "count":
                    assert ga == 0
                else:
                    assert ga is None, (i, jt, ga)
            elif agg_fn == "count":
                assert ga == int(exp_a)
            else:
                assert abs(ga - exp_a) < 1e-9 + 1e-9 * abs(exp_a), \
                    (i, jt, ga, exp_a)
        if verbose:
            print(f"iter {i}: {jt} filter={use_filter} {agg_fn} ok")


def _close(a, b, ctx):
    av = a.to_numpy(dtype=float)
    bv = b.to_numpy(dtype=float)
    both_nan = np.isnan(av) & np.isnan(bv)
    ok = both_nan | (np.abs(av - bv) < 1e-9 + 1e-9 * np.abs(bv))
    assert ok.all(), (ctx, av[~ok], bv[~ok])


def _fail(i, jt, f, agg, got, exp):
    return f"iter {i}: join={jt} filter={f} agg={agg}\ngot={got}\nexp={exp}"
