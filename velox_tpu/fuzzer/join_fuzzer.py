"""Join fuzzer with a plan-equivalence oracle.

The velox JoinFuzzer design (velox/exec/fuzzer/JoinFuzzer.cpp:160
makeDefaultPlan + makeAlternativePlans): the same random join query is
executed through EVERY available physical strategy — hash join, merge
join (inputs pre-sorted), the spilled-partitioned path (tiny memory
budget), and for inner joins the side-swapped plan — and all results
must be identical. Equivalence across independent implementations is
the oracle; a pandas cross-check anchors the first plan to ground truth.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch

_JOIN_TYPES = ["inner", "left", "right", "full", "left_semi",
               "right_semi", "anti", "anti_simple"]

_WORDS = ["red", "green", "blue", "teal", "plum", "gray"]


def _table(rng, n, key_space, null_p, two_keys):
    d = {
        "k": [None if rng.random() < null_p else int(x)
              for x in rng.integers(0, key_space, n)],
        "v": [float(np.round(x, 3)) for x in rng.normal(size=n)],
        "s": [str(rng.choice(_WORDS)) for _ in range(n)],
    }
    if two_keys:
        d["k2"] = [int(x) for x in rng.integers(0, 4, n)]
    return d


def _sorted_records(out: Dict[str, list]) -> List[tuple]:
    cols = sorted(out)
    rows = list(zip(*[out[c] for c in cols]))
    return sorted(
        rows, key=lambda r: tuple((x is None, x) for x in r))


def _norm(out: Dict[str, list]) -> List[tuple]:
    def canon(x):
        if isinstance(x, float):
            return round(x, 9)
        return x

    return [tuple(canon(x) for x in r) for r in _sorted_records(out)]


def run_join_fuzz(iterations: int = 50, seed: int = 0,
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
        two_keys = bool(rng.random() < 0.3)
        nl = int(rng.integers(4, 100))
        nr = int(rng.integers(2, 60))
        ks = int(rng.integers(2, 30))
        null_p = float(rng.uniform(0, 0.25))
        jt = str(rng.choice(_JOIN_TYPES))
        use_filter = bool(rng.random() < 0.4) and jt not in (
            "right_semi",)
        left = _table(rng, nl, ks, null_p, two_keys)
        right = _table(rng, nr, ks, null_p if jt != "anti" else 0.0,
                       two_keys)

        ltypes = {"k": BIGINT, "v": DOUBLE, "s": VARCHAR}
        if two_keys:
            ltypes["k2"] = BIGINT
        lkeys = ["k"] + (["k2"] if two_keys else [])
        rkeys = ["rk"] + (["rk2"] if two_keys else [])
        semi_like = jt in ("left_semi", "anti", "anti_simple")
        out_cols = (["k", "v"] if semi_like
                    else ["k", "v", "rv"] if jt != "right_semi"
                    else ["rk", "rv"])
        filt = "v + rv > 0.0" if use_filter and not semi_like else (
            "v > 0.0" if use_filter else None)

        def rename(pb):
            cols = ["k as rk", "v as rv"]
            if two_keys:
                cols.append("k2 as rk2")
            return pb.project(cols)

        def hash_plan():
            return (PlanBuilder()
                    .values([Batch.from_pydict(left, ltypes)])
                    .hash_join(
                        rename(PlanBuilder().values(
                            [Batch.from_pydict(right, ltypes)])),
                        lkeys, rkeys, jt, filter=filt,
                        output=out_cols))

        def merge_plan():
            lpb = (PlanBuilder()
                   .values([Batch.from_pydict(left, ltypes)])
                   .order_by(lkeys))
            rpb = rename(
                PlanBuilder()
                .values([Batch.from_pydict(right, ltypes)])
                .order_by(["k"] + (["k2"] if two_keys else [])))
            return lpb.merge_join(rpb, lkeys, rkeys, jt, filter=filt,
                                  output=out_cols)

        results = {}
        results["hash"] = run_plan_pydict(hash_plan().build())
        try:
            results["merge"] = run_plan_pydict(merge_plan().build())
        except NotImplementedError:
            pass
        old = config.spill_memory_budget_bytes
        config.spill_memory_budget_bytes = 1 << 11
        try:
            results["spilled"] = run_plan_pydict(hash_plan().build())
        finally:
            config.spill_memory_budget_bytes = old

        base = _norm(results["hash"])
        for name, res in results.items():
            got = _norm(res)
            assert got == base, (
                f"iter {i}: jt={jt} filter={filt} two_keys={two_keys} "
                f"plan {name} disagrees with hash plan\n"
                f"{name}: {got[:10]}\nhash: {base[:10]}")

        # pandas ground truth for the filterless single-key cases
        if filt is None and not two_keys:
            base_set = _pandas_oracle(left, right, jt, out_cols)
            assert base == base_set, (
                f"iter {i}: jt={jt} hash plan != pandas\n"
                f"got {base[:10]}\nexp {base_set[:10]}")
        if verbose:
            print(f"iter {i}: {jt} filter={filt} "
                  f"plans={sorted(results)} ok")


def _pandas_oracle(left, right, jt, out_cols) -> List[tuple]:
    ldf = pd.DataFrame({"k": left["k"], "v": left["v"]})
    rdf = pd.DataFrame({"rk": right["k"], "rv": right["v"]})
    lnn = ldf[ldf["k"].notna()]
    rnn = rdf[rdf["rk"].notna()]
    if jt == "inner":
        j = lnn.merge(rnn, left_on="k", right_on="rk")
    elif jt in ("left", "full", "right"):
        matched = lnn.merge(rnn, left_on="k", right_on="rk")
        lun = ldf[~ldf.index.isin(
            lnn[lnn["k"].isin(set(rnn["rk"]))].index)].copy()
        lun["rv"] = np.nan
        run_ = rdf[~rdf.index.isin(
            rnn[rnn["rk"].isin(set(lnn["k"]))].index)].copy()
        run_["k"] = np.nan
        run_["v"] = np.nan
        if jt == "left":
            j = pd.concat([matched, lun], ignore_index=True)
        elif jt == "right":
            j = pd.concat([matched, run_], ignore_index=True)
        else:
            j = pd.concat([matched, lun, run_], ignore_index=True)
    elif jt == "left_semi":
        j = ldf[ldf["k"].isin(set(rnn["rk"]))]
    elif jt == "right_semi":
        j = rdf[rdf["rk"].isin(set(lnn["k"]))]
    elif jt == "anti_simple":
        j = ldf[~ldf["k"].isin(set(rnn["rk"]))]
    else:  # null-aware anti: any null build key kills everything;
        # null probe keys never qualify
        if rdf["rk"].isna().any():
            j = ldf.iloc[0:0]
        else:
            j = lnn[~lnn["k"].isin(set(rnn["rk"]))]
    rows = []
    for _, r in j.iterrows():
        row = []
        for c in sorted(out_cols):
            x = r[c]
            if isinstance(x, float) and np.isnan(x):
                row.append(None)
            elif c in ("k", "rk") and x is not None and not (
                    isinstance(x, float) and np.isnan(x)):
                row.append(int(x))
            else:
                row.append(round(float(x), 9)
                           if isinstance(x, float) else x)
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple(
        (x is None, x) for x in r))
