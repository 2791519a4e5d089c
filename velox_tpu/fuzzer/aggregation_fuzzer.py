"""Aggregation fuzzer: every registered aggregate x distinct x masks x
execution strategy, with a plan-equivalence oracle.

The velox AggregationFuzzer design (velox/exec/fuzzer/
AggregationFuzzer.cpp:247 verify(): the same aggregation runs as (a)
single-step, (b) partial -> final, (c) streaming over key-sorted input,
and (d) single-step under a tiny spill budget — all results must agree.
Known aggregates additionally check against a pandas formula.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from velox_tpu.exec import run_plan_pydict
from velox_tpu.functions.aggregates import aggregate_registry
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, BOOLEAN, DOUBLE
from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch

#: aggregate -> (args template, needs positive values, pandas formula)
#: args use columns: i (int), x (float), y (float), b (bool), q (pos int)
_AGG_ARGS: Dict[str, str] = {
    "sum": "x", "count": "x", "count_if": "b", "min": "x", "max": "x",
    "avg": "x", "variance": "x", "var_samp": "x", "var_pop": "x",
    "stddev": "x", "stddev_samp": "x", "stddev_pop": "x", "geometric_mean": "q",
    "skewness": "x", "kurtosis": "x", "checksum": "i",
    "bool_and": "b", "bool_or": "b", "arbitrary": "i",
    "min_by": "x, i", "max_by": "x, i",
    "covar_samp": "x, y", "covar_pop": "x, y", "corr": "x, y",
    "regr_slope": "x, y", "regr_intercept": "x, y",
    "bitwise_and_agg": "i", "bitwise_or_agg": "i",
    "bitwise_xor_agg": "i",
    "approx_distinct": "i", "product": "q", "entropy": "q",
    "array_agg": "i", "map_agg": "i, x", "map_union": None,
    "approx_percentile": "x, 0.5",
    "every": "b", "sum_distinct": None, "count_distinct": None,
    "histogram": None, "avg_x": None,
    "tdigest_agg": "x", "qdigest_agg": "i",
    "approx_winsorized_mean": "x, 0.1, 0.9",
    "numeric_histogram": "4, x",
    "vector_sum": None,            # ARRAY input (tests cover it)
    "classification_precision": "4, b, q",
    "classification_recall": None, "classification_miss_rate": None,
    "classification_fall_out": None, "classification_thresholds": None,
    # covered by test_digest.py; 'merge' needs a digest-typed input
    # column the fuzzer's random schema doesn't produce
    "merge": None,
    "set_agg": "i", "set_union": None, "map_union_sum": None,
    "approx_most_frequent": None, "reduce_agg": None,
    "noisy_count_gaussian": "i, 0.5, 7", "noisy_count_if_gaussian": "b, 0.5, 7",
    "noisy_sum_gaussian": "x, 0.5, 7", "noisy_avg_gaussian": "x, 0.5, 7",
}

#: aggregates whose multi-run equivalence can't use partial/final.
#: approx_percentile is NOT here: its digest-lane companions
#: (functions/aggregates_digest.py) are exact while every group holds
#: <= K=64 rows, which the fuzzer's data sizes guarantee — so the
#: partial/final and spilled strategies must match the exact single
#: path bit-for-bit at these sizes.
_SINGLE_ONLY = {"approx_distinct", "bitwise_and_agg", "bitwise_or_agg",
                "bitwise_xor_agg", "map_union",
                "tdigest_agg", "qdigest_agg",
                "approx_winsorized_mean",
                "numeric_histogram", "classification_precision"}
#: no streaming (collect/matrix lanes; noisy_*: the gaussian draw is
#: keyed by final group slot, and streaming assigns slots by arrival
#: order instead of sorted-key rank — same contract as Presto, where
#: seeded draws are per-accumulator and not strategy-stable)
_NOISY = {"noisy_count_gaussian", "noisy_count_if_gaussian",
          "noisy_sum_gaussian", "noisy_avg_gaussian"}
_NO_STREAMING = _SINGLE_ONLY | _NOISY | {
    "approx_percentile", "array_agg", "map_agg", "set_agg"}
#: spilled partitions renumber group slots at extract, so slot-keyed
#: gaussian draws differ (same reasoning as _NO_STREAMING)
_NO_SPILL = _NOISY


def _data(rng, n):
    return {
        "g": [int(v) for v in rng.integers(0, 6, n)],
        "i": [None if rng.random() < 0.1 else int(v)
              for v in rng.integers(-50, 50, n)],
        "x": [None if rng.random() < 0.1 else
              float(np.round(v, 3)) for v in rng.normal(size=n)],
        "y": [float(np.round(v, 3)) for v in rng.normal(size=n)],
        "b": [bool(v) for v in rng.integers(0, 2, n)],
        "q": [float(v) for v in rng.uniform(0.1, 9.0, n)],
        "m": [bool(v) for v in rng.integers(0, 2, n)],
    }


_TYPES = {"g": BIGINT, "i": BIGINT, "x": DOUBLE, "y": DOUBLE,
          "b": BOOLEAN, "q": DOUBLE, "m": BOOLEAN}


def _canon(out: Dict[str, list]):
    rows = []
    for r in zip(*[out[c] for c in sorted(out)]):
        row = []
        for x in r:
            if isinstance(x, float):
                # 10 significant digits: strategies reassociate float
                # sums/products, exact equality is not the contract
                row.append(None if math.isnan(x)
                           else float(f"{x:.10g}"))
            elif isinstance(x, list):
                row.append(tuple(sorted(
                    (str(e) for e in x if e is not None))))
            else:
                row.append(x)
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x) for x in r))


def _rows_match(a, b) -> bool:
    """Row-set equality with float tolerance: string rounding alone can
    flip the last kept digit on a 1-ulp reassociation difference at ANY
    precision, so floats compare via isclose on top of the canon."""
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if not math.isclose(x, y, rel_tol=1e-8, abs_tol=1e-9):
                    return False
            elif x != y:
                return False
    return True


def run_aggregation_fuzz(iterations: int = 60, seed: int = 0,
                         verbose: bool = False) -> None:
    rng = np.random.default_rng(seed)
    fns = sorted(n for n, a in _AGG_ARGS.items()
                 if a is not None and n in aggregate_registry)
    missing = [n for n in aggregate_registry
               if n not in _AGG_ARGS and "$" not in n]
    for i in range(iterations):
        if i and i % 15 == 0:
            import jax

            # every random plan compiles fresh XLA executables;
            # unbounded accumulation exhausts the process mmap
            # budget (LLVM 'Cannot allocate memory') long before
            # RAM — drop them periodically
            jax.clear_caches()
        fn = fns[i % len(fns)] if i < len(fns) else str(rng.choice(fns))
        args = _AGG_ARGS[fn]
        n = int(rng.integers(6, 150))
        data = _data(rng, n)
        keyed = bool(rng.random() < 0.7)
        masked = bool(rng.random() < 0.3)
        distinct = (bool(rng.random() < 0.25)
                    and "," not in args
                    and fn not in _SINGLE_ONLY
                    and fn not in ("array_agg", "set_agg", "map_agg"))
        call = (f"{fn}(distinct {args})" if distinct
                else f"{fn}({args})")
        agg = f"{call} as a"
        keys = ["g"] if keyed else []
        masks = {"a": "m"} if masked else None

        def batches():
            cut = n // 2 if n > 3 else n
            return [
                Batch.from_pydict(
                    {c: data[c][:cut] for c in data}, _TYPES),
                Batch.from_pydict(
                    {c: data[c][cut:] for c in data}, _TYPES),
            ] if cut < n else [Batch.from_pydict(data, _TYPES)]

        def single():
            return (PlanBuilder().values(batches())
                    .aggregate(keys, [agg], masks=masks))

        results = {"single": run_plan_pydict(single().build())}
        if fn not in _SINGLE_ONLY and not distinct:
            results["partial_final"] = run_plan_pydict(
                PlanBuilder().values(batches())
                .partial_aggregation(keys, [agg], masks=masks)
                .final_aggregation().build())
        if keyed and fn not in _NO_STREAMING and not distinct:
            results["streaming"] = run_plan_pydict(
                PlanBuilder().values(batches())
                .order_by(keys)
                .streaming_aggregate(keys, [agg], masks=masks)
                .build())
        if fn not in _NO_SPILL:
            old = config.spill_memory_budget_bytes
            config.spill_memory_budget_bytes = 1 << 11
            try:
                results["spilled"] = run_plan_pydict(single().build())
            finally:
                config.spill_memory_budget_bytes = old

        base = _canon(results["single"])
        for name, res in results.items():
            got = _canon(res)
            assert _rows_match(got, base), (
                f"iter {i}: {agg} keyed={keyed} masked={masked} "
                f"strategy {name} disagrees\n{name}: {got[:6]}\n"
                f"single: {base[:6]}")
        if verbose:
            print(f"iter {i}: {agg} keyed={keyed} masked={masked} "
                  f"distinct={distinct} strategies={sorted(results)} ok")
    return missing
