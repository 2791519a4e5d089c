"""Flagship benchmark: TPC-H Q6 at SF1 on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over a vectorized pandas/numpy evaluation of
the identical query on the identical data on this host's CPU (the
stand-in for the velox CPU baseline until reference numbers land in
BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from velox_tpu.io.tpch import generate_tables
    from velox_tpu.io.catalog import register_arrow, drop_table
    from velox_tpu.tpch import tpch_plan
    from velox_tpu.exec import run_plan

    t0 = time.time()
    tables = generate_tables(sf)
    gen_s = time.time() - t0

    li = tables["lineitem"].select(
        ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"])
    n_rows = li.num_rows

    t0 = time.time()
    register_arrow("lineitem", li, batch_rows=1 << 22)
    ingest_s = time.time() - t0

    plan = tpch_plan(6).build()

    # warmup (compile)
    t0 = time.time()
    result = run_plan(plan)
    warm_s = time.time() - t0
    revenue = result.column("revenue").to_pylist()[0]

    times = []
    for _ in range(iters):
        t0 = time.time()
        r = run_plan(plan)
        times.append(time.time() - t0)
    best = min(times)
    rows_per_s = n_rows / best

    # ---- CPU baseline: vectorized numpy of the same query
    ship = np.asarray(li.column("l_shipdate").cast("int32"))
    price = np.asarray(li.column("l_extendedprice"))
    disc = np.asarray(li.column("l_discount"))
    qty = np.asarray(li.column("l_quantity"))
    lo, hi = 8766, 9131  # 1994-01-01, 1995-01-01 in days
    t_base = []
    for _ in range(3):
        t0 = time.time()
        m = ((ship >= lo) & (ship < hi) & (disc >= 0.05 - 1e-9)
             & (disc <= 0.07 + 1e-9) & (qty < 24))
        base_rev = float((price[m] * disc[m]).sum())
        t_base.append(time.time() - t0)
    base_best = min(t_base)
    base_rows_per_s = n_rows / base_best

    assert abs(base_rev - revenue) / max(abs(base_rev), 1) < 1e-6, (
        f"result mismatch: tpu={revenue} cpu={base_rev}")

    print(json.dumps({
        "metric": f"tpch_q6_sf{sf:g}_rows_per_sec",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / base_rows_per_s, 3),
    }))
    print(
        f"# platform={jax.devices()[0].platform} rows={n_rows} "
        f"best={best*1e3:.1f}ms warmup={warm_s:.1f}s gen={gen_s:.1f}s "
        f"ingest={ingest_s:.1f}s cpu_numpy={base_best*1e3:.1f}ms "
        f"revenue={revenue:.2f}",
        file=sys.stderr)


if __name__ == "__main__":
    main()
