"""Flagship benchmark: TPC-H Q6 at SF1 on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over a vectorized numpy evaluation of the
identical query on the identical data on this host's CPU (stand-in for
the velox CPU baseline until reference numbers land in BASELINE.md).

Money columns run in DECIMAL mode — scaled int64 lanes, the engine's
TPU-native exact path (f64 is software-emulated on TPU; SURVEY.md §7
"keep integer/decimal paths in int lanes, never through float").
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import pyarrow as pa

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from velox_tpu.io.tpch import generate_tables
    from velox_tpu.io.catalog import register_arrow
    from velox_tpu.tpch import tpch_plan
    from velox_tpu.exec import run_plan
    from velox_tpu.utils.config import config

    config.narrow_lanes = True  # 32-bit decimal lanes (TPU-native mode)

    t0 = time.time()
    from velox_tpu.io.native_tpch import gen_orders_lineitem_native

    native = gen_orders_lineitem_native(sf)
    if native is not None:
        _, li, cents = native
        ship = cents["l_shipdate"]
        price_c, disc_c, qty_c = (
            cents["l_extendedprice"], cents["l_discount"],
            cents["l_quantity"])
    else:
        li = generate_tables(sf)["lineitem"]
        ship = np.asarray(li.column("l_shipdate").cast(pa.int32()))
        price_c = np.round(np.asarray(
            li.column("l_extendedprice")) * 100).astype(np.int64)
        disc_c = np.round(np.asarray(
            li.column("l_discount")) * 100).astype(np.int64)
        qty_c = np.round(np.asarray(
            li.column("l_quantity")) * 100).astype(np.int64)
    n_rows = li.num_rows
    gen_s = time.time() - t0

    t0 = time.time()
    register_arrow(
        "lineitem",
        pa.table({
            "l_extendedprice": price_c, "l_discount": disc_c,
            "l_quantity": qty_c,
            "l_shipdate": pa.array(ship, type=pa.date32()),
        }),
        batch_rows=1 << 23,
        decimal_overrides={
            "l_extendedprice": (9, 2), "l_discount": (3, 2),
            "l_quantity": (4, 2)},
    )
    ingest_s = time.time() - t0

    plan = tpch_plan(6).build()

    # warmup (compile)
    t0 = time.time()
    result = run_plan(plan)
    warm_s = time.time() - t0
    revenue = float(result.column("revenue").to_pylist()[0])

    times = []
    for _ in range(iters):
        t0 = time.time()
        r = run_plan(plan)
        assert r.num_rows == 1
        times.append(time.time() - t0)
    best = min(times)
    rows_per_s = n_rows / best

    # ---- CPU baseline: vectorized numpy int64 of the same query
    lo, hi = 8766, 9131  # 1994-01-01, 1995-01-01 in days
    t_base = []
    for _ in range(3):
        t0 = time.time()
        m = ((ship >= lo) & (ship < hi) & (disc_c >= 5) & (disc_c <= 7)
             & (qty_c < 2400))
        base_rev_unscaled = int((price_c[m] * disc_c[m]).sum())
        t_base.append(time.time() - t0)
    base_best = min(t_base)
    base_rows_per_s = n_rows / base_best
    base_rev = base_rev_unscaled / 10_000.0  # scale 2 * scale 2

    assert abs(base_rev - revenue) < 1e-6, (
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
