"""Rehearse the distributed all-22 TPC-H north star on the virtual mesh.

Runs every TPC-H query through ``run_plan_distributed`` on an 8-device
CPU mesh at small SF, asserts each result matches the serial engine,
and records which execution strategy each query took (fused SPMD
aggregation, distributed pipeline, broadcast semi join, or serial
fallback). The harness model is the reference's distributed TPC-H
benchmark config (velox/benchmarks/tpch/TpchBenchmark.cpp) rehearsed
without a cluster, the MultiFragmentTest strategy.

Usage: python tools/distributed_rehearsal.py [sf] [n_dev]
Writes DISTRIBUTED_REHEARSAL.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from velox_tpu.exec import run_plan
    from velox_tpu.io.tpch import register_tpch_decimal
    from velox_tpu.parallel import make_mesh
    from velox_tpu.parallel import runner as R
    from velox_tpu.tpch import tpch_plan
    from velox_tpu.utils.config import config

    config.narrow_lanes = True
    register_tpch_decimal(sf)
    mesh = make_mesh(n_dev)

    report = {}
    for q in range(1, 23):
        plan = tpch_plan(q).build()
        t0 = time.time()
        serial = run_plan(plan).to_pandas()
        serial_s = time.time() - t0
        R.last_strategy = ""
        t0 = time.time()
        try:
            dist = R.run_plan_distributed(
                tpch_plan(q).build(), mesh).to_pandas()
            dist_s = time.time() - t0
            strategy = R.last_strategy or "unknown"
            cols = list(serial.columns)
            a = serial.sort_values(cols, kind="mergesort",
                                   na_position="last")
            b = dist[cols].sort_values(cols, kind="mergesort",
                                       na_position="last")
            import numpy as np
            import pandas as pd

            match = len(a) == len(b)
            if match:
                for c in cols:
                    av, bv = a[c].to_numpy(), b[c].to_numpy()
                    if a[c].dtype.kind == "f":
                        ok = np.allclose(
                            av, bv, rtol=1e-9, equal_nan=True)
                    else:
                        ok = (pd.isna(av) == pd.isna(bv)).all() and (
                            av[~pd.isna(av)] == bv[~pd.isna(bv)]).all()
                    if not ok:
                        match = False
                        break
            status = "ok" if match else "MISMATCH"
        except Exception as e:  # noqa: BLE001 — record, keep going
            strategy = "ERROR"
            status = f"{type(e).__name__}: {str(e)[:120]}"
            dist_s = time.time() - t0
        report[f"q{q}"] = {
            "strategy": strategy, "status": status,
            "rows": int(len(serial)),
            "serial_ms": round(serial_s * 1e3, 1),
            "dist_ms": round(dist_s * 1e3, 1),
        }
        print(f"q{q:>2}: {strategy:22s} {status} "
              f"({len(serial)} rows, serial {serial_s*1e3:.0f}ms, "
              f"dist {dist_s*1e3:.0f}ms)", flush=True)

    dist_count = sum(1 for r in report.values()
                     if r["strategy"] not in ("serial_fallback",
                                              "ERROR"))
    ok_count = sum(1 for r in report.values() if r["status"] == "ok")
    summary = {"sf": sf, "n_dev": n_dev,
               "queries_distributed": dist_count,
               "queries_matching_serial": ok_count,
               "queries": report}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DISTRIBUTED_REHEARSAL.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{dist_count}/22 distributed, {ok_count}/22 match serial "
          f"-> {out}")


if __name__ == "__main__":
    main()
