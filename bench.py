"""Headline benchmark: TPC-H Q1/Q3/Q6/Q18 at SF1 on the real TPU chip.

Data: byte-exact dbgen output (io/dbgen.py — the reference's own dbgen),
money in DECIMAL cents lanes (the engine's TPU-native exact path; f64 is
software-emulated on this TPU, SURVEY.md §7 hard part #5).

Baseline: pyarrow Acero (multi-threaded C++ vectorized engine) running the
same queries on the same dbgen bytes on this host's CPUs — the strongest
baseline available in-image; velox_tpch_benchmark itself cannot be built
here (BASELINE.md "build attempt"). Acero results also cross-check ours.

Prints ONE JSON line: the geometric-mean rows/s across the four queries,
with vs_baseline = geomean(tpu rows/s / acero rows/s). Per-query detail
goes to stderr and to BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import math
import sys
import time


def _tpu_backend_ok(timeout_s: float = 180.0, attempts: int = 4,
                    retry_sleep_s: float = 45.0) -> bool:
    """Probe the tunneled TPU in a SUBPROCESS with a hard timeout.

    The axon tunnel can wedge so badly that even ``jax.devices()`` hangs
    forever in fresh processes (BASELINE.md round-2 hazard). A hung
    bench is worse than a CPU-fallback bench — probe first, kill the
    probe if it stalls, and RETRY over a window (the tunnel recovers as
    stale remote leases expire). The probe also runs one tiny fetch:
    device init alone can succeed while execution wedges.

    NOTE the device's ``.platform`` string is ``"tpu"`` even under the
    axon plugin (BENCH_r01.json tail) — round 2's probe looked for
    ``"axon"`` and therefore ALWAYS fell back to CPU. Accept any
    non-cpu platform that completes a real computation."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the probe pick axon naturally
    code = ("import jax, jax.numpy as jnp;"
            "d = jax.devices()[0];"
            "v = float(jnp.sum(jnp.arange(8, dtype=jnp.int32)));"
            "print(d.platform, v)")
    for i in range(attempts):
        if i:
            time.sleep(retry_sleep_s)
            print(f"# TPU probe retry {i + 1}/{attempts}",
                  file=sys.stderr)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s, capture_output=True, text=True,
                env=env)
            if r.returncode == 0:
                parts = r.stdout.split()
                if parts and parts[0] != "cpu" and parts[-1] == "28.0":
                    return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main() -> None:
    import jax

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cpu_fallback = False
    if not _tpu_backend_ok():
        print("# TPU backend unreachable -> CPU fallback run",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        cpu_fallback = True

    from velox_tpu.exec import run_plan
    from velox_tpu.io.tpch import register_tpch_decimal
    from velox_tpu.tpch import tpch_plan
    from velox_tpu.utils.config import config

    config.narrow_lanes = True  # int32 decimal lanes (TPU-native mode)

    t0 = time.time()
    tables = register_tpch_decimal(sf)
    n_li = tables["lineitem"].num_rows
    ingest_s = time.time() - t0

    # ---- CPU baseline: Acero on the identical dbgen bytes.
    # Measured in interleaved A/B bursts WITH the TPU runs below
    # (round-4 verdict weak #1: single-session best-of-N swung ~2.4x
    # on tunnel time-of-day variance) — here we only materialize the
    # tables and take one correctness reference output per query.
    from tools import cpu_baseline as cb
    from velox_tpu.io import dbgen

    f64_tables = dbgen.dbgen_tables(sf)
    acero_out = {}
    for name, (fn, _) in cb.QUERIES.items():
        acero_out[name] = fn(f64_tables)

    # vanilla plans: the sort-order property pass (plan/optimizer.py)
    # derives the merge-join/streaming shapes itself — verified equal
    # to the former hand-written q3c/q18c in tests/test_optimizer.py
    plans = {
        "q1": tpch_plan(1).build(),
        "q3": tpch_plan(3).build(),
        "q6": tpch_plan(6).build(),
        "q18": tpch_plan(18).build(),
    }

    # bytes each query's device pipeline must touch at minimum: the
    # referenced fact/dim column lanes (int32/int64/f64 per ingest
    # layout). Drives the roofline fraction: (bytes/wall) / HBM BW
    # (v5e HBM ~819 GB/s; BASELINE.json >=80%-of-roofline target,
    # model velox/benchmarks/tpch/TpchBenchmark.cpp:27-60).
    _HBM_GBPS = 819.0
    import pyarrow as pa

    def _width(t) -> int:
        if pa.types.is_string(t) or pa.types.is_dictionary(t):
            return 4  # device lane is int32 dictionary codes
        try:
            return t.bit_width // 8
        except (ValueError, AttributeError):
            return 8

    col_bytes = {}
    for tname, tab in tables.items():
        for fld in tab.schema:
            col_bytes[fld.name] = tab.num_rows * _width(fld.type)
    _Q_COLS = {
        "q1": ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        "q3": ["l_orderkey", "l_extendedprice", "l_discount",
               "l_shipdate", "o_orderkey", "o_custkey", "o_orderdate",
               "o_shippriority", "c_custkey", "c_mktsegment"],
        "q6": ["l_quantity", "l_extendedprice", "l_discount",
               "l_shipdate"],
        "q18": ["l_orderkey", "l_quantity", "o_orderkey", "o_custkey",
                "o_orderdate", "o_totalprice", "c_custkey", "c_name"],
    }

    from velox_tpu.utils import replay as _replay

    def _median(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    # ---- variance-robust measurement: per query, interleave Acero and
    # TPU in BURSTS (A/B/A/B within the same minutes of tunnel
    # weather), report the median of per-burst minima + the spread
    bursts = 3
    detail = {}
    ratios = []
    tpu_rows_s = []
    warmups = {}
    for name, plan in plans.items():
        fn, _ = cb.QUERIES[name]
        t0 = time.time()
        result = run_plan(plan)  # warmup: compile + replay-record run
        warm_s = time.time() - t0
        warmups[name] = warm_s
        s0 = _replay.replay_stats()
        tpu_bursts = []
        acero_bursts = []
        for _ in range(bursts):
            at = []
            for _ in range(2):
                t0 = time.time()
                fn(f64_tables)
                at.append(time.time() - t0)
            acero_bursts.append(min(at))
            tt = []
            for _ in range(max(1, iters // bursts)):
                t0 = time.time()
                run_plan(plan)
                tt.append(time.time() - t0)
            tpu_bursts.append(min(tt))
        s1 = _replay.replay_stats()
        runs = max(1, (s1["replay_runs"] + s1["record_runs"]
                       - s0["replay_runs"] - s0["record_runs"]))
        elided = (s1["elided_syncs"] - s0["elided_syncs"]) / runs
        best = _median(tpu_bursts)
        acero_med = _median(acero_bursts)
        spread = ((max(tpu_bursts) - min(tpu_bursts)) / best
                  if best else 0.0)
        rows_s = n_li / best
        base_rows_s = n_li / acero_med
        touched = sum(col_bytes.get(c, 0) for c in _Q_COLS[name])
        roofline = (touched / best) / (_HBM_GBPS * 1e9)
        detail[name] = {
            "wall_ms": round(best * 1e3, 1),
            "wall_ms_bursts": [round(t * 1e3, 1) for t in tpu_bursts],
            "burst_spread": round(spread, 3),
            "rows_per_s": round(rows_s),
            "warmup_s": round(warm_s, 1),
            "acero_ms": round(acero_med * 1e3, 1),
            "acero_ms_bursts": [round(t * 1e3, 1)
                                for t in acero_bursts],
            "vs_acero": round(rows_s / base_rows_s, 3),
            "bytes_touched_mb": round(touched / 1e6, 1),
            "roofline_frac": round(roofline, 4),
            "syncs_elided_per_run": round(elided, 1),
            "out_rows": result.num_rows,
            "acero_out_rows": acero_out[name].num_rows,
        }
        # sanity: cardinality parity with the CPU engine on the same bytes
        assert result.num_rows == acero_out[name].num_rows, (
            name, result.num_rows, acero_out[name].num_rows)
        # phase breakdown (round-4 verdict missing #2): for sync-free
        # plans a direct Task run separates host enqueue, device
        # compute (block_until_ready), and result transfer — the
        # device-compute share of wall is the roofline-progress metric
        if elided == 0:
            import jax as _jax

            from velox_tpu.exec.task import Task as _Task

            t0 = time.time()
            bs = list(_Task(plan).run())
            enq_s = time.time() - t0
            arrs = [c.values for b in bs for c in b.columns.values()
                    if getattr(c, "values", None) is not None]
            t0 = time.time()
            _jax.block_until_ready(arrs)
            dev_s = time.time() - t0
            t0 = time.time()
            for b in bs:
                b.to_pydict()
            xfer_s = time.time() - t0
            detail[name]["phase_ms"] = {
                "host_enqueue": round(enq_s * 1e3, 1),
                "device_wait": round(dev_s * 1e3, 1),
                "result_transfer": round(xfer_s * 1e3, 1),
            }
        ratios.append(rows_s / base_rows_s)
        tpu_rows_s.append(rows_s)
        print(f"# {name}: med {best*1e3:.1f}ms spread "
              f"{spread:.2f} ({rows_s/1e6:.1f}M rows/s) acero med "
              f"{acero_med*1e3:.1f}ms -> {ratios[-1]:.2f}x warmup "
              f"{warm_s:.0f}s elided {elided:.0f} syncs/run",
              file=sys.stderr)
    del f64_tables

    geo_rows = math.exp(sum(math.log(x) for x in tpu_rows_s)
                        / len(tpu_rows_s))
    geo_ratio = math.exp(sum(math.log(x) for x in ratios) / len(ratios))

    platform = ("cpu_fallback" if cpu_fallback
                else jax.devices()[0].platform)
    # the default SF1 run owns BENCH_DETAIL.json; scale runs write
    # per-SF side files so they never clobber the headline artifact
    detail_path = ("BENCH_DETAIL.json" if sf == 1.0
                   else f"BENCH_DETAIL_sf{sf:g}.json")
    with open(detail_path, "w") as f:
        json.dump({"sf": sf, "platform": platform,
                   "lineitem_rows": n_li, "ingest_s": round(ingest_s, 1),
                   "method": f"median of {bursts} interleaved A/B "
                             "bursts (acero/tpu alternating)",
                   "warmup_total_s": round(sum(warmups.values()), 1),
                   "queries": detail}, f, indent=1)

    tag = "_CPU_FALLBACK" if cpu_fallback else ""
    print(json.dumps({
        "metric":
            f"tpch_sf{sf:g}_q1_q3_q6_q18_geomean_rows_per_sec{tag}",
        "value": round(geo_rows),
        "unit": "rows/s",
        "platform": platform,
        "warmup_total_s": round(sum(warmups.values()), 1),
        # a CPU-fallback run measures nothing about the TPU engine —
        # never publish a vs_baseline from it (round-2 verdict weak #2)
        "vs_baseline": None if cpu_fallback else round(geo_ratio, 3),
    }))


if __name__ == "__main__":
    main()
