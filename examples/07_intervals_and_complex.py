"""Typed intervals + complex-type functions (round-5 surfaces): date
arithmetic with the INTERVAL literal family (Presto semantics incl.
month-end clamping), nested array/map functions composed freely (the
builder decomposes nested complex calls into chained projections), and
the device-side map_zip_with key-union merge.

Reference analogs: velox/type/Type.h IntervalDayTime/IntervalYearMonth,
velox/functions/prestosql/DateTimeFunctions.h DatePlusInterval,
MapZipWith.h, ArrayFlatten.cpp.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import pyarrow as pa

from velox_tpu.exec import run_plan_pydict
from velox_tpu.io.catalog import drop_table, register_arrow
from velox_tpu.plan import PlanBuilder


def main() -> None:
    import datetime as dtm

    t = pa.table({
        "d": pa.array([dtm.date(2001, 1, 31), dtm.date(2000, 2, 29)],
                      pa.date32()),
        "s": ["a b c", "x y"],
        "weights": pa.array([[1.0, 2.0, 3.0], [5.0, 7.0]],
                            pa.list_(pa.float64())),
        "m1": pa.array([[("a", 1.0), ("b", 2.0)], [("c", 3.0)]],
                       pa.map_(pa.string(), pa.float64())),
        "m2": pa.array([[("a", 10.0), ("z", 5.0)], [("c", 30.0)]],
                       pa.map_(pa.string(), pa.float64())),
    })
    register_arrow("ex7", t, 16)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("ex7").project([
                # interval arithmetic: month-end clamp, typed literals
                "d + INTERVAL '1' MONTH AS next_month",
                "d - INTERVAL '90' DAY AS quarter_ago",
                # nested complex calls decompose automatically:
                # ngrams over the split words, then flattened back
                "flatten(ngrams(split(s, ' '), 2)) AS bigram_stream",
                # key-union merge with a 3-parameter lambda
                "map_zip_with(m1, m2, (k, v1, v2) ->"
                " coalesce(v1, 0.0) + coalesce(v2, 0.0)) AS merged",
                # vector math rewrites onto zip_with/transform
                "l2_norm(weights) AS norm",
            ]).build())
    finally:
        drop_table("ex7")

    for name, col in out.items():
        print(f"{name}: {col}")

    assert out["next_month"] == [dtm.date(2001, 2, 28),
                                 dtm.date(2000, 3, 29)]
    assert out["merged"][0] == [("a", 11.0), ("b", 2.0), ("z", 5.0)]
    print("ok")


if __name__ == "__main__":
    main()
