"""Expression engine tests (analog: velox/expression/tests).

Oracle: direct numpy computation with SQL null semantics.
"""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from velox_tpu.types import BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER, VARCHAR
from velox_tpu.types.types import DECIMAL
from velox_tpu.expr import parse_expr, compile_exprs
from velox_tpu.expr.compiler import ExprSet
from velox_tpu.vector import Batch


def eval_on(batch: Batch, *texts: str):
    """Parse + compile + evaluate expressions over a batch; return list of
    python lists (None for null), restricted to selected rows."""
    exprs = [parse_expr(t) for t in texts]
    dicts = {
        n: c.dictionary for n, c in batch.columns.items()
        if c.dictionary is not None
    }
    es = ExprSet(exprs, batch.schema, dicts)
    arrays = {
        n: (batch.columns[n].values, batch.columns[n].valid)
        for n in es.field_names
    }
    results = es.evaluate(arrays)
    sel = np.asarray(batch.sel)
    out = []
    for vals, valid in results:
        vals = np.asarray(jnp.broadcast_to(vals, batch.sel.shape))
        v = np.asarray(jnp.broadcast_to(valid, batch.sel.shape)) \
            if valid is not None else np.ones(batch.capacity, dtype=bool)
        out.append([
            vals[i].item() if v[i] else None
            for i in range(batch.capacity) if sel[i]
        ])
    return out


def test_arithmetic_and_widening():
    b = Batch.from_pydict(
        {"a": [1, 2, 3], "b": [10.5, 20.5, 30.5]},
        {"a": BIGINT, "b": DOUBLE},
    )
    (r,) = eval_on(b, "a + b * 2.0")
    assert r == [22.0, 43.0, 64.0]


def test_integer_division_truncates_toward_zero():
    b = Batch.from_pydict({"a": [7, -7, 7, -7], "d": [2, 2, -2, -2]},
                          {"a": BIGINT, "d": BIGINT})
    (q, m) = eval_on(b, "a / d", "a % d")
    assert q == [3, -3, -3, 3]
    assert m == [1, -1, 1, -1]  # sign follows dividend


def test_divide_by_zero_is_null():
    b = Batch.from_pydict({"a": [6, 6], "d": [3, 0]},
                          {"a": BIGINT, "d": BIGINT})
    (q,) = eval_on(b, "a / d")
    assert q == [2, None]


def test_null_propagation():
    b = Batch.from_pydict({"a": [1, None, 3]}, {"a": BIGINT})
    (r,) = eval_on(b, "a + 1")
    assert r == [2, None, 4]


def test_kleene_and_or():
    b = Batch.from_pydict(
        {"x": [True, True, False, None, None, False],
         "y": [True, None, None, None, False, False]},
        {"x": BOOLEAN, "y": BOOLEAN},
    )
    (a, o) = eval_on(b, "x AND y", "x OR y")
    assert a == [True, None, False, None, False, False]
    assert o == [True, True, None, None, None, False]


def test_comparison_and_between():
    b = Batch.from_pydict({"a": [1, 5, 10]}, {"a": BIGINT})
    (r1, r2) = eval_on(b, "a BETWEEN 2 AND 10", "a <> 5")
    assert r1 == [False, True, True]
    assert r2 == [True, False, True]


def test_if_and_case():
    b = Batch.from_pydict({"a": [1, 2, 3]}, {"a": BIGINT})
    (r,) = eval_on(
        b, "CASE WHEN a = 1 THEN 10 WHEN a = 2 THEN 20 ELSE 0 END")
    assert r == [10, 20, 0]
    (r,) = eval_on(b, "if(a > 1, a * 100, a)")
    assert r == [1, 200, 300]


def test_coalesce():
    b = Batch.from_pydict({"a": [None, 2, None], "b": [1, 1, None]},
                          {"a": BIGINT, "b": BIGINT})
    (r,) = eval_on(b, "coalesce(a, b)")
    assert r == [1, 2, None]


def test_is_null():
    b = Batch.from_pydict({"a": [1, None]}, {"a": BIGINT})
    (r1, r2) = eval_on(b, "a IS NULL", "a IS NOT NULL")
    assert r1 == [False, True]
    assert r2 == [True, False]


def test_string_eq_on_dictionary():
    b = Batch.from_pydict(
        {"s": ["AIR", "MAIL", "AIR", None]},
        {"s": VARCHAR},
    )
    (r,) = eval_on(b, "s = 'AIR'")
    assert r == [True, False, True, None]


def test_string_range_compare_uses_ranks():
    b = Batch.from_pydict(
        {"s": ["apple", "banana", "cherry"]},
        {"s": VARCHAR},
    )
    (r1, r2, r3) = eval_on(b, "s < 'banana'", "s <= 'banana'", "s > 'b'")
    assert r1 == [True, False, False]
    assert r2 == [True, True, False]
    assert r3 == [False, True, True]


def test_string_in_and_like():
    b = Batch.from_pydict(
        {"s": ["PROMO BRUSHED", "STANDARD", "PROMO POLISHED"]},
        {"s": VARCHAR},
    )
    (r1, r2) = eval_on(b, "s IN ('STANDARD', 'none')", "s LIKE 'PROMO%'")
    assert r1 == [False, True, False]
    assert r2 == [True, False, True]


def test_date_literal_and_parts():
    epoch = datetime.date(1970, 1, 1)
    days = [(datetime.date(1994, 3, 15) - epoch).days,
            (datetime.date(1998, 12, 1) - epoch).days,
            (datetime.date(1970, 1, 1) - epoch).days]
    b = Batch.from_pydict({"d": days}, {"d": DATE})
    (y, m, dd, q) = eval_on(b, "year(d)", "month(d)", "day(d)", "quarter(d)")
    assert y == [1994, 1998, 1970]
    assert m == [3, 12, 1]
    assert dd == [15, 1, 1]
    assert q == [1, 4, 1]
    (r,) = eval_on(b, "d < DATE '1995-01-01'")
    assert r == [True, False, True]
    (r,) = eval_on(b, "d + INTERVAL '30' DAY > DATE '1994-04-10'")
    assert r == [True, True, False]


def test_decimal_arithmetic():
    import pyarrow as pa
    from velox_tpu.vector import from_arrow
    t = pa.table({
        "p": pa.array([1, 2], type=pa.decimal128(12, 2)),
        "q": pa.array([3, 4], type=pa.decimal128(12, 2)),
    })
    b = from_arrow(t)
    exprs = [parse_expr("p * q"), parse_expr("p + q")]
    es = ExprSet(exprs, b.schema)
    arrays = {n: (b.columns[n].values, b.columns[n].valid)
              for n in es.field_names}
    (mul, add) = es.evaluate(arrays)
    assert es.result_types[0] == DECIMAL(18, 4)
    assert es.result_types[1] == DECIMAL(13, 2)
    assert np.asarray(mul[0])[:2].tolist() == [30000, 80000]  # 3.0000, 8.0000
    assert np.asarray(add[0])[:2].tolist() == [400, 600]      # 4.00, 6.00


def test_cse_shares_subexpressions():
    b = Batch.from_pydict({"a": [1, 2]}, {"a": BIGINT})
    exprs = [parse_expr("(a + 1) * (a + 1)")]
    es = ExprSet(exprs, b.schema)
    # two structurally equal (a+1) nodes must be one memo entry
    from velox_tpu.expr.compiler import _eval_node
    memo = {}
    arrays = {"a": (b.columns["a"].values, None)}
    _eval_node(es.exprs[0], arrays, memo)
    adds = [e for e in memo if getattr(e, "name", "") == "plus"]
    assert len(adds) == 1


def test_try_cast():
    b = Batch.from_pydict({"a": [1.7, 2.2]}, {"a": DOUBLE})
    (r,) = eval_on(b, "CAST(a AS BIGINT)")
    assert r == [2, 2]


def test_string_multi_functions():
    from velox_tpu.types import BIGINT, VARCHAR
    from velox_tpu.vector.batch import Batch
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan_pydict

    b = Batch.from_pydict(
        {"s": ["hello world", "abc", "a:b:c", None]},
        {"s": VARCHAR})
    out = run_plan_pydict(PlanBuilder().values([b]).project([
        "replace(s, 'l', 'L') as r",
        "lpad(s, 5, '*') as lp",
        "rpad(s, 5, '*') as rp",
        "split_part(s, ':', 2) as sp",
        "strpos(s, 'b') as pos",
        "starts_with(s, 'a') as sw",
        "ends_with(s, 'c') as ew",
    ]).build())
    assert out["r"] == ["heLLo worLd", "abc", "a:b:c", None]
    assert out["lp"] == ["hello", "**abc", "a:b:c", None]
    assert out["rp"] == ["hello", "abc**", "a:b:c", None]
    assert out["sp"] == [None, None, "b", None]
    assert out["pos"] == [0, 2, 3, None]
    assert out["sw"] == [False, True, True, None]
    assert out["ew"] == [False, True, True, None]


def test_string_multi_in_filter():
    from velox_tpu.types import BIGINT, VARCHAR
    from velox_tpu.vector.batch import Batch
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan_pydict

    b = Batch.from_pydict(
        {"s": ["foo.py", "bar.cc", "baz.py"], "x": [1, 2, 3]},
        {"s": VARCHAR, "x": BIGINT})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .filter("ends_with(s, '.py') AND strpos(s, 'a') > 0")
        .project(["x"]).build())
    assert out["x"] == [3]


def test_cast_varchar_to_numeric():
    from velox_tpu.types import BIGINT, VARCHAR
    from velox_tpu.vector.batch import Batch
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan_pydict

    b = Batch.from_pydict(
        {"s": ["12", " -3 ", "4.5", "oops", None, "1e2"]},
        {"s": VARCHAR})
    out = run_plan_pydict(PlanBuilder().values([b]).project([
        "cast(s as bigint) as i",
        "cast(s as double) as d",
        "cast(s as boolean) as bb",
    ]).build())
    assert out["i"] == [12, -3, 4, None, None, 100]
    assert out["d"] == [12.0, -3.0, 4.5, None, None, 100.0]
    assert out["bb"] == [None, None, None, None, None, None]
    out2 = run_plan_pydict(PlanBuilder().values([Batch.from_pydict(
        {"s": ["true", "F", "1", "x"]}, {"s": VARCHAR})]).project([
        "cast(s as boolean) as b"]).build())
    assert out2["b"] == [True, False, True, None]


def test_cast_varchar_date_and_filter():
    from velox_tpu.types import VARCHAR
    from velox_tpu.vector.batch import Batch
    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan_pydict

    b = Batch.from_pydict(
        {"s": ["1995-03-15", "1998-12-01", "bad"]}, {"s": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .filter("cast(s as date) >= DATE '1996-01-01'")
        .project(["s"]).build())
    assert out["s"] == ["1998-12-01"]


def test_interval_typed_literals():
    """INTERVAL literals beyond DAY: typed day-time (int64 ms) and
    year-month (int32 months) lanes with Presto's DatePlusInterval /
    TimestampPlusInterval semantics (velox/functions/prestosql/
    DateTimeFunctions.h:447,488)."""
    import datetime as dtm

    from velox_tpu.types import TIMESTAMP

    b = Batch.from_pydict(
        {"d": [(dtm.date(2001, 1, 31) - dtm.date(1970, 1, 1)).days],
         "ts": [int(dtm.datetime(2001, 1, 1, 12, 0).timestamp()
                    * 1_000_000)]},
        {"d": DATE, "ts": TIMESTAMP})
    (a,) = eval_on(b, "d - INTERVAL '1' MONTH")
    assert a == [
        (dtm.date(2000, 12, 31) - dtm.date(1970, 1, 1)).days]
    (c,) = eval_on(b, "d + INTERVAL '1' YEAR")
    # month-end clamp: 2001-01-31 + 1 year = 2002-01-31
    assert c == [
        (dtm.date(2002, 1, 31) - dtm.date(1970, 1, 1)).days]
    (e,) = eval_on(b, "ts + INTERVAL '90' MINUTE")
    assert e == [int(
        dtm.datetime(2001, 1, 1, 13, 30).timestamp() * 1_000_000)]
    (g,) = eval_on(b, "INTERVAL '1' DAY + INTERVAL '12' HOUR")
    assert g == [129_600_000]
    (h,) = eval_on(b, "INTERVAL '2' HOUR * 3")
    assert h == [21_600_000]
    import pytest as _pytest

    with _pytest.raises(TypeError):
        eval_on(b, "d + INTERVAL '3' HOUR")
