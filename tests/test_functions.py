"""Scalar function breadth vs Python/numpy oracles.

Parity targets: velox/functions/prestosql/{Arithmetic,Bitwise,
DateTimeFunctions}.h semantics.
"""

import datetime
import math

import numpy as np
import pytest

from velox_tpu.types import BIGINT, DATE, DOUBLE, TIMESTAMP
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _run(data, types, exprs):
    b = Batch.from_pydict(data, types)
    return run_plan_pydict(PlanBuilder().values([b]).project(exprs).build())


def test_transcendentals():
    xs = [0.5, 1.0, 2.0, 100.0]
    out = _run({"x": xs}, {"x": DOUBLE}, [
        "sin(x) as a", "cos(x) as b", "atan(x) as c", "cbrt(x) as d",
        "log2(x) as e2", "log10(x) as f", "degrees(x) as g",
        "tanh(x) as h", "atan2(x, 2.0) as i",
    ])
    for i, x in enumerate(xs):
        assert out["a"][i] == pytest.approx(math.sin(x))
        assert out["b"][i] == pytest.approx(math.cos(x))
        assert out["c"][i] == pytest.approx(math.atan(x))
        assert out["d"][i] == pytest.approx(x ** (1 / 3))
        assert out["e2"][i] == pytest.approx(math.log2(x))
        assert out["f"][i] == pytest.approx(math.log10(x))
        assert out["g"][i] == pytest.approx(math.degrees(x))
        assert out["h"][i] == pytest.approx(math.tanh(x))
        assert out["i"][i] == pytest.approx(math.atan2(x, 2.0))


def test_sign_truncate_float_predicates():
    out = _run({"x": [-2.7, 0.0, 3.9]}, {"x": DOUBLE}, [
        "sign(x) as s", "truncate(x) as t", "is_nan(x / 0.0) as n",
        "is_finite(x) as f", "is_infinite(1.0 / 0.0) as i",
    ])
    assert out["s"] == [-1.0, 0.0, 1.0]
    assert out["t"] == [-2.0, 0.0, 3.0]
    # x/0.0 is NULL under engine TRY semantics except 0/0 -> also NULL
    assert out["f"] == [True, True, True]


def test_bitwise():
    a = [0, 9, -5, 255, 1 << 40]
    b = [1, 3, 2, 8, 4]
    out = _run({"a": a, "b": b}, {"a": BIGINT, "b": BIGINT}, [
        "bitwise_and(a, b) as x", "bitwise_or(a, b) as y",
        "bitwise_xor(a, b) as z", "bitwise_not(a) as n",
        "bitwise_left_shift(a, b) as l",
        "bitwise_arithmetic_shift_right(a, b) as r",
        "bit_count(a) as c",
    ])
    for i in range(len(a)):
        assert out["x"][i] == a[i] & b[i]
        assert out["y"][i] == a[i] | b[i]
        assert out["z"][i] == a[i] ^ b[i]
        assert out["n"][i] == ~a[i]
        assert out["l"][i] == np.int64(a[i] << b[i])
        assert out["r"][i] == a[i] >> b[i]
        assert out["c"][i] == bin(a[i] & ((1 << 64) - 1)).count("1")


def test_logical_right_shift():
    out = _run({"a": [-1]}, {"a": BIGINT},
               ["bitwise_right_shift(a, 60) as r"])
    assert out["r"] == [15]


def test_date_parts_vs_datetime_oracle():
    rng = np.random.default_rng(3)
    days = [int(x) for x in rng.integers(-3000, 40000, 200)]
    out = _run({"d": days}, {"d": DATE}, [
        "day_of_week(d) as dw", "day_of_year(d) as dy",
        "week(d) as wk", "day_of_month(d) as dm",
        "last_day_of_month(d) as ld",
    ])
    epoch = datetime.date(1970, 1, 1)
    for i, nd in enumerate(days):
        dt = epoch + datetime.timedelta(days=nd)
        iso = dt.isocalendar()
        assert out["dw"][i] == dt.isoweekday(), dt
        assert out["dy"][i] == dt.timetuple().tm_yday, dt
        assert out["wk"][i] == iso[1], dt
        assert out["dm"][i] == dt.day, dt
        nxt = (datetime.date(dt.year + (dt.month == 12),
                             dt.month % 12 + 1, 1)
               - datetime.timedelta(days=1))
        assert out["ld"][i] == nxt, dt


def test_timestamp_parts():
    ts = [0, 1_234_567_890_123_456, 86_399_999_999]
    out = _run({"t": ts}, {"t": TIMESTAMP}, [
        "hour(t) as h", "minute(t) as m", "second(t) as s",
        "millisecond(t) as ms", "to_unixtime(t) as u",
    ])
    for i, v in enumerate(ts):
        dt = datetime.datetime.utcfromtimestamp(v / 1e6)
        assert out["h"][i] == dt.hour
        assert out["m"][i] == dt.minute
        assert out["s"][i] == dt.second
        assert out["ms"][i] == (v // 1000) % 1000
        assert out["u"][i] == pytest.approx(v / 1e6)


def test_nullif():
    out = _run({"a": [1, 2, None], "b": [1, 3, 1]},
               {"a": BIGINT, "b": BIGINT},
               ["nullif(a, b) as n"])
    assert out["n"] == [None, 2, None]


def test_constants():
    out = _run({"x": [1.0]}, {"x": DOUBLE},
               ["pi() as p", "e() as e2", "x + pi() as xp"])
    assert out["p"] == [pytest.approx(math.pi)]
    assert out["e2"] == [pytest.approx(math.e)]
    assert out["xp"] == [pytest.approx(1 + math.pi)]


def test_date_trunc_add_diff_vs_datetime():
    rng = np.random.default_rng(4)
    days = [int(x) for x in rng.integers(0, 25000, 120)]
    ns = [int(x) for x in rng.integers(-30, 30, 120)]
    out = _run({"d": days, "n": ns}, {"d": DATE, "n": BIGINT}, [
        "date_trunc('month', d) as tm",
        "date_trunc('year', d) as ty",
        "date_trunc('week', d) as tw",
        "date_add('day', n, d) as ad",
        "date_add('month', n, d) as am",
        "date_add('year', 2, d) as ay",
        "date_diff('day', d, date_add('day', n, d)) as dd",
        "date_diff('month', d, date_add('month', 5, d)) as dm",
    ])
    epoch = datetime.date(1970, 1, 1)
    for i, nd in enumerate(days):
        dt = epoch + datetime.timedelta(days=nd)
        assert out["tm"][i] == dt.replace(day=1)
        assert out["ty"][i] == dt.replace(month=1, day=1)
        assert out["tw"][i] == dt - datetime.timedelta(
            days=dt.isoweekday() - 1)
        assert out["ad"][i] == dt + datetime.timedelta(days=ns[i])
        # month add with clamping
        m0 = dt.month - 1 + ns[i]
        y2 = dt.year + m0 // 12
        m2 = m0 % 12 + 1
        import calendar
        d2 = min(dt.day, calendar.monthrange(y2, m2)[1])
        assert out["am"][i] == datetime.date(y2, m2, d2), (dt, ns[i])
        assert out["ay"][i] == datetime.date(
            dt.year + 2, dt.month,
            min(dt.day, calendar.monthrange(dt.year + 2, dt.month)[1]))
        assert out["dd"][i] == ns[i]
        # month diff follows Java/Presto: a clamped end day counts as a
        # partial month (Jan 31 -> Jun 30 is 4 whole months)
        m5 = dt.month - 1 + 5
        y5, mm5 = dt.year + m5 // 12, m5 % 12 + 1
        d5 = min(dt.day, calendar.monthrange(y5, mm5)[1])
        exp_dm = 5 - (d5 < dt.day)
        assert out["dm"][i] == exp_dm, (dt,)


def test_timestamp_trunc_add():
    ts = [1_234_567_890_123_456, 86_399_999_999]
    out = _run({"t": ts}, {"t": TIMESTAMP}, [
        "date_trunc('hour', t) as th",
        "date_trunc('day', t) as td",
        "date_add('hour', 3, t) as ah",
        "date_diff('minute', t, date_add('minute', 90, t)) as dm",
    ])
    def dt_of(us):
        return datetime.datetime.fromtimestamp(
            us / 1e6, datetime.timezone.utc).replace(tzinfo=None)

    def norm(x):
        return x if isinstance(x, datetime.datetime) else dt_of(x)

    for i, v in enumerate(ts):
        assert norm(out["th"][i]) == dt_of(v - v % 3_600_000_000)
        assert norm(out["td"][i]) == dt_of(v - v % 86_400_000_000)
        assert norm(out["ah"][i]) == dt_of(v + 3 * 3_600_000_000)
        assert out["dm"][i] == 90


def test_round4_scalar_additions():
    """typeof / current_timezone (static resolve), day_name /
    month_name / human_readable_seconds (int-value table gathers)."""
    import datetime as dt

    from velox_tpu.plan import PlanBuilder
    from velox_tpu.exec import run_plan_pydict
    from velox_tpu.types import BIGINT, DATE
    from velox_tpu.vector.batch import Batch

    days = [(dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days + i * 40
            for i in range(4)]
    b = Batch.from_pydict({"d": days, "s": [3725, 59, 0, 90061]},
                          {"d": DATE, "s": BIGINT})
    out = run_plan_pydict(PlanBuilder().values([b]).project([
        "day_name(d) AS dn", "month_name(d) AS mn",
        "human_readable_seconds(s) AS hrs",
        "typeof(d) AS td", "typeof(s) AS ts",
        "current_timezone() AS tz"]).build())
    assert out["dn"] == ["Monday", "Saturday", "Thursday", "Tuesday"]
    assert out["mn"] == ["January", "February", "March", "April"]
    assert out["hrs"] == [
        "1 hour, 2 minutes, 5 seconds", "59 seconds", "0 seconds",
        "1 day, 1 hour, 1 minute, 1 second"]
    assert out["td"][0] == "date" and out["ts"][0] == "bigint"
    assert out["tz"][0] == "UTC"
