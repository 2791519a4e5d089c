"""Round-3 scalar breadth: probability fns, binary/JSON host fns,
Java-regex translation, session timezone (velox/functions/prestosql
Probability*.h, BinaryFunctions.h, JsonFunctions.h,
lib/Re2Functions.h; velox/core/QueryConfig.h:103 session timezone +
velox/type/tz/)."""

import datetime as dt
import hashlib
from zoneinfo import ZoneInfo

import numpy as np
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import DOUBLE, TIMESTAMP, VARCHAR
from velox_tpu.utils.config import config
from velox_tpu.vector.batch import Batch


def _run(data, types, exprs):
    return run_plan_pydict(
        PlanBuilder().values([Batch.from_pydict(data, types)])
        .project(exprs).build())


def test_probability_functions_vs_scipy():
    import scipy.stats as st

    xs = [0.2, 0.5, 0.8]
    out = _run({"x": xs}, {"x": DOUBLE}, [
        "normal_cdf(0.0, 1.0, x) AS nc",
        "inverse_normal_cdf(0.0, 1.0, x) AS inc",
        "beta_cdf(2.0, 5.0, x) AS bc",
        "cauchy_cdf(0.0, 1.0, x) AS cc",
        "chi_squared_cdf(2.0, x) AS ch",
        "gamma_cdf(2.0, 3.0, x) AS gc",
        "laplace_cdf(0.0, 1.0, x) AS lc",
        "poisson_cdf(1.5, 2.0) AS pc",
        "weibull_cdf(1.5, 1.0, x) AS wc",
        "f_cdf(2.0, 5.0, x) AS fc",
        "binomial_cdf(20.0, 0.3, 7.0) AS bn",
    ])
    for i, x in enumerate(xs):
        assert out["nc"][i] == pytest.approx(st.norm.cdf(x), abs=2e-6)
        assert out["inc"][i] == pytest.approx(st.norm.ppf(x), abs=2e-5)
        assert out["bc"][i] == pytest.approx(
            st.beta.cdf(x, 2, 5), abs=2e-6)
        assert out["cc"][i] == pytest.approx(
            st.cauchy.cdf(x), abs=2e-6)
        assert out["ch"][i] == pytest.approx(
            st.chi2.cdf(x, 2), abs=2e-6)
        assert out["gc"][i] == pytest.approx(
            st.gamma.cdf(x, 2, scale=3), abs=2e-6)
        assert out["lc"][i] == pytest.approx(
            st.laplace.cdf(x), abs=2e-6)
        assert out["wc"][i] == pytest.approx(
            st.weibull_min.cdf(x, 1.5), abs=2e-6)
        assert out["fc"][i] == pytest.approx(
            st.f.cdf(x, 2, 5), abs=2e-6)
    assert out["pc"][0] == pytest.approx(
        st.poisson.cdf(2, 1.5), abs=2e-6)
    assert out["bn"][0] == pytest.approx(
        st.binom.cdf(7, 20, 0.3), abs=2e-6)


def test_width_bucket():
    out = _run({"x": [-0.5, 0.0, 0.4, 1.0, 2.0]}, {"x": DOUBLE},
               ["width_bucket(x, 0.0, 1.0, 4) AS b"])
    assert out["b"] == [0, 1, 2, 5, 5]


def test_binary_functions():
    s = "hello"
    out = _run({"s": [s]}, {"s": VARCHAR}, [
        "sha1(s) AS sha1", "sha512(s) AS sha512",
        "xxhash64(s) AS xx", "to_hex(s) AS hex",
        "to_base64(s) AS b64", "from_base64(to_base64(s)) AS rt64",
        "to_base32(s) AS b32", "from_base32(to_base32(s)) AS rt32",
        "hmac_sha256(s, 'key') AS hm",
        "from_hex(to_hex(s)) AS rth",
    ])
    import base64
    import hmac

    assert out["sha1"][0] == hashlib.sha1(s.encode()).hexdigest()
    assert out["sha512"][0] == hashlib.sha512(s.encode()).hexdigest()
    # XXH64("hello", seed 0) reference vector
    assert out["xx"][0] == "26c7827d889f6da3"
    assert out["hex"][0] == s.encode().hex().upper()
    assert out["rt64"][0] == s and out["rt32"][0] == s
    assert out["rth"][0] == s
    assert out["hm"][0] == hmac.new(
        b"key", s.encode(), "sha256").hexdigest()


def test_string_additions():
    out = _run({"s": ["Robert", "4532015112830366", "abcd"]},
               {"s": VARCHAR}, [
        "soundex(s) AS sx",
        "translate(s, 'abco', 'xyz') AS tr",
        "luhn_check(s) AS lc",
        "trim(s, 'Rt') AS t2",
        "url_encode(s) AS ue",
    ])
    assert out["sx"][0] == "R163"
    assert out["tr"][2] == "xyzd"  # a->x, b->y, c->z; 'o' dropped
    assert out["lc"][1] is True
    assert out["t2"][0] == "ober"


def test_json_additions():
    out = _run({"j": ['{"b":1,"a":[1,2]}', "nope"]}, {"j": VARCHAR}, [
        "json_parse(j) AS jp",
        "json_array_contains('[1,2,3]', 2) AS jc",
        "json_array_get(j, 0) AS jg",
    ])
    assert out["jp"][0] == '{"a":[1,2],"b":1}'
    assert out["jp"][1] is None
    assert out["jc"] == [True, True]


def test_java_regex_semantics():
    out = _run({"s": ["abc123", "héllo", "a.b"]}, {"s": VARCHAR}, [
        r"regexp_like(s, '^\p{Alpha}+\p{Digit}+$') AS a",
        r"regexp_like(s, '^\p{L}+$') AS l",
        r"regexp_like(s, '^\Qa.b\E$') AS q",
        r"regexp_like(s, '^[[:alpha:][:digit:]]+$') AS px",
    ])
    assert out["a"] == [True, False, False]
    assert out["l"] == [False, True, False]
    assert out["q"] == [False, False, True]
    assert out["px"] == [True, False, False]


def test_session_timezone_parts():
    instants = [
        dt.datetime(2001, 7, 15, 1, 45, tzinfo=dt.timezone.utc),
        dt.datetime(2021, 12, 31, 23, 30, tzinfo=dt.timezone.utc),
        dt.datetime(2021, 3, 14, 6, 30, tzinfo=dt.timezone.utc),
        dt.datetime(1969, 6, 1, 12, 0, tzinfo=dt.timezone.utc),
    ]
    data = {"t": [int(t.timestamp() * 1e6) for t in instants]}
    exprs = ["year(t) AS y", "month(t) AS m", "day(t) AS d",
             "hour(t) AS h", "minute(t) AS mi",
             "day_of_week(t) AS dw", "quarter(t) AS q",
             "timezone_hour(t) AS tzh", "timezone_minute(t) AS tzm"]
    for zone in ("UTC", "America/New_York", "Asia/Kolkata"):
        config.session_timezone = zone
        try:
            got = _run(data, {"t": TIMESTAMP}, exprs)
        finally:
            config.session_timezone = "UTC"
        zi = ZoneInfo(zone)
        exp = [t.astimezone(zi) for t in instants]
        assert got["y"] == [e.year for e in exp], zone
        assert got["m"] == [e.month for e in exp], zone
        assert got["d"] == [e.day for e in exp], zone
        assert got["h"] == [e.hour for e in exp], zone
        assert got["mi"] == [e.minute for e in exp], zone
        assert got["q"] == [(e.month - 1) // 3 + 1 for e in exp], zone
        offs = [e.utcoffset().total_seconds() for e in exp]
        assert got["tzh"] == [
            int(abs(o) // 3600) * (1 if o >= 0 else -1)
            for o in offs], zone
        assert got["tzm"] == [
            int((abs(o) % 3600) // 60) * (1 if o >= 0 else -1)
            for o in offs], zone


def test_at_timezone_and_with_timezone():
    t0 = dt.datetime(2021, 6, 1, 18, 0, tzinfo=dt.timezone.utc)
    data = {"t": [int(t0.timestamp() * 1e6)]}
    got = _run(data, {"t": TIMESTAMP}, [
        "hour(at_timezone(t, 'Europe/Berlin')) AS hb",
        "hour(at_timezone(t, '+05:30')) AS hk",
        "hour(with_timezone(at_timezone(t, 'Europe/Berlin'), "
        "'Europe/Berlin')) AS rt",
    ])
    assert got["hb"][0] == t0.astimezone(
        ZoneInfo("Europe/Berlin")).hour
    assert got["hk"][0] == (18 + 5) % 24  # +05:30 -> 23:30
    assert got["rt"][0] == 18  # with_timezone inverts at_timezone


# ---------------------------------------------- round-5 breadth batch

def test_round5_math_batch():
    import pyarrow as pa

    from velox_tpu.exec import run_plan_pydict
    from velox_tpu.io.catalog import drop_table, register_arrow
    from velox_tpu.plan import PlanBuilder

    t = pa.table({"x": [1.0, None], "y": [2.0, 3.0],
                  "a": pa.array([[3.0, 4.0], [1.0]],
                                pa.list_(pa.float64())),
                  "b": pa.array([[1.0, 2.0], [5.0]],
                                pa.list_(pa.float64()))})
    register_arrow("r5m", t, 8)
    try:
        out = run_plan_pydict(PlanBuilder().table_scan("r5m").project([
            "atan2(x, y) AS a2",
            "great_circle_distance(36.12, -86.67, 33.94, -118.40)"
            " AS gc",
            "distinct_from(x, y) AS df",
            "distinct_from(x, x) AS sf",
            "dot_product(a, b) AS dp",
            "l2_squared(a, b) AS l2",
            "l2_norm(a) AS n",
            "bitwise_right_shift_arithmetic(-8, 1) AS brs",
            "array_split_into_chunks(a, 1) AS ch",
        ]).build())
    finally:
        drop_table("r5m")
    import math

    assert out["a2"][0] == pytest.approx(math.atan2(1.0, 2.0))
    assert out["a2"][1] is None
    # Presto doc example: Nashville-LA ~= 2886.45 km
    assert out["gc"][0] == pytest.approx(2886.449, abs=0.01)
    # IS DISTINCT FROM never returns NULL
    assert out["df"] == [True, True]
    assert out["sf"] == [False, False]
    assert out["dp"] == [11.0, 5.0]
    assert out["l2"] == [8.0, 16.0]
    assert out["n"] == [5.0, 1.0]
    assert out["brs"] == [-4, -4]
    assert out["ch"] == [[[3.0], [4.0]], [[1.0]]]


def test_round5_tdigest_readers():
    import pyarrow as pa

    from velox_tpu.exec import run_plan_pydict
    from velox_tpu.io.catalog import drop_table, register_arrow
    from velox_tpu.plan import PlanBuilder

    # unsorted group lane: collect-family aggs take the hash path
    t = pa.table({"g": [i % 2 for i in range(1000)],
                  "v": [float(i // 2) for i in range(1000)]})
    register_arrow("r5d", t, 1024)
    try:
        agg = (PlanBuilder().table_scan("r5d")
               .aggregate(["g"], ["tdigest_agg(v) AS d"]))
        out = run_plan_pydict(
            agg.project([
                "value_at_quantile(scale_tdigest(d, 2.0), 0.5) AS m",
                "trimmed_mean(d, 0.25, 0.75) AS tm",
            ]).build())
    finally:
        drop_table("r5d")
    # scaling weights does not move quantiles (each group holds
    # 0..499)
    for m in out["m"]:
        assert m == pytest.approx(249.5, rel=0.05)
    for tm in out["tm"]:
        assert tm == pytest.approx(249.5, rel=0.05)
