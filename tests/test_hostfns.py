"""Regex / datetime-format / JSON / URL scalar functions
(velox/functions/lib/Re2Functions.h, DateTimeFormatter/,
prestosql/json/, URLFunctions.h analogs) as bind-time dictionary
transforms."""

import datetime as dt

import pyarrow as pa
import pytest

from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.io import drop_table, register_arrow
from velox_tpu.types import VARCHAR
from velox_tpu.vector.batch import Batch


def _proj(data, types, exprs):
    b = Batch.from_pydict(data, types)
    return run_plan_pydict(
        PlanBuilder().values([b]).project(exprs).build())


def test_regexp_functions():
    out = _proj(
        {"s": ["abc123", "no digits", "x9y8", None]}, {"s": VARCHAR},
        ["regexp_like(s, '[0-9]') AS m",
         "regexp_extract(s, '[0-9]+') AS d",
         "regexp_extract(s, '([a-z]+)([0-9]+)', 1) AS g1",
         "regexp_replace(s, '[0-9]', '#') AS r",
         "regexp_count(s, '[0-9]') AS n",
         "regexp_position(s, '[0-9]') AS p"])
    assert out["m"] == [True, False, True, None]
    assert out["d"] == ["123", None, "9", None]
    assert out["g1"] == ["abc", None, "x", None]
    assert out["r"] == ["abc###", "no digits", "x#y#", None]
    assert out["n"] == [3, 0, 2, None]
    assert out["p"] == [4, -1, 2, None]


def test_json_functions():
    js = ['{"k": 1, "arr": [10, 20]}', '{"k": "v"}', "[1,2,3]",
          "not json"]
    out = _proj(
        {"j": js}, {"j": VARCHAR},
        ["json_extract_scalar(j, '$.k') AS k",
         "json_extract_scalar(j, '$.arr[1]') AS a1",
         "json_extract(j, '$.arr') AS arr",
         "json_array_length(j) AS n",
         "json_size(j, '$.arr') AS sz",
         "is_json_scalar(j) AS sc"])
    assert out["k"] == ["1", "v", None, None]
    assert out["a1"] == ["20", None, None, None]
    assert out["arr"] == ["[10,20]", None, None, None]
    assert out["n"] == [None, None, 3, None]
    assert out["sz"] == [2, None, None, None]
    assert out["sc"] == [False, False, False, None]


def test_url_functions():
    us = ["https://user@www.ex.com:8443/a/b?q=1&z=zz#top",
          "http://plain.org/x", "not a url"]
    out = _proj(
        {"u": us}, {"u": VARCHAR},
        ["url_extract_host(u) AS h", "url_extract_protocol(u) AS pr",
         "url_extract_path(u) AS pa", "url_extract_query(u) AS q",
         "url_extract_fragment(u) AS f", "url_extract_port(u) AS po",
         "url_extract_parameter(u, 'z') AS z"])
    assert out["h"] == ["www.ex.com", "plain.org", None]
    assert out["pr"] == ["https", "http", None]
    assert out["pa"] == ["/a/b", "/x", None]
    assert out["q"] == ["q=1&z=zz", None, None]
    assert out["f"] == ["top", None, None]
    assert out["po"] == [8443, None, None]
    assert out["z"] == ["zz", None, None]


def test_parse_datetime_and_iso8601():
    out = _proj(
        {"s": ["2023-07-04 12:30:45", "garbage"],
         "d": ["2021-02-03", "x"],
         "t": ["2021-02-03T04:05:06Z", "y"]},
        {"s": VARCHAR, "d": VARCHAR, "t": VARCHAR},
        ["parse_datetime(s, 'yyyy-MM-dd HH:mm:ss') AS ts",
         "from_iso8601_date(d) AS dd",
         "from_iso8601_timestamp(t) AS tt"])
    assert out["ts"][0] == dt.datetime(2023, 7, 4, 12, 30, 45)
    assert out["ts"][1] is None
    assert out["dd"][0] == dt.date(2021, 2, 3)
    assert out["dd"][1] is None
    assert out["tt"][0] == dt.datetime(2021, 2, 3, 4, 5, 6)
    assert out["tt"][1] is None


def test_misc_string_functions():
    out = _proj(
        {"s": ["kitten", "flask", ""]}, {"s": VARCHAR},
        ["levenshtein_distance(s, 'sitting') AS lev",
         "codepoint(s) AS cp", "crc32(s) AS crc",
         "word_stem(s) AS st", "sha256(s) AS sh"])
    assert out["lev"] == [3, 7, 7]
    assert out["cp"] == [ord("k"), ord("f"), None]
    assert out["st"][0] == "kitten"
    assert all(isinstance(x, str) and len(x) == 64 for x in out["sh"])


def test_date_format_on_date_column():
    # date_format needs column stats -> register through the catalog
    days = [19000, 19360, 19001]
    register_arrow("df_t", pa.table({
        "d": pa.array([dt.date(1970, 1, 1) + dt.timedelta(days=x)
                       for x in days])}), 128)
    try:
        out = run_plan_pydict(
            PlanBuilder().table_scan("df_t", columns=["d"])
            .project(["date_format(d, '%Y-%m-%d') AS iso",
                      "date_format(d, '%d/%m/%y') AS uk",
                      "format_datetime(d, 'yyyy/MM/dd') AS joda"])
            .build())
        exp = [dt.date(1970, 1, 1) + dt.timedelta(days=x) for x in days]
        assert out["iso"] == [e.strftime("%Y-%m-%d") for e in exp]
        assert out["uk"] == [e.strftime("%d/%m/%y") for e in exp]
        assert out["joda"] == [e.strftime("%Y/%m/%d") for e in exp]
    finally:
        drop_table("df_t")


def test_regexp_in_filter_and_group():
    b = Batch.from_pydict(
        {"s": ["a1", "b2", "a3", "c", "a9"]}, {"s": VARCHAR})
    out = run_plan_pydict(
        PlanBuilder().values([b])
        .filter("regexp_like(s, '^a')")
        .aggregate([], ["count(*) AS n"]).build())
    assert out["n"] == [3]
