"""Round-3 extended array/map functions (exec/complex_fns.py,
expr/compiler.py map-match + find-first bindings).

Parity: velox/functions/prestosql ArrayFunctions.h, MapFunctions.h,
MapSubset/Except/Intersect/TopN/Normalize/ValuesInRange headers,
ArrayDuplicates.cpp (sorted-ascending nulls-first expectations from
ArrayDuplicatesTest.cpp), FindFirst.cpp, ArrayMinMaxBy, SplitToMap.h.
"""

import pytest

from velox_tpu.types import BIGINT, DOUBLE, VARCHAR
from velox_tpu.types.types import array as array_type, map_ as map_type
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector.batch import Batch


def _run(data, types, exprs):
    pb = PlanBuilder().values([Batch.from_pydict(data, types)])
    return run_plan_pydict(pb.project(exprs).build())


ARRS = {"id": [1, 2, 3, 4],
        "xs": [[3, 1, 2, 1], [], None, [10, None, 30]],
        "fs": [[3.0, 4.0], [1.0], [0.0], None]}
TYPES = {"id": BIGINT, "xs": array_type(BIGINT), "fs": array_type(DOUBLE)}

MAPS = {"m": [{"a": 3, "b": 1, "c": 2}, {}, None, {"d": None, "e": 5}]}
MTYPES = {"m": map_type(VARCHAR, BIGINT)}


def test_array_cum_sum():
    out = _run(ARRS, TYPES, ["array_cum_sum(xs) as cs"])
    # elements after a NULL go NULL (Presto rule)
    assert out["cs"] == [[3, 4, 6, 7], [], None, [10, None, None]]


def test_array_sort_desc():
    out = _run(ARRS, TYPES, ["array_sort_desc(xs) as d"])
    assert out["d"] == [[3, 2, 1, 1], [], None, [30, 10, None]]


def test_array_duplicates():
    out = _run(ARRS, TYPES, ["array_duplicates(xs) as dup",
                             "array_has_duplicates(xs) as hd"])
    assert out["dup"] == [[1], [], None, []]
    assert out["hd"] == [True, False, None, False]


def test_array_top_n_trim_remove():
    out = _run(ARRS, TYPES, ["array_top_n(xs, 2) as t2",
                             "remove_nulls(xs) as rn",
                             "trim_array(xs, 1) as tr"])
    assert out["t2"] == [[3, 2], [], None, [30, 10]]
    assert out["rn"] == [[3, 1, 2, 1], [], None, [10, 30]]
    assert out["tr"] == [[3, 1, 2], [], None, [10, None]]


def test_array_normalize():
    out = _run(ARRS, TYPES, ["array_normalize(fs, 2.0) as nn"])
    assert out["nn"] == [[0.6, 0.8], [1.0], [0.0], None]


def test_transform_with_index():
    out = _run(ARRS, TYPES,
               ["transform_with_index(xs, (x, i) -> x * i) as ti"])
    assert out["ti"] == [[3, 2, 6, 4], [], None, [10, None, 90]]


def test_shuffle_permutes_within_rows():
    out = _run(ARRS, TYPES, ["shuffle(xs) as sh"])["sh"]
    assert sorted(out[0]) == [1, 1, 2, 3]
    assert out[1] == [] and out[2] is None
    assert sorted(x for x in out[3] if x is not None) == [10, 30]


def test_array_join_and_typeof():
    out = _run(ARRS, TYPES, ["array_join(xs, ',', 'NULL') as j",
                             "typeof(xs) as t"])
    assert out["j"] == ["3,1,2,1", "", None, "10,NULL,30"]
    assert out["t"][0].startswith("array")


def test_find_first_and_minmax_by():
    out = _run(ARRS, TYPES, ["find_first(xs, x -> x > 1) as f",
                             "find_first_index(xs, x -> x > 1) as fi",
                             "array_max_by(xs, x -> -x) as mb",
                             "array_min_by(xs, x -> -x) as nb"])
    assert out["f"] == [3, None, None, 10]
    assert out["fi"] == [1, None, None, 1]
    assert out["mb"] == [1, None, None, 10]
    assert out["nb"] == [3, None, None, 30]


def test_array_constructor_and_subscript():
    out = _run({"x": [1, 2]}, {"x": BIGINT},
               ["array[x, x + 1, 7] as ac",
                "array[x, 9][2] as sub"])
    assert out["ac"] == [[1, 2, 7], [2, 3, 7]]
    assert out["sub"] == [9, 9]


def test_map_subset_except_intersect():
    out = _run(MAPS, MTYPES,
               ["map_subset(m, array['a','c']) as s",
                "map_intersect(m, array['a','c']) as i",
                "map_except(m, array['a']) as ex"])
    assert out["s"] == [[("a", 3), ("c", 2)], [], None, []]
    assert out["i"] == out["s"]
    assert out["ex"] == [[("b", 1), ("c", 2)], [], None,
                         [("d", None), ("e", 5)]]


def test_map_top_n_family():
    out = _run(MAPS, MTYPES,
               ["map_top_n(m, 2) as t", "map_top_n_keys(m, 2) as tk",
                "map_top_n_values(m, 2) as tv",
                "map_keys_by_top_n_values(m, 2) as kb"])
    # by value desc, ties by key desc (MapTopNImpl.h comparator)
    assert out["t"] == [[("a", 3), ("c", 2)], [], None,
                        [("e", 5), ("d", None)]]
    assert out["tk"] == [["c", "b"], [], None, ["e", "d"]]
    assert out["tv"] == [[3, 2], [], None, [5, None]]
    assert out["kb"] == [["a", "c"], [], None, ["e", "d"]]


def test_map_normalize_and_range():
    out = _run(MAPS, MTYPES, ["map_normalize(m) as n",
                              "map_values_in_range(m, 2, 5) as vr"])
    assert out["n"][0] == [("a", 0.5), ("b", 1 / 6), ("c", 1 / 3)]
    # null values preserved (MapValuesInRange.h)
    assert out["vr"] == [[("a", 3), ("c", 2)], [], None,
                        [("d", None), ("e", 5)]]


def test_map_key_predicates():
    out = _run(MAPS, MTYPES,
               ["map_remove_null_values(m) as rnv",
                "map_key_exists(m, 'b') as ke",
                "map_keys_overlap(m, array['b','z']) as ko"])
    assert out["rnv"][3] == [("e", 5)]
    assert out["ke"] == [True, False, None, False]
    assert out["ko"] == [True, False, None, False]


def test_map_match_lambdas():
    out = _run(MAPS, MTYPES,
               ["any_values_match(m, v -> v > 1) as avm",
                "all_keys_match(m, k -> k <> 'zzz') as akm",
                "no_values_match(m, v -> v > 5) as nvm"])
    # row 4 values [NULL, 5]: anyMatch wins over hasNull
    # (ArrayAndMapMatch.cpp:135-146 kAny truth table)
    assert out["avm"] == [True, False, None, True]
    assert out["akm"] == [True, True, None, True]
    assert out["nvm"] == [True, True, None, None]


def test_remap_keys():
    out = _run(MAPS, MTYPES,
               ["remap_keys(m, array['a'], array['z']) as rk"])
    assert out["rk"][0] == [("z", 3), ("b", 1), ("c", 2)]


def test_map_constructor_and_from_entries():
    data = {"ks": [["x", "y"], ["z"], None],
            "vs": [[1, 2], [3], [4]]}
    types = {"ks": array_type(VARCHAR), "vs": array_type(BIGINT)}
    out = _run(data, types, ["map(ks, vs) as m2"])
    assert out["m2"] == [[("x", 1), ("y", 2)], [("z", 3)], None]


def test_split_to_map():
    data = {"s": ["a=1,b=2", "", "k=9", None]}
    out = _run(data, {"s": VARCHAR},
               ["split_to_map(s, ',', '=') as sm"])
    assert out["sm"] == [[("a", "1"), ("b", "2")], [], [("k", "9")],
                         None]


def test_split_to_map_last_wins():
    data = {"s": ["a=1,a=2"]}
    out = _run(data, {"s": VARCHAR},
               ["split_to_map(s, ',', '=') as sm",
                "split_to_multimap(s, ',', '=') as mm"])
    assert out["sm"] == [[("a", "2")]]
    # documented deviation: duplicate keys repeat as entries instead
    # of collecting into MAP(K, ARRAY(V))
    assert out["mm"] == [[("a", "1"), ("a", "2")]]


# --------------------------------------------- round-5 long tail

NEST = {"aa": [[[1, 2], None, [3]], [[4]], None, []]}
NTYPES = {"aa": array_type(array_type(BIGINT))}


def test_flatten():
    out = _run(NEST, NTYPES, ["flatten(aa) as f"])
    # NULL inner arrays are skipped (ArrayFlatten.cpp:191)
    assert out["f"] == [[1, 2, 3], [4], None, []]


def test_ngrams():
    data = {"xs": [["a", "b", "c"], ["a"], None]}
    out = _run(data, {"xs": array_type(VARCHAR)},
               ["ngrams(xs, 2) as g"])
    assert out["g"] == [[["a", "b"], ["b", "c"]], [["a"]], None]


def test_combinations():
    data = {"xs": [[1, 2, 3], [7], None]}
    out = _run(data, {"xs": array_type(BIGINT)},
               ["combinations(xs, 2) as c"])
    assert out["c"] == [[[1, 2], [1, 3], [2, 3]], [], None]


def test_array_frequency():
    data = {"xs": [[1, 2, 1, None], [], None]}
    out = _run(data, {"xs": array_type(BIGINT)},
               ["array_frequency(xs) as f"])
    assert out["f"] == [[(1, 2), (2, 1)], [], None]


def test_multimap_from_entries():
    data = {"ks": [["a", "b", "a"], ["z"], None],
            "vs": [[1, 2, 3], [9], [0]]}
    types = {"ks": array_type(VARCHAR), "vs": array_type(BIGINT)}
    out = _run(data, types,
               ["multimap_from_entries(zip(ks, vs)) as mm"])
    assert out["mm"] == [[("a", [1, 3]), ("b", [2])], [("z", [9])],
                         None]


def test_cosine_similarity():
    m = {"m1": [{"a": 1.0, "b": 0.0}, {"x": 2.0}, None],
         "m2": [{"a": 1.0, "b": 0.0}, {"y": 3.0}, {"a": 1.0}]}
    t = {"m1": map_type(VARCHAR, DOUBLE), "m2": map_type(VARCHAR, DOUBLE)}
    out = _run(m, t, ["cosine_similarity(m1, m2) as c"])
    assert out["c"][0] == pytest.approx(1.0)
    assert out["c"][1] == pytest.approx(0.0)
    assert out["c"][2] is None


def test_map_zip_with():
    m = {"m1": [{"a": 1.0, "b": 2.0}, {"c": 3.0}, None],
         "m2": [{"a": 10.0, "d": 5.0}, {"c": 30.0}, {"x": 1.0}]}
    t = {"m1": map_type(VARCHAR, DOUBLE), "m2": map_type(VARCHAR, DOUBLE)}
    out = _run(m, t, [
        "map_zip_with(m1, m2, (k, v1, v2) ->"
        " coalesce(v1, 0.0) + coalesce(v2, 0.0)) as z"])
    assert out["z"] == [[("a", 11.0), ("b", 2.0), ("d", 5.0)],
                        [("c", 33.0)], None]


def test_nested_complex_calls_decompose():
    # ngrams(split(...)) exercises the builder's nested-call peel
    data = {"s": ["x y z", None]}
    out = _run(data, {"s": VARCHAR},
               ["ngrams(split(s, ' '), 2) as g",
                "cardinality(flatten(ngrams(split(s, ' '), 2))) as n"])
    assert out["g"] == [[["x", "y"], ["y", "z"]], None]
    assert out["n"] == [4, None]
