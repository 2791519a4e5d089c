"""MAP columns + map functions.

Parity: velox/vector/ComplexVector.h:589 MapVector;
velox/functions/prestosql MapSubscript / map_keys / map_values.
"""

import pyarrow as pa

from velox_tpu.types import BIGINT, VARCHAR
from velox_tpu.types.types import MapType, TypeKind
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan_pydict
from velox_tpu.vector import from_arrow
from velox_tpu.vector.batch import Batch
from velox_tpu.vector.column import MapColumn

INT_MAP = MapType(TypeKind.MAP, BIGINT, BIGINT)
STR_MAP = MapType(TypeKind.MAP, VARCHAR, BIGINT)

DATA = {"id": [1, 2, 3, 4],
        "m": [{1: 10, 2: 20}, {}, None, {2: 200, 5: None}]}
TYPES = {"id": BIGINT, "m": INT_MAP}


def _run(data, types, exprs, filter=None):
    pb = PlanBuilder().values([Batch.from_pydict(data, types)])
    if filter:
        pb = pb.filter(filter)
    return run_plan_pydict(pb.project(exprs).build())


def _as_dicts(entries):
    """Host MAP output is (k, v) entry-tuple lists (duplicate keys are
    legal mid-pipeline, e.g. split_to_multimap); normalize for compare."""
    return [None if e is None else dict(e) for e in entries]


def test_roundtrip():
    b = Batch.from_pydict(DATA, TYPES)
    assert isinstance(b.column("m"), MapColumn)
    assert _as_dicts(b.to_pydict()["m"]) == DATA["m"]


def test_arrow_map_roundtrip():
    t = pa.table({"m": pa.array(
        [[("a", 1), ("b", 2)], None, [("c", 3)]],
        pa.map_(pa.string(), pa.int64()))})
    b = from_arrow(t)
    assert _as_dicts(b.to_pydict()["m"]) == [
        {"a": 1, "b": 2}, None, {"c": 3}]


def test_cardinality():
    out = _run(DATA, TYPES, ["cardinality(m) as c"])
    assert out["c"] == [2, 0, None, 2]


def test_element_at_int_keys():
    out = _run(DATA, TYPES, [
        "element_at(m, 2) as e2", "element_at(m, 9) as e9",
        "element_at(m, 5) as e5",
    ])
    assert out["e2"] == [20, None, None, 200]
    assert out["e9"] == [None, None, None, None]
    # present key with null value -> NULL
    assert out["e5"] == [None, None, None, None]


def test_element_at_string_keys():
    data = {"m": [{"x": 7, "y": 8}, {"y": 9}]}
    out = _run(data, {"m": STR_MAP}, [
        "element_at(m, 'y') as ey", "element_at(m, 'z') as ez"])
    assert out["ey"] == [8, 9]
    assert out["ez"] == [None, None]


def test_element_at_zero_value():
    out = _run({"m": [{1: 0}]}, {"m": INT_MAP},
               ["element_at(m, 1) as e"])
    assert out["e"] == [0]


def test_map_keys_values():
    out = _run(DATA, TYPES, [
        "id", "map_keys(m) as ks", "map_values(m) as vs"])
    assert out["ks"] == [[1, 2], [], None, [2, 5]]
    assert out["vs"] == [[10, 20], [], None, [200, None]]


def test_map_keys_then_array_fns():
    b = Batch.from_pydict(DATA, TYPES)
    plan = (PlanBuilder().values([b])
            .project(["id", "map_keys(m) as ks"])
            .project(["id", "array_sum(ks) as s",
                      "contains(ks, 2) as has2"])
            .build())
    out = run_plan_pydict(plan)
    assert out["s"] == [3, 0, None, 7]
    assert out["has2"] == [True, False, None, True]


def test_map_in_filter():
    out = _run(DATA, TYPES, ["id"],
               filter="element_at(m, 2) > 50")
    assert out["id"] == [4]
