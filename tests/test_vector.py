"""Tests for types + vector layer (analog: velox/vector/tests)."""

import numpy as np
import pyarrow as pa
import pytest

from velox_tpu.types import (
    BIGINT, BOOLEAN, DOUBLE, INTEGER, VARCHAR, DATE,
    BigintRange, DoubleRange, BigintValuesUsingHashTable, IsNull, IsNotNull,
)
from velox_tpu.types.types import DECIMAL, common_numeric_type, REAL
from velox_tpu.vector import Batch, from_arrow, to_arrow
from velox_tpu.vector.batch import round_capacity
from velox_tpu.vector.column import Dictionary, make_column

import jax.numpy as jnp


def test_round_capacity():
    assert round_capacity(1) == 128
    assert round_capacity(128) == 128
    assert round_capacity(129) == 256
    assert round_capacity(1000) == 1024


def test_type_widening():
    assert common_numeric_type(INTEGER, BIGINT) == BIGINT
    assert common_numeric_type(BIGINT, DOUBLE) == DOUBLE
    assert common_numeric_type(REAL, DOUBLE) == DOUBLE


def test_batch_from_pydict_and_back():
    b = Batch.from_pydict(
        {"a": [1, 2, 3], "s": ["x", "y", None]},
        {"a": BIGINT, "s": VARCHAR},
    )
    assert b.capacity == 128
    assert b.num_rows == 3
    assert b.selected_count() == 3
    out = b.to_pydict()
    assert out["a"] == [1, 2, 3]
    assert out["s"] == ["x", "y", None]


def test_nulls_roundtrip():
    b = Batch.from_pydict(
        {"a": [1, None, 3, None]},
        {"a": BIGINT},
    )
    assert b.to_pydict()["a"] == [1, None, 3, None]


def test_dictionary_encode_decode():
    d, codes = Dictionary.encode(["b", "a", "b", None, "c"])
    assert len(d) == 3
    assert list(d.decode(codes)) == ["b", "a", "b", None, "c"]
    assert d.code_of("a") == 0  # sorted unique
    assert d.code_of("zzz") == -2


def test_arrow_roundtrip():
    t = pa.table({
        "i": pa.array([1, 2, None], type=pa.int64()),
        "f": pa.array([1.5, None, 3.5], type=pa.float64()),
        "s": pa.array(["foo", "bar", "foo"], type=pa.string()),
        "d": pa.array([0, 1, 2], type=pa.date32()),
    })
    b = from_arrow(t)
    assert b.num_rows == 3
    out = to_arrow(b)
    assert out.column("i").to_pylist() == [1, 2, None]
    assert out.column("f").to_pylist() == [1.5, None, 3.5]
    assert out.column("s").to_pylist() == ["foo", "bar", "foo"]
    assert out.column("d").to_pylist() == t.column("d").to_pylist()


def test_arrow_decimal_ingest():
    t = pa.table({
        "p": pa.array([None, 1], type=pa.decimal128(12, 2)),
    })
    b = from_arrow(t)
    col = b.column("p")
    assert col.dtype == DECIMAL(12, 2)
    np.testing.assert_array_equal(col.to_numpy(2), [0, 100])
    out = to_arrow(b)
    assert out.column("p").to_pylist()[1] == 1


def test_selection_mask_filtering():
    b = Batch.from_pydict({"a": list(range(10))}, {"a": BIGINT})
    col = b.column("a")
    mask = jnp.logical_and(b.sel, col.values % 2 == 0)
    b2 = b.with_sel(mask)
    assert b2.to_pydict()["a"] == [0, 2, 4, 6, 8]
    assert b2.selected_count() == 5


def test_filters():
    b = Batch.from_pydict({"a": [1, 5, 10, None]}, {"a": BIGINT})
    col = b.column("a")
    valid = col.validity()
    m = BigintRange(lower=2, upper=10).mask(col.values, valid)
    got = np.asarray(jnp.logical_and(m, b.sel))
    assert list(got[:4]) == [False, True, True, False]

    m = IsNull().mask(col.values, valid)
    assert list(np.asarray(jnp.logical_and(m, b.sel))[:4]) == [
        False, False, False, True]

    m = BigintValuesUsingHashTable(values=(1, 10)).mask(col.values, valid)
    assert list(np.asarray(jnp.logical_and(m, b.sel))[:4]) == [
        True, False, True, False]

    fcol, _ = make_column(DOUBLE, [0.1, 0.5, 0.9])
    m = DoubleRange(lower=0.1, upper=0.5, lower_exclusive=True).mask(
        fcol.values, fcol.validity())
    assert list(np.asarray(m)[:3]) == [False, True, False]


def test_gather():
    b = Batch.from_pydict({"a": [10, 20, 30]}, {"a": BIGINT})
    idx = jnp.asarray(np.array([2, 0, 1] + [0] * 125, dtype=np.int32))
    sel = jnp.asarray(np.array([True] * 3 + [False] * 125))
    g = b.gather(idx, sel, num_rows=3)
    assert g.to_pydict()["a"] == [30, 10, 20]
