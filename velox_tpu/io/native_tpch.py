"""ctypes binding for the native TPC-H generator (native/tpchgen.cpp).

The velox-embedded-dbgen analog: the two big tables' numeric columns
generate in native code (~20x the numpy path), strings arrive as int8
codes + dictionaries (zero-copy into the engine's dictionary-encoded
columns). Compiled on demand with g++; falls back to the numpy generator
when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "tpchgen.cpp")
_SO = os.path.join(_REPO, "native", "build", "libtpchgen.so")

_SHIP_MODES = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]
_SHIP_INSTRUCT = [
    "COLLECT COD", "DELIVER IN PERSON", "NONE", "TAKE BACK RETURN"]
_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_RETURNFLAGS = ["A", "N", "R"]
_LINESTATUS = ["F", "O"]
_ORDERSTATUS = ["F", "O", "P"]

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(_SO)
    lib.tpch_gen_orders.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def gen_orders_lineitem_native(sf: float) -> Optional[Tuple]:
    """(orders pa.Table, lineitem pa.Table, cents dict) or None if no
    native toolchain. Money columns are float64 dollars in the tables;
    the raw int32 cents arrays are returned alongside for decimal-mode
    ingestion without reconversion."""
    lib = _load()
    if lib is None:
        return None
    num_orders = int(1_500_000 * sf)
    num_cust = int(150_000 * sf)
    num_parts = int(200_000 * sf)
    num_supp = int(10_000 * sf)
    seed = 20260816

    line_counts = np.empty(num_orders, np.int32)
    o_custkey = np.empty(num_orders, np.int64)
    o_orderdate = np.empty(num_orders, np.int32)
    o_prio = np.empty(num_orders, np.int8)
    total = lib.tpch_gen_orders(
        ctypes.c_int64(num_orders), ctypes.c_int64(num_cust),
        ctypes.c_int64(seed), _p(line_counts), _p(o_custkey),
        _p(o_orderdate), _p(o_prio))

    n = int(total)
    cols = {
        "l_orderkey": np.empty(n, np.int64),
        "l_partkey": np.empty(n, np.int64),
        "l_suppkey": np.empty(n, np.int64),
        "l_linenumber": np.empty(n, np.int64),
        "l_quantity": np.empty(n, np.int32),
        "l_extendedprice": np.empty(n, np.int32),
        "l_discount": np.empty(n, np.int32),
        "l_tax": np.empty(n, np.int32),
        "l_shipdate": np.empty(n, np.int32),
        "l_commitdate": np.empty(n, np.int32),
        "l_receiptdate": np.empty(n, np.int32),
        "l_returnflag": np.empty(n, np.int8),
        "l_linestatus": np.empty(n, np.int8),
        "l_shipmode": np.empty(n, np.int8),
        "l_shipinstruct": np.empty(n, np.int8),
    }
    o_status = np.empty(num_orders, np.int8)
    o_total = np.empty(num_orders, np.int64)
    lib.tpch_gen_lineitem(
        ctypes.c_int64(num_orders), ctypes.c_int64(num_parts),
        ctypes.c_int64(num_supp), ctypes.c_int64(seed),
        _p(line_counts), _p(o_orderdate),
        _p(cols["l_orderkey"]), _p(cols["l_partkey"]),
        _p(cols["l_suppkey"]), _p(cols["l_linenumber"]),
        _p(cols["l_quantity"]), _p(cols["l_extendedprice"]),
        _p(cols["l_discount"]), _p(cols["l_tax"]),
        _p(cols["l_shipdate"]), _p(cols["l_commitdate"]),
        _p(cols["l_receiptdate"]), _p(cols["l_returnflag"]),
        _p(cols["l_linestatus"]), _p(cols["l_shipmode"]),
        _p(cols["l_shipinstruct"]), _p(o_status), _p(o_total))

    def dict_col(codes: np.ndarray, values) -> pa.Array:
        return pa.DictionaryArray.from_arrays(
            pa.array(codes, type=pa.int8()), pa.array(values))

    rng = np.random.default_rng(seed)
    comment_pool = [
        f"{a} {b} requests" if i % 7 == 0 else f"{a} {b} deposits"
        for i, (a, b) in enumerate(
            (x, y) for x in ("final", "special", "regular", "ironic",
                             "pending", "bold")
            for y in ("packages", "accounts", "foxes", "ideas",
                      "theodolites", "excuses"))]
    n_clerks = max(int(1000 * sf), 2)
    clerk_pool = [f"Clerk#{c:09d}" for c in range(1, n_clerks + 1)]

    def dict16(codes: np.ndarray, values) -> pa.Array:
        return pa.DictionaryArray.from_arrays(
            pa.array(codes, type=pa.int32()), pa.array(values))

    orders = pa.table({
        "o_orderkey": np.arange(1, num_orders + 1, dtype=np.int64),
        "o_custkey": o_custkey,
        "o_orderstatus": dict_col(o_status, _ORDERSTATUS),
        "o_totalprice": o_total / 100.0,
        "o_orderdate": pa.array(o_orderdate, type=pa.date32()),
        "o_orderpriority": dict_col(o_prio, _PRIORITIES),
        "o_clerk": dict16(
            rng.integers(0, n_clerks, num_orders).astype(np.int32),
            clerk_pool),
        "o_shippriority": np.zeros(num_orders, dtype=np.int64),
        "o_comment": dict_col(
            rng.integers(0, len(comment_pool), num_orders).astype(
                np.int8), comment_pool),
    })
    lineitem = pa.table({
        "l_orderkey": cols["l_orderkey"],
        "l_partkey": cols["l_partkey"],
        "l_suppkey": cols["l_suppkey"],
        "l_linenumber": cols["l_linenumber"],
        "l_quantity": cols["l_quantity"] / 100.0,
        "l_extendedprice": cols["l_extendedprice"] / 100.0,
        "l_discount": cols["l_discount"] / 100.0,
        "l_tax": cols["l_tax"] / 100.0,
        "l_returnflag": dict_col(cols["l_returnflag"], _RETURNFLAGS),
        "l_linestatus": dict_col(cols["l_linestatus"], _LINESTATUS),
        "l_shipdate": pa.array(cols["l_shipdate"], type=pa.date32()),
        "l_commitdate": pa.array(cols["l_commitdate"], type=pa.date32()),
        "l_receiptdate": pa.array(
            cols["l_receiptdate"], type=pa.date32()),
        "l_shipinstruct": dict_col(cols["l_shipinstruct"],
                                   _SHIP_INSTRUCT),
        "l_shipmode": dict_col(cols["l_shipmode"], _SHIP_MODES),
        "l_comment": dict_col(
            rng.integers(0, 32, n).astype(np.int8),
            [f"c{i:02d} note" for i in range(32)]),
    })
    cents = {
        "l_extendedprice": cols["l_extendedprice"],
        "l_discount": cols["l_discount"],
        "l_quantity": cols["l_quantity"],
        "l_tax": cols["l_tax"],
        "l_shipdate": cols["l_shipdate"],
    }
    return orders, lineitem, cents
