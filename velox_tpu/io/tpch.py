"""TPC-H data generation (vectorized, deterministic).

The analog of velox's embedded dbgen (velox/tpch/gen/TpchGen.h:92-232 and
the tpch connector, velox/connectors/tpch/TpchConnector.h:211): tables are
generated on the fly — zero-dependency benchmark input. This is a
re-implementation of the TPC-H 3.0 specification's distributions in
vectorized numpy (NOT a port of dbgen's C): all spec-defined *structural*
rules that queries depend on are honored —

* 4 suppliers per part via the spec's supplier-selection formula (shared by
  partsupp and lineitem so Q2/Q9 joins behave),
* 1/3 of customers have no orders (Q13/Q22),
* o_orderstatus derived from lineitem linestatus (Q21),
* returnflag/linestatus/date arithmetic per spec section 4.2.3,
* p_retailprice formula, seasonal keyword injection in comments (Q13/Q16).

Randomness is a fixed-seed PCG64 per (table, scale factor), so any SF is
reproducible across hosts — the property the oracle tests rely on.
Monetary columns are DOUBLE (velox_tpch_benchmark's default mode).
"""

from __future__ import annotations

import datetime
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

_EPOCH = datetime.date(1970, 1, 1)


def _days(y, m, d) -> int:
    return (datetime.date(y, m, d) - _EPOCH).days


START_DATE = _days(1992, 1, 1)
CURRENT_DATE = _days(1995, 6, 17)
END_DATE = _days(1998, 12, 1)

# 25 nations -> region mapping (TPC-H spec, in nationkey order)
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SHIP_MODES = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]
SHIP_INSTRUCT = [
    "COLLECT COD", "DELIVER IN PERSON", "NONE", "TAKE BACK RETURN"]

_P_NAME_WORDS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished",
    "chartreuse", "chiffon", "chocolate", "coral", "cornflower",
    "cornsilk", "cream", "cyan", "dark", "deep", "dim", "dodger", "drab",
    "firebrick", "floral", "forest", "frosted", "gainsboro", "ghost",
    "goldenrod", "green", "grey", "honeydew", "hot", "hotpink", "indian",
    "ivory", "khaki", "lace", "lavender", "lawn", "lemon", "light",
    "lime", "linen", "magenta", "maroon", "medium", "metallic", "midnight",
    "mint", "misty", "moccasin", "navajo", "navy", "olive", "orange",
    "orchid", "pale", "papaya", "peach", "peru", "pink", "plum", "powder",
    "puff", "purple", "red", "rose", "rosy", "royal", "saddle", "salmon",
    "sandy", "seashell", "sienna", "sky", "slate", "smoke", "snow",
    "spring", "steel", "tan", "thistle", "tomato", "turquoise", "violet",
    "wheat", "white", "yellow",
]
_TYPE_SYL1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
_TYPE_SYL2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
_TYPE_SYL3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
_CONT_SYL1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
_CONT_SYL2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]

_COMMENT_WORDS = [
    "furiously", "quickly", "carefully", "blithely", "slyly", "final",
    "ironic", "pending", "regular", "express", "special", "bold", "even",
    "silent", "unusual", "requests", "deposits", "accounts", "packages",
    "instructions", "foxes", "theodolites", "pinto", "beans", "dependencies",
    "excuses", "platelets", "asymptotes", "courts", "dolphins", "multipliers",
    "sauternes", "warhorses", "sheaves", "realms", "ideas", "Customer",
    "Complaints", "Tiresias", "hockey", "players", "grouches", "sentiments",
]


def _rng(table: str, sf: float) -> np.random.Generator:
    return np.random.default_rng(
        abs(hash(("velox_tpu.tpch", table, float(sf)))) % (1 << 63))


def _money(x: np.ndarray) -> np.ndarray:
    """Round to cents (all monetary math in the spec is 2-dp)."""
    return np.round(x, 2)


def _comments(rng: np.random.Generator, n: int, nwords: int = 5
              ) -> np.ndarray:
    """Short comments from a fixed vocabulary (dictionary-friendly)."""
    idx = rng.integers(0, len(_COMMENT_WORDS), size=(n, nwords))
    words = np.asarray(_COMMENT_WORDS, dtype=object)
    out = words[idx[:, 0]]
    for k in range(1, nwords):
        out = out + " " + words[idx[:, k]]
    return out


def _part_suppliers(partkeys: np.ndarray, i: np.ndarray, num_supp: int
                    ) -> np.ndarray:
    """Spec 4.2.3 supplier selection: the i-th (0..3) supplier of part p."""
    p = partkeys.astype(np.int64)
    s = np.int64(num_supp)
    return (p + i * (s // 4 + (p - 1) // s)) % s + 1


def gen_region() -> pa.Table:
    rng = _rng("region", 1)
    return pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int64)),
        "r_name": pa.array(REGIONS),
        "r_comment": pa.array(list(_comments(rng, 5))),
    })


def gen_nation() -> pa.Table:
    rng = _rng("nation", 1)
    return pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
        "n_name": pa.array([n for n, _ in NATIONS]),
        "n_regionkey": pa.array(
            np.array([r for _, r in NATIONS], dtype=np.int64)),
        "n_comment": pa.array(list(_comments(rng, 25))),
    })


def gen_supplier(sf: float) -> pa.Table:
    n = int(10_000 * sf)
    rng = _rng("supplier", sf)
    keys = np.arange(1, n + 1, dtype=np.int64)
    nationkey = rng.integers(0, 25, n).astype(np.int64)
    comments = _comments(rng, n)
    # spec: SF*5 suppliers get "Customer Complaints", SF*5 get
    # "Customer Recommends" (Q16 filter)
    bad = rng.choice(n, size=max(int(5 * sf), 1), replace=False)
    comments[bad] = comments[bad] + " Customer Complaints"
    return pa.table({
        "s_suppkey": pa.array(keys),
        "s_name": pa.array([f"Supplier#{k:09d}" for k in keys]),
        "s_address": pa.array(list(_comments(rng, n, 3))),
        "s_nationkey": pa.array(nationkey),
        "s_phone": pa.array(_phones(rng, nationkey)),
        "s_acctbal": pa.array(_money(rng.uniform(-999.99, 9999.99, n))),
        "s_comment": pa.array(list(comments)),
    })


def _phones(rng: np.random.Generator, nationkey: np.ndarray) -> List[str]:
    cc = nationkey + 10
    a = rng.integers(100, 1000, len(nationkey))
    b = rng.integers(100, 1000, len(nationkey))
    c = rng.integers(1000, 10000, len(nationkey))
    return [f"{w}-{x}-{y}-{z}" for w, x, y, z in zip(cc, a, b, c)]


def gen_customer(sf: float) -> pa.Table:
    n = int(150_000 * sf)
    rng = _rng("customer", sf)
    keys = np.arange(1, n + 1, dtype=np.int64)
    nationkey = rng.integers(0, 25, n).astype(np.int64)
    return pa.table({
        "c_custkey": pa.array(keys),
        "c_name": pa.array([f"Customer#{k:09d}" for k in keys]),
        "c_address": pa.array(list(_comments(rng, n, 3))),
        "c_nationkey": pa.array(nationkey),
        "c_phone": pa.array(_phones(rng, nationkey)),
        "c_acctbal": pa.array(_money(rng.uniform(-999.99, 9999.99, n))),
        "c_mktsegment": pa.array(
            np.asarray(SEGMENTS, dtype=object)[
                rng.integers(0, 5, n)].tolist()),
        "c_comment": pa.array(list(_comments(rng, n))),
    })


def gen_part(sf: float) -> pa.Table:
    n = int(200_000 * sf)
    rng = _rng("part", sf)
    keys = np.arange(1, n + 1, dtype=np.int64)
    words = np.asarray(_P_NAME_WORDS, dtype=object)
    widx = rng.integers(0, len(words), size=(n, 5))
    names = words[widx[:, 0]]
    for k in range(1, 5):
        names = names + " " + words[widx[:, k]]
    mfgr = rng.integers(1, 6, n)
    brand = mfgr * 10 + rng.integers(1, 6, n)
    types = np.asarray([
        f"{a} {b} {c}" for a in _TYPE_SYL1 for b in _TYPE_SYL2
        for c in _TYPE_SYL3], dtype=object)
    containers = np.asarray([
        f"{a} {b}" for a in _CONT_SYL1 for b in _CONT_SYL2], dtype=object)
    retail = _money(
        (90000 + (keys // 10) % 20001 + 100 * (keys % 1000)) / 100.0)
    return pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array(list(names)),
        "p_mfgr": pa.array([f"Manufacturer#{m}" for m in mfgr]),
        "p_brand": pa.array([f"Brand#{b}" for b in brand]),
        "p_type": pa.array(
            types[rng.integers(0, len(types), n)].tolist()),
        "p_size": pa.array(rng.integers(1, 51, n).astype(np.int64)),
        "p_container": pa.array(
            containers[rng.integers(0, len(containers), n)].tolist()),
        "p_retailprice": pa.array(retail),
        "p_comment": pa.array(list(_comments(rng, n, 3))),
    })


def gen_partsupp(sf: float) -> pa.Table:
    parts = int(200_000 * sf)
    num_supp = int(10_000 * sf)
    rng = _rng("partsupp", sf)
    partkeys = np.repeat(np.arange(1, parts + 1, dtype=np.int64), 4)
    i = np.tile(np.arange(4, dtype=np.int64), parts)
    suppkeys = _part_suppliers(partkeys, i, num_supp)
    n = len(partkeys)
    return pa.table({
        "ps_partkey": pa.array(partkeys),
        "ps_suppkey": pa.array(suppkeys),
        "ps_availqty": pa.array(rng.integers(1, 10_000, n).astype(np.int64)),
        "ps_supplycost": pa.array(_money(rng.uniform(1.0, 1000.0, n))),
        "ps_comment": pa.array(list(_comments(rng, n))),
    })


def gen_orders_lineitem(sf: float) -> tuple:
    """Orders + lineitem together (statuses and totals are cross-derived)."""
    num_orders = int(1_500_000 * sf)
    num_cust = int(150_000 * sf)
    num_part = int(200_000 * sf)
    num_supp = int(10_000 * sf)
    rng = _rng("orders", sf)

    okey = np.arange(1, num_orders + 1, dtype=np.int64)
    # only customers with custkey % 3 != 0 place orders (spec 4.2.3)
    ck = rng.integers(1, num_cust + 1, num_orders).astype(np.int64)
    ck = np.where(ck % 3 == 0, (ck % (num_cust - 1)) + 1, ck)
    ck = np.where(ck % 3 == 0, ck + 1, ck)
    ck = np.where(ck > num_cust, 1, ck)
    odate = rng.integers(START_DATE, END_DATE - 151 + 1, num_orders
                         ).astype(np.int32)

    nlines = rng.integers(1, 8, num_orders)
    l_orderkey = np.repeat(okey, nlines)
    l_odate = np.repeat(odate, nlines)
    nl = len(l_orderkey)
    starts = np.concatenate([[0], np.cumsum(nlines)[:-1]])
    l_linenumber = (np.arange(nl, dtype=np.int64)
                    - np.repeat(starts, nlines) + 1)

    l_partkey = rng.integers(1, num_part + 1, nl).astype(np.int64)
    supp_i = rng.integers(0, 4, nl).astype(np.int64)
    l_suppkey = _part_suppliers(l_partkey, supp_i, num_supp)

    l_quantity = rng.integers(1, 51, nl).astype(np.float64)
    retail = (90000 + (l_partkey // 10) % 20001
              + 100 * (l_partkey % 1000)) / 100.0
    l_extendedprice = _money(l_quantity * retail)
    l_discount = rng.integers(0, 11, nl) / 100.0
    l_tax = rng.integers(0, 9, nl) / 100.0

    l_shipdate = (l_odate + rng.integers(1, 122, nl)).astype(np.int32)
    l_commitdate = (l_odate + rng.integers(30, 91, nl)).astype(np.int32)
    l_receiptdate = (l_shipdate + rng.integers(1, 31, nl)).astype(np.int32)

    returned = l_receiptdate <= CURRENT_DATE
    rf_choice = rng.integers(0, 2, nl)
    l_returnflag = np.where(
        returned, np.where(rf_choice == 0, "R", "A"), "N").astype(object)
    shipped = l_shipdate > CURRENT_DATE
    l_linestatus = np.where(shipped, "O", "F").astype(object)

    modes = np.asarray(SHIP_MODES, dtype=object)
    instr = np.asarray(SHIP_INSTRUCT, dtype=object)

    # order status: F if all lines F, O if all O, else P
    is_o = shipped.astype(np.int64)
    sum_o = np.add.reduceat(is_o, starts)
    o_status = np.where(
        sum_o == 0, "F", np.where(sum_o == nlines, "O", "P")).astype(object)

    amount = _money(l_extendedprice * (1 + l_tax) * (1 - l_discount))
    o_total = _money(np.add.reduceat(amount, starts))

    orders = pa.table({
        "o_orderkey": pa.array(okey),
        "o_custkey": pa.array(ck),
        "o_orderstatus": pa.array(list(o_status)),
        "o_totalprice": pa.array(o_total),
        "o_orderdate": pa.array(odate, type=pa.date32()),
        "o_orderpriority": pa.array(
            np.asarray(PRIORITIES, dtype=object)[
                rng.integers(0, 5, num_orders)].tolist()),
        "o_clerk": pa.array(
            [f"Clerk#{c:09d}" for c in
             rng.integers(1, max(int(1000 * sf), 2), num_orders)]),
        "o_shippriority": pa.array(
            np.zeros(num_orders, dtype=np.int64)),
        "o_comment": pa.array(list(_comments(rng, num_orders))),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(l_partkey),
        "l_suppkey": pa.array(l_suppkey),
        "l_linenumber": pa.array(l_linenumber),
        "l_quantity": pa.array(l_quantity),
        "l_extendedprice": pa.array(l_extendedprice),
        "l_discount": pa.array(l_discount),
        "l_tax": pa.array(l_tax),
        "l_returnflag": pa.array(list(l_returnflag)),
        "l_linestatus": pa.array(list(l_linestatus)),
        "l_shipdate": pa.array(l_shipdate, type=pa.date32()),
        "l_commitdate": pa.array(l_commitdate, type=pa.date32()),
        "l_receiptdate": pa.array(l_receiptdate, type=pa.date32()),
        "l_shipinstruct": pa.array(
            instr[rng.integers(0, len(instr), nl)].tolist()),
        "l_shipmode": pa.array(
            modes[rng.integers(0, len(modes), nl)].tolist()),
        "l_comment": pa.array(list(_comments(rng, nl, 3))),
    })
    return orders, lineitem


_CACHE: Dict[tuple, Dict[str, pa.Table]] = {}


def generate_tables(sf: float, backend: str = "numpy"
                    ) -> Dict[str, pa.Table]:
    """backend:

    * "dbgen" — the authoritative dataset: byte-exact dbgen output via the
      reference's own dbgen compiled standalone (io/dbgen.py). This is what
      `velox_tpch` sees; use it for benchmarks and reference parity. Note
      at fractional SF dbgen keeps internal scale 1 (DBGenIterator.cpp:
      57-66) so foreign keys dangle above the generated range — tests that
      need dense join matches at tiny SF use the numpy backend.
    * "numpy" (default) — deterministic spec-shaped re-implementation with
      referentially-consistent keys at any SF; the oracle-test dataset.
    * "native" — C++ generator in native/tpchgen.cpp (fast orders/lineitem
      only; superseded by "dbgen" for benchmarking).
    """
    key = (sf, backend)
    if key in _CACHE:
        return _CACHE[key]
    if backend == "dbgen":
        from velox_tpu.io import dbgen

        tables = dbgen.dbgen_tables(sf)
        _CACHE[key] = tables
        return tables
    if backend == "native":
        from velox_tpu.io.native_tpch import gen_orders_lineitem_native

        r = gen_orders_lineitem_native(sf)
        if r is None:
            backend = "numpy"
        else:
            orders, lineitem, _ = r
    if backend == "numpy":
        orders, lineitem = gen_orders_lineitem(sf)
    tables = {
        "region": gen_region(),
        "nation": gen_nation(),
        "supplier": gen_supplier(sf),
        "customer": gen_customer(sf),
        "part": gen_part(sf),
        "partsupp": gen_partsupp(sf),
        "orders": orders,
        "lineitem": lineitem,
    }
    _CACHE[key] = tables
    return tables


def register_tpch(
    sf: float, batch_rows: int = 1 << 20,
    tables: Optional[List[str]] = None,
    prefix: str = "",
    backend: str = "numpy",
) -> Dict[str, pa.Table]:
    """Generate + register TPC-H tables in the session catalog."""
    from velox_tpu.io.catalog import register_arrow

    data = generate_tables(sf, backend=backend)
    for name, t in data.items():
        if tables is not None and name not in tables:
            continue
        register_arrow(prefix + name, t, batch_rows)
    return data


def register_tpch_decimal(
    sf: float, batch_rows: int = 1 << 23,
    tables: Optional[List[str]] = None,
    prefix: str = "",
) -> Dict[str, pa.Table]:
    """Register dbgen-exact TPC-H with money/quantity as DECIMAL cents
    lanes — the TPU-native exact path (int32 narrow lanes under
    config.narrow_lanes; money never touches float). This is the
    benchmark-mode registration."""
    from velox_tpu.io import dbgen
    from velox_tpu.io.catalog import register_arrow

    data, overrides = dbgen.dbgen_tables_decimal(sf)
    for name, t in data.items():
        if tables is not None and name not in tables:
            continue
        register_arrow(
            prefix + name, t, batch_rows, decimal_overrides=overrides[name])
    return data
