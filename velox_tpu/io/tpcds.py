"""TPC-DS data generation (spec-SHAPED subset).

The reference ships a TPC-DS benchmark harness (velox/benchmarks/tpcds)
and consumes dsdgen-produced data. dsdgen's C is not portable here, so
this generator produces the seven tables the classic star-join
reporting queries touch — store_sales, date_dim, item, customer,
customer_address, customer_demographics, store, promotion — with
spec-conformant schemas, domains, and referential integrity, but NOT
dsdgen's exact rows (documented deviation; the engine's TPC-H side IS
dbgen-exact via io/dbgen.py, which anchors cross-engine parity).

Scale: store_sales ~= 2.88M rows/SF (the spec's per-SF cardinality).
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

_EPOCH = _dt.date(1970, 1, 1)

_CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
               "Men", "Music", "Shoes", "Sports", "Women"]
_STATES = ["AL", "CA", "GA", "IL", "KS", "MI", "NY", "OH", "TN", "TX"]
_GENDERS = ["M", "F"]
_MARITAL = ["S", "M", "D", "W", "U"]
_EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
              "4 yr Degree", "Advanced Degree", "Unknown"]
_CHANNELS = ["N", "Y"]


def _dates() -> pa.Table:
    """date_dim: calendar rows 1998-01-01 .. 2003-12-31 (the spec's
    query windows all land in here)."""
    start = _dt.date(1998, 1, 1)
    end = _dt.date(2003, 12, 31)
    n = (end - start).days + 1
    days = [start + _dt.timedelta(days=i) for i in range(n)]
    return pa.table({
        "d_date_sk": pa.array(range(1, n + 1), pa.int64()),
        "d_date": pa.array(days, pa.date32()),
        "d_year": pa.array([d.year for d in days], pa.int64()),
        "d_moy": pa.array([d.month for d in days], pa.int64()),
        "d_dom": pa.array([d.day for d in days], pa.int64()),
        "d_qoy": pa.array([(d.month - 1) // 3 + 1 for d in days],
                          pa.int64()),
        "d_day_name": pa.array([d.strftime("%A") for d in days]),
    })


def generate_tpcds(sf: float = 0.01, seed: int = 7
                   ) -> Dict[str, pa.Table]:
    rng = np.random.default_rng(seed)
    n_item = max(int(18000 * min(sf * 55, 1.0)), 200)
    n_cust = max(int(100000 * min(sf * 10, 1.0)), 500)
    n_addr = max(n_cust // 2, 250)
    n_demo = 7200
    n_store = max(int(12 * max(sf, 0.1)), 2)
    n_promo = max(int(300 * max(sf, 0.1)), 30)
    n_ss = max(int(2_880_000 * sf), 2000)

    dd = _dates()
    n_date = dd.num_rows

    item = pa.table({
        "i_item_sk": pa.array(range(1, n_item + 1), pa.int64()),
        "i_item_id": pa.array([f"AAAAAAAA{k:08d}" for k in
                               range(1, n_item + 1)]),
        "i_brand_id": pa.array(
            rng.integers(1000001, 1010000, n_item), pa.int64()),
        "i_brand": pa.array(
            [f"brand#{int(b) % 97}" for b in
             rng.integers(0, 10_000, n_item)]),
        "i_category_id": pa.array(
            rng.integers(1, len(_CATEGORIES) + 1, n_item), pa.int64()),
        "i_category": pa.array(
            [str(rng.choice(_CATEGORIES)) for _ in range(n_item)]),
        "i_manufact_id": pa.array(
            rng.integers(1, 1001, n_item), pa.int64()),
        "i_manager_id": pa.array(
            rng.integers(1, 101, n_item), pa.int64()),
        "i_current_price": pa.array(
            np.round(rng.uniform(0.09, 99.99, n_item), 2)),
    })

    customer = pa.table({
        "c_customer_sk": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_customer_id": pa.array(
            [f"CUST{k:011d}" for k in range(1, n_cust + 1)]),
        "c_current_addr_sk": pa.array(
            rng.integers(1, n_addr + 1, n_cust), pa.int64()),
        "c_current_cdemo_sk": pa.array(
            rng.integers(1, n_demo + 1, n_cust), pa.int64()),
        "c_first_name": pa.array(
            [f"fn{int(x)}" for x in rng.integers(0, 500, n_cust)]),
        "c_last_name": pa.array(
            [f"ln{int(x)}" for x in rng.integers(0, 800, n_cust)]),
        "c_birth_month": pa.array(
            rng.integers(1, 13, n_cust), pa.int64()),
        "c_birth_year": pa.array(
            rng.integers(1930, 2000, n_cust), pa.int64()),
    })

    address = pa.table({
        "ca_address_sk": pa.array(range(1, n_addr + 1), pa.int64()),
        "ca_state": pa.array(
            [str(rng.choice(_STATES)) for _ in range(n_addr)]),
        "ca_zip": pa.array(
            [f"{int(z):05d}" for z in rng.integers(10000, 99999,
                                                   n_addr)]),
        "ca_gmt_offset": pa.array(
            [float(rng.choice([-5.0, -6.0, -7.0, -8.0]))
             for _ in range(n_addr)]),
    })

    demographics = pa.table({
        "cd_demo_sk": pa.array(range(1, n_demo + 1), pa.int64()),
        "cd_gender": pa.array(
            [_GENDERS[k % 2] for k in range(n_demo)]),
        "cd_marital_status": pa.array(
            [_MARITAL[k % 5] for k in range(n_demo)]),
        "cd_education_status": pa.array(
            [_EDUCATION[k % 7] for k in range(n_demo)]),
    })

    store = pa.table({
        "s_store_sk": pa.array(range(1, n_store + 1), pa.int64()),
        "s_store_id": pa.array(
            [f"STORE{k:08d}" for k in range(1, n_store + 1)]),
        "s_store_name": pa.array(
            [f"store{k}" for k in range(1, n_store + 1)]),
        "s_state": pa.array(
            [str(rng.choice(_STATES)) for _ in range(n_store)]),
        "s_gmt_offset": pa.array(
            [float(rng.choice([-5.0, -6.0, -7.0]))
             for _ in range(n_store)]),
    })

    promotion = pa.table({
        "p_promo_sk": pa.array(range(1, n_promo + 1), pa.int64()),
        "p_channel_email": pa.array(
            [str(rng.choice(_CHANNELS, p=[0.9, 0.1]))
             for _ in range(n_promo)]),
        "p_channel_event": pa.array(
            [str(rng.choice(_CHANNELS, p=[0.5, 0.5]))
             for _ in range(n_promo)]),
    })

    qty = rng.integers(1, 101, n_ss)
    price = np.round(rng.uniform(1.0, 200.0, n_ss), 2)
    disc = np.round(price * rng.uniform(0, 0.3, n_ss), 2)
    store_sales = pa.table({
        "ss_sold_date_sk": pa.array(
            np.sort(rng.integers(1, n_date + 1, n_ss)), pa.int64()),
        "ss_item_sk": pa.array(
            rng.integers(1, n_item + 1, n_ss), pa.int64()),
        "ss_customer_sk": pa.array(
            rng.integers(1, n_cust + 1, n_ss), pa.int64()),
        "ss_cdemo_sk": pa.array(
            rng.integers(1, n_demo + 1, n_ss), pa.int64()),
        "ss_store_sk": pa.array(
            rng.integers(1, n_store + 1, n_ss), pa.int64()),
        "ss_promo_sk": pa.array(
            rng.integers(1, n_promo + 1, n_ss), pa.int64()),
        "ss_quantity": pa.array(qty, pa.int64()),
        "ss_list_price": pa.array(price),
        "ss_sales_price": pa.array(np.round(price - disc, 2)),
        "ss_ext_sales_price": pa.array(
            np.round((price - disc) * qty, 2)),
        "ss_ext_discount_amt": pa.array(np.round(disc * qty, 2)),
        "ss_coupon_amt": pa.array(
            np.round(disc * rng.uniform(0, 1, n_ss), 2)),
        "ss_wholesale_cost": pa.array(
            np.round(price * rng.uniform(0.3, 0.7, n_ss), 2)),
    })

    return {
        "date_dim": dd, "item": item, "customer": customer,
        "customer_address": address,
        "customer_demographics": demographics, "store": store,
        "promotion": promotion, "store_sales": store_sales,
    }


def register_tpcds(sf: float = 0.01, batch_rows: int = 1 << 20,
                   seed: int = 7, prefix: str = ""
                   ) -> Dict[str, pa.Table]:
    from velox_tpu.io.catalog import register_arrow

    tables = generate_tpcds(sf, seed)
    for name, t in tables.items():
        register_arrow(prefix + name, t, batch_rows)
    return tables
