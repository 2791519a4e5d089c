"""Narrow-lane (TPU 32-bit) mode: exactness of decimal Q1/Q6.

Money in int32 lanes, digit-split accumulation — results must be
bit-exact vs int64 numpy oracles (SURVEY.md §7 hard part #5).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from velox_tpu.utils.config import config
from velox_tpu.io.tpch import generate_tables
from velox_tpu.io.catalog import register_arrow, drop_table
from velox_tpu.tpch import tpch_plan
from velox_tpu.exec import run_plan


@pytest.fixture
def narrow_lineitem():
    config.narrow_lanes = True
    tables = generate_tables(0.01)
    li = tables["lineitem"]
    ship = np.asarray(li.column("l_shipdate").cast(pa.int32()))
    cents = {
        c: np.round(np.asarray(li.column(c)) * 100).astype(np.int64)
        for c in ("l_extendedprice", "l_discount", "l_quantity", "l_tax")}
    register_arrow(
        "lineitem",
        pa.table({
            **cents,
            "l_returnflag": li.column("l_returnflag"),
            "l_linestatus": li.column("l_linestatus"),
            "l_shipdate": pa.array(ship, type=pa.date32()),
        }),
        batch_rows=1 << 14,
        decimal_overrides={
            "l_extendedprice": (9, 2), "l_discount": (3, 2),
            "l_quantity": (4, 2), "l_tax": (3, 2)},
    )
    yield li, ship, cents
    drop_table("lineitem")
    config.narrow_lanes = False


def test_narrow_lanes_are_int32(narrow_lineitem):
    from velox_tpu.io.catalog import get_table

    b = get_table("lineitem").batches[0]
    assert b.columns["l_extendedprice"].values.dtype == np.int32
    assert b.columns["l_discount"].values.dtype == np.int32


def test_q6_narrow_exact(narrow_lineitem):
    li, ship, cents = narrow_lineitem
    r = run_plan(tpch_plan(6).build())
    rev = r.column("revenue").to_pylist()[0]
    pc, dc, qc = (cents["l_extendedprice"], cents["l_discount"],
                  cents["l_quantity"])
    m = ((ship >= 8766) & (ship < 9131) & (dc >= 5) & (dc <= 7)
         & (qc < 2400))
    assert int(rev.scaleb(4)) == int((pc[m] * dc[m]).sum())


def test_q1_narrow_exact(narrow_lineitem):
    li, ship, cents = narrow_lineitem
    r = run_plan(tpch_plan(1).build()).to_pydict()
    mm = ship <= 10471  # 1998-12-01 - 90 days
    df = pd.DataFrame({
        "rf": li.column("l_returnflag").to_pylist(),
        "ls": li.column("l_linestatus").to_pylist(),
        "q": cents["l_quantity"], "p": cents["l_extendedprice"],
        "d": cents["l_discount"], "t": cents["l_tax"]})[mm]
    df["dp"] = df["p"] * (100 - df["d"])
    df["ch"] = df["dp"] * (100 + df["t"])
    e = (df.groupby(["rf", "ls"]).agg(
        sq=("q", "sum"), sp=("p", "sum"), sdp=("dp", "sum"),
        sch=("ch", "sum"), c=("q", "count"))
        .reset_index().sort_values(["rf", "ls"]))
    assert [int(x.scaleb(2)) for x in r["sum_qty"]] == e["sq"].tolist()
    assert [int(x.scaleb(2))
            for x in r["sum_base_price"]] == e["sp"].tolist()
    assert [int(x.scaleb(4))
            for x in r["sum_disc_price"]] == e["sdp"].tolist()
    assert [int(x.scaleb(6))
            for x in r["sum_charge"]] == e["sch"].tolist()
    assert r["count_order"] == e["c"].tolist()


def test_narrow_segment_sum_kernel():
    config.narrow_lanes = True
    try:
        import jax.numpy as jnp

        from velox_tpu.functions.aggregates import (
            _narrow_segment_count, _narrow_segment_sum)

        rng = np.random.default_rng(0)
        n, G = 1 << 18, 12
        gids = rng.integers(0, 13, n).astype(np.int32)  # 12 = sentinel
        vals = rng.integers(-10_500_000, 10_500_000, n).astype(np.int32)
        got = np.asarray(_narrow_segment_sum(
            jnp.asarray(gids), jnp.asarray(vals), G))
        exp = np.array(
            [vals[gids == g].sum() for g in range(G)], dtype=np.int64)
        assert (got == exp).all()
        cnt = np.asarray(_narrow_segment_count(
            jnp.asarray(gids), jnp.asarray(np.ones(n, bool)), G))
        assert (cnt == np.bincount(gids, minlength=13)[:G]).all()
    finally:
        config.narrow_lanes = False
