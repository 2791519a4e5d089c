"""TPC-DS vs an INDEPENDENT SQL engine (stdlib sqlite3).

The pandas oracles in test_tpcds_dsdgen.py share authorship (and thus
potential spec misreadings) with the plans under test (round-4 verdict
weak #6). This module breaks that loop: each query is written as
near-spec SQL TEXT and *executed by SQLite 3.40* — an engine that
parses and evaluates the SQL itself — on the same dsdgen-exact data,
then compared row-for-row against the PlanBuilder plan run by
velox_tpu. Reference analog: velox's DuckQueryRunner
(velox/exec/fuzzer/DuckQueryRunner.h) which cross-checks against
DuckDB; DuckDB is not in this image, sqlite3 is.

Semantics notes (SQLite vs Presto, handled in the SQL text):
- ORDER BY: SQLite sorts NULLs FIRST by default; Presto (and the
  engine) sort them LAST -> every ORDER BY key gets NULLS LAST.
- d_date is loaded as ISO text; date windows use date(x, '+N day').
- CASE WHEN stands in for Presto's if().
- No ROLLUP in SQLite -> rollup queries are exercised elsewhere.
"""

import datetime as dtm
import sqlite3

import numpy as np
import pandas as pd
import pytest

from velox_tpu.exec import run_plan_pydict
from velox_tpu.io.dsdgen import available, dsdgen_tables, register_dsdgen
from velox_tpu.tpcds import tpcds_plan

SF = 0.01

pytestmark = pytest.mark.skipif(
    not available(), reason="reference dsdgen not available")

_TABLES = [
    "store_sales", "store_returns", "catalog_sales", "catalog_returns",
    "web_sales", "web_returns", "date_dim", "item", "customer",
    "customer_address", "customer_demographics",
    "household_demographics", "store", "promotion", "warehouse",
    "ship_mode", "time_dim", "web_site", "web_page", "call_center",
    "inventory", "income_band", "reason",
]


@pytest.fixture(scope="module")
def db():
    register_dsdgen(SF, batch_rows=1 << 15, tables=_TABLES)
    conn = sqlite3.connect(":memory:")
    tabs = dsdgen_tables(SF, _TABLES)
    for name, t in tabs.items():
        df = t.to_pandas()
        for c in df.columns:
            head = df[c].dropna().head(1).tolist()
            if df[c].dtype.kind == "M" or (
                    head and isinstance(head[0],
                                        (dtm.date, dtm.datetime))):
                df[c] = df[c].map(
                    lambda v: None if pd.isna(v) else str(v)[:10])
        df.to_sql(name, conn, index=False)
    yield conn
    conn.close()
    from velox_tpu.io import drop_table

    for k in _TABLES:
        try:
            drop_table(k)
        except KeyError:
            pass


def _compare(got, cur, rel=1e-6):
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    n = len(next(iter(got.values()))) if got else 0
    assert n == len(rows), (n, len(rows))
    for ci, cname in enumerate(cols):
        assert cname in got, (cname, list(got))
        g = got[cname]
        for ri, row in enumerate(rows):
            a, b = g[ri], row[ci]
            if b is None or a is None:
                a_null = a is None or (
                    isinstance(a, float) and np.isnan(a))
                b_null = b is None
                assert a_null == b_null, (cname, ri, a, b)
            elif isinstance(b, float) or isinstance(a, float):
                assert float(a) == pytest.approx(
                    float(b), rel=rel, abs=1e-6), (cname, ri, a, b)
            else:
                assert a == b, (cname, ri, a, b)
    return len(rows)


# (query number, engine plan kwargs, SQL text). Constants match the
# plan defaults / the dsdgen-suite's tuned values.
_CASES = {
    3: ({}, """
        select d_year, i_brand_id, i_brand,
               sum(ss_ext_sales_price) as sum_agg
        from store_sales, date_dim, item
        where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
          and d_moy = 11 and i_manufact_id = 128
        group by d_year, i_brand_id, i_brand
        order by d_year nulls last, sum_agg desc nulls last,
                 i_brand_id nulls last
        limit 100"""),
    7: ({}, """
        select i_item_id, avg(ss_quantity) as agg1,
               avg(ss_list_price) as agg2,
               avg(ss_coupon_amt) as agg3,
               avg(ss_sales_price) as agg4
        from store_sales, item
        where ss_item_sk = i_item_sk
          and ss_cdemo_sk in (select cd_demo_sk
                              from customer_demographics
                              where cd_gender = 'M'
                                and cd_marital_status = 'S'
                                and cd_education_status = 'College')
          and ss_sold_date_sk in (select d_date_sk from date_dim
                                  where d_year = 2000)
          and ss_promo_sk in (select p_promo_sk from promotion
                              where p_channel_email = 'N'
                                 or p_channel_event = 'N')
        group by i_item_id
        order by i_item_id nulls last
        limit 100"""),
    15: (dict(year=1999, qoy=2), """
        select ca_zip, sum(cs_sales_price) as total
        from catalog_sales, customer, customer_address
        where cs_bill_customer_sk = c_customer_sk
          and c_current_addr_sk = ca_address_sk
          and (substr(ca_zip, 1, 5) in ('85669','86197','88274',
               '83405','86475','85392','85460','80348','81792')
               or ca_state in ('CA','WA','GA')
               or cs_sales_price > 500.0)
          and cs_sold_date_sk in (select d_date_sk from date_dim
                                  where d_qoy = 2 and d_year = 1999)
        group by ca_zip
        order by ca_zip nulls last
        limit 100"""),
    19: ({}, """
        select i_brand_id, i_brand, i_manufact_id,
               sum(ss_ext_sales_price) as ext_price
        from store_sales, item, customer, customer_address, store
        where ss_item_sk = i_item_sk and i_manager_id = 8
          and ss_customer_sk = c_customer_sk
          and c_current_addr_sk = ca_address_sk
          and ss_store_sk = s_store_sk
          and ss_sold_date_sk in (select d_date_sk from date_dim
                                  where d_moy = 11 and d_year = 1999)
        group by i_brand_id, i_brand, i_manufact_id
        order by ext_price desc nulls last, i_brand_id nulls last
        limit 100"""),
    26: (dict(year=1999), """
        select i_item_id, avg(cs_quantity) as agg1,
               avg(cs_list_price) as agg2,
               avg(cs_coupon_amt) as agg3,
               avg(cs_sales_price) as agg4
        from catalog_sales, item
        where cs_item_sk = i_item_sk
          and cs_bill_cdemo_sk in (select cd_demo_sk
                                   from customer_demographics
                                   where cd_gender = 'M'
                                     and cd_marital_status = 'S'
                                     and cd_education_status
                                         = 'College')
          and cs_sold_date_sk in (select d_date_sk from date_dim
                                  where d_year = 1999)
          and cs_promo_sk in (select p_promo_sk from promotion
                              where p_channel_email = 'N'
                                 or p_channel_event = 'N')
        group by i_item_id
        order by i_item_id nulls last
        limit 100"""),
    42: ({}, """
        select d_year, i_category_id, i_category,
               sum(ss_ext_sales_price) as total
        from store_sales, date_dim, item
        where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
          and d_moy = 11 and d_year = 2000 and i_manager_id = 1
        group by d_year, i_category_id, i_category
        order by total desc nulls last, d_year nulls last,
                 i_category_id nulls last, i_category nulls last
        limit 100"""),
    43: ({}, """
        select s_store_id, s_store_name,
          sum(case when d_day_name = 'Sunday'
                   then ss_sales_price else 0.0 end) as sun_sales,
          sum(case when d_day_name = 'Monday'
                   then ss_sales_price else 0.0 end) as mon_sales,
          sum(case when d_day_name = 'Tuesday'
                   then ss_sales_price else 0.0 end) as tue_sales,
          sum(case when d_day_name = 'Wednesday'
                   then ss_sales_price else 0.0 end) as wed_sales,
          sum(case when d_day_name = 'Thursday'
                   then ss_sales_price else 0.0 end) as thu_sales,
          sum(case when d_day_name = 'Friday'
                   then ss_sales_price else 0.0 end) as fri_sales,
          sum(case when d_day_name = 'Saturday'
                   then ss_sales_price else 0.0 end) as sat_sales
        from store_sales, date_dim, store
        where ss_sold_date_sk = d_date_sk
          and ss_store_sk = s_store_sk and d_year = 2000
        group by s_store_id, s_store_name
        order by s_store_id nulls last
        limit 100"""),
    52: ({}, """
        select d_year, i_brand, i_brand_id,
               sum(ss_ext_sales_price) as ext_price
        from store_sales, date_dim, item
        where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
          and d_moy = 11 and d_year = 2000 and i_manager_id = 1
        group by d_year, i_brand, i_brand_id
        order by d_year nulls last, ext_price desc nulls last,
                 i_brand_id nulls last
        limit 100"""),
    55: ({}, """
        select d_year, i_brand, i_brand_id,
               sum(ss_ext_sales_price) as ext_price
        from store_sales, date_dim, item
        where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk
          and d_moy = 11 and d_year = 1999 and i_manager_id = 28
        group by d_year, i_brand, i_brand_id
        order by d_year nulls last, ext_price desc nulls last,
                 i_brand_id nulls last
        limit 100"""),
    62: (dict(month_seq_lo=1200), """
        select substr(w_warehouse_name, 1, 20) as wname, sm_type,
               web_name,
          sum(case when ws_ship_date_sk - ws_sold_date_sk <= 30
                   then 1 else 0 end) as d30,
          sum(case when ws_ship_date_sk - ws_sold_date_sk > 30
                    and ws_ship_date_sk - ws_sold_date_sk <= 60
                   then 1 else 0 end) as d60,
          sum(case when ws_ship_date_sk - ws_sold_date_sk > 60
                    and ws_ship_date_sk - ws_sold_date_sk <= 90
                   then 1 else 0 end) as d90,
          sum(case when ws_ship_date_sk - ws_sold_date_sk > 90
                    and ws_ship_date_sk - ws_sold_date_sk <= 120
                   then 1 else 0 end) as d120,
          sum(case when ws_ship_date_sk - ws_sold_date_sk > 120
                   then 1 else 0 end) as dmore
        from web_sales, warehouse, ship_mode, web_site
        where ws_warehouse_sk = w_warehouse_sk
          and ws_ship_mode_sk = sm_ship_mode_sk
          and ws_web_site_sk = web_site_sk
          and ws_sold_date_sk in (select d_date_sk from date_dim
                                  where d_month_seq between 1200
                                        and 1211)
        group by wname, sm_type, web_name
        order by wname nulls last, sm_type nulls last,
                 web_name nulls last
        limit 100"""),
    65: ({}, """
        with rev as
         (select ss_store_sk, ss_item_sk,
                 sum(ss_sales_price) as revenue
          from store_sales
          where ss_sold_date_sk in (select d_date_sk from date_dim
                                    where d_year = 2000)
          group by ss_store_sk, ss_item_sk),
        sc as
         (select ss_store_sk sb_store_sk, avg(revenue) as ave
          from rev group by ss_store_sk)
        select s_store_name, i_item_id, i_current_price,
               revenue
        from rev, sc, store, item
        where rev.ss_store_sk = sc.sb_store_sk
          and revenue <= 0.1 * ave
          and rev.ss_store_sk = s_store_sk
          and rev.ss_item_sk = i_item_sk
        order by s_store_name nulls last, i_item_id nulls last
        limit 100"""),
    73: ({}, """
        select c_last_name, c_first_name, c_salutation,
               c_preferred_cust_flag, ss_ticket_number, cnt
        from (select ss_ticket_number, ss_customer_sk,
                     count(*) as cnt
              from store_sales
              where ss_sold_date_sk in (
                        select d_date_sk from date_dim
                        where d_dom between 1 and 2
                          and d_year = 2000)
                and ss_store_sk in (select s_store_sk from store)
                and ss_hdemo_sk in (
                        select hd_demo_sk
                        from household_demographics
                        where (hd_buy_potential = '>10000'
                               or hd_buy_potential = 'Unknown')
                          and (hd_dep_count = 4
                               or hd_vehicle_count = 3))
              group by ss_ticket_number, ss_customer_sk) dj,
             customer
        where ss_customer_sk = c_customer_sk
          and cnt between 1 and 5
        order by cnt desc nulls last, c_last_name nulls last
        limit 1000"""),
    79: ({}, """
        select c_last_name, c_first_name, s_city, ss_ticket_number,
               amt, profit
        from (select ss_ticket_number, ss_customer_sk, ss_addr_sk,
                     s_city, sum(ss_coupon_amt) as amt,
                     sum(ss_net_profit) as profit
              from store_sales, store
              where ss_store_sk = s_store_sk
                and s_number_employees between 200 and 295
                and ss_sold_date_sk in (
                        select d_date_sk from date_dim
                        where d_dow = 1 and d_year = 2000)
                and ss_hdemo_sk in (
                        select hd_demo_sk
                        from household_demographics
                        where hd_dep_count = 6
                           or hd_vehicle_count > 2)
              group by ss_ticket_number, ss_customer_sk, ss_addr_sk,
                       s_city) ms, customer
        where ss_customer_sk = c_customer_sk
        order by c_last_name nulls last, c_first_name nulls last,
                 s_city nulls last, profit desc nulls last,
                 ss_ticket_number nulls last
        limit 100"""),
    84: (dict(city="Edgewood", income_lo=0), """
        select c_customer_id, c_first_name, c_last_name
        from customer, customer_demographics
        where c_current_cdemo_sk = cd_demo_sk
          and c_current_addr_sk in (
                  select ca_address_sk from customer_address
                  where ca_city = 'Edgewood')
          and c_current_hdemo_sk in (
                  select hd_demo_sk from household_demographics
                  where hd_income_band_sk in (
                      select ib_income_band_sk from income_band
                      where ib_lower_bound >= 0
                        and ib_upper_bound <= 50000))
          and cd_demo_sk in (select sr_cdemo_sk from store_returns)
        order by c_customer_id nulls last
        limit 100"""),
    88: (dict(dep=4, vehicle=2), """
        select
          sum(case when t_hour = 8 and t_minute < 30
                   then 1 else 0 end) as h8_0,
          sum(case when t_hour = 8 and t_minute >= 30
                   then 1 else 0 end) as h8_30,
          sum(case when t_hour = 9 and t_minute < 30
                   then 1 else 0 end) as h9_0,
          sum(case when t_hour = 9 and t_minute >= 30
                   then 1 else 0 end) as h9_30,
          sum(case when t_hour = 10 and t_minute < 30
                   then 1 else 0 end) as h10_0,
          sum(case when t_hour = 10 and t_minute >= 30
                   then 1 else 0 end) as h10_30,
          sum(case when t_hour = 11 and t_minute < 30
                   then 1 else 0 end) as h11_0,
          sum(case when t_hour = 11 and t_minute >= 30
                   then 1 else 0 end) as h11_30
        from store_sales, time_dim
        where ss_sold_time_sk = t_time_sk
          and t_hour between 8 and 12
          and ss_hdemo_sk in (
              select hd_demo_sk from household_demographics
              where (hd_dep_count = 4 and hd_vehicle_count <= 6)
                 or (hd_dep_count = 2 and hd_vehicle_count <= 4)
                 or (hd_dep_count = 2 and hd_vehicle_count <= 4))
          and ss_store_sk in (select s_store_sk from store)"""),
    90: ({}, """
        select amc, pmc, amc * 1.0 / pmc as am_pm_ratio
        from (select
                sum(case when t_hour <= 9 then 1 else 0 end) as amc,
                sum(case when t_hour >= 19 then 1 else 0 end) as pmc
              from web_sales, time_dim
              where ws_sold_time_sk = t_time_sk
                and ((t_hour between 8 and 9)
                     or (t_hour between 19 and 20))
                and ws_ship_hdemo_sk in (
                    select hd_demo_sk from household_demographics
                    where hd_dep_count = 6)
                and ws_web_page_sk in (
                    select wp_web_page_sk from web_page
                    where wp_char_count between 5000 and 5200))"""),
    91: (dict(year=2001, moy=3, gmt=-6.0), """
        select cc_call_center_id, cc_name, cc_manager,
               cd_marital_status, cd_education_status,
               sum(cr_net_loss) as returns_loss
        from catalog_returns, customer, customer_demographics,
             call_center
        where cr_returning_customer_sk = c_customer_sk
          and c_current_cdemo_sk = cd_demo_sk
          and cr_call_center_sk = cc_call_center_sk
          and cr_returned_date_sk in (
                  select d_date_sk from date_dim
                  where d_year = 2001 and d_moy = 3)
          and ((cd_marital_status = 'M'
                and cd_education_status = 'Unknown')
               or (cd_marital_status = 'W'
                   and cd_education_status = 'Advanced Degree'))
          and c_current_hdemo_sk in (
                  select hd_demo_sk from household_demographics
                  where hd_buy_potential = 'Unknown'
                     or hd_buy_potential = '>10000')
          and c_current_addr_sk in (
                  select ca_address_sk from customer_address
                  where ca_gmt_offset = -6.0)
        group by cc_call_center_id, cc_name, cc_manager,
                 cd_marital_status, cd_education_status
        order by returns_loss desc nulls last,
                 cc_call_center_id nulls last
        limit 100"""),
    93: (dict(reason="Package was damaged"), """
        select ss_customer_sk, sum(act_sales) as sumsales
        from (select ss_customer_sk,
                     (ss_quantity - sr_return_quantity)
                     * ss_sales_price as act_sales
              from store_sales, store_returns
              where ss_ticket_number = sr_ticket_number
                and ss_item_sk = sr_item_sk
                and sr_reason_sk in (
                    select r_reason_sk from reason
                    where r_reason_desc = 'Package was damaged'))
        group by ss_customer_sk
        order by sumsales nulls last, ss_customer_sk nulls last
        limit 100"""),
    96: ({}, """
        select count(*) as cnt
        from store_sales
        where ss_sold_date_sk in (select d_date_sk from date_dim
                                  where d_dom = 25)
          and ss_store_sk in (select s_store_sk from store
                              where s_state = 'TX')"""),
    98: ({}, """
        select i_item_id, i_item_desc, i_category, i_class,
               i_current_price,
               sum(ss_ext_sales_price) as itemrevenue,
               sum(ss_ext_sales_price) * 100.0
               / sum(sum(ss_ext_sales_price))
                 over (partition by i_class) as revenueratio
        from store_sales, item
        where ss_item_sk = i_item_sk
          and i_category in ('Sports', 'Books', 'Home')
          and ss_sold_date_sk in (
              select d_date_sk from date_dim
              where d_date between '1999-02-22'
                    and date('1999-02-22', '+30 day'))
        group by i_item_id, i_item_desc, i_category, i_class,
                 i_current_price
        order by i_category nulls last, i_class nulls last,
                 i_item_id nulls last, i_item_desc nulls last,
                 revenueratio nulls last
        limit 100"""),
    1: ({}, """
        with ctr as
         (select sr_customer_sk, sr_store_sk,
                 sum(sr_return_amt) as ctr_total_return
          from store_returns
          where sr_returned_date_sk in (
                    select d_date_sk from date_dim
                    where d_year = 2000)
          group by sr_customer_sk, sr_store_sk)
        select c_customer_id
        from ctr ctr1, customer
        where ctr1.ctr_total_return >
              1.2 * (select avg(ctr_total_return) from ctr ctr2
                     where ctr1.sr_store_sk = ctr2.sr_store_sk)
          and ctr1.sr_store_sk in (select s_store_sk from store
                                   where s_state = 'TN')
          and ctr1.sr_customer_sk = c_customer_sk
        order by c_customer_id nulls last
        limit 100"""),
    50: (dict(year=2001, moy=1), """
        select s_store_name, s_company_id, s_street_number,
               s_street_name, s_street_type, s_suite_number, s_city,
               s_county, s_state, s_zip,
          sum(case when sr_returned_date_sk - ss_sold_date_sk <= 30
                   then 1 else 0 end) as d30,
          sum(case when sr_returned_date_sk - ss_sold_date_sk > 30
                    and sr_returned_date_sk - ss_sold_date_sk <= 60
                   then 1 else 0 end) as d60,
          sum(case when sr_returned_date_sk - ss_sold_date_sk > 60
                    and sr_returned_date_sk - ss_sold_date_sk <= 90
                   then 1 else 0 end) as d90,
          sum(case when sr_returned_date_sk - ss_sold_date_sk > 90
                    and sr_returned_date_sk - ss_sold_date_sk <= 120
                   then 1 else 0 end) as d120,
          sum(case when sr_returned_date_sk - ss_sold_date_sk > 120
                   then 1 else 0 end) as dmore
        from store_sales, store_returns, store
        where ss_ticket_number = sr_ticket_number
          and ss_item_sk = sr_item_sk
          and ss_customer_sk = sr_customer_sk
          and ss_store_sk = s_store_sk
          and sr_returned_date_sk in (
              select d_date_sk from date_dim
              where d_year = 2001 and d_moy = 1)
        group by s_store_name, s_company_id, s_street_number,
                 s_street_name, s_street_type, s_suite_number,
                 s_city, s_county, s_state, s_zip
        order by s_store_name nulls last, s_company_id nulls last,
                 s_street_number nulls last
        limit 100"""),
    29: (dict(year=1999), """
        select i_item_id, i_item_desc, s_state,
               sum(ss_quantity) as store_sales_quantity,
               sum(sr_return_quantity) as store_returns_quantity,
               sum(cs_quantity) as catalog_sales_quantity
        from store_sales, store_returns, catalog_sales, store, item
        where ss_customer_sk = sr_customer_sk
          and ss_item_sk = sr_item_sk
          and ss_ticket_number = sr_ticket_number
          and ss_customer_sk = cs_bill_customer_sk
          and ss_item_sk = cs_item_sk
          and ss_store_sk = s_store_sk
          and ss_item_sk = i_item_sk
          and ss_sold_date_sk in (select d_date_sk from date_dim
                                  where d_qoy = 1 and d_year = 1999)
          and sr_returned_date_sk in (
              select d_date_sk from date_dim
              where d_qoy between 1 and 3 and d_year = 1999)
          and cs_sold_date_sk in (select d_date_sk from date_dim
                                  where d_year between 1999
                                        and 2001)
        group by i_item_id, i_item_desc, s_state
        order by i_item_id nulls last, i_item_desc nulls last,
                 s_state nulls last
        limit 100"""),
    48: ({}, """
        select sum(ss_quantity) as total_qty
        from store_sales, customer_demographics, customer,
             customer_address
        where ss_cdemo_sk = cd_demo_sk
          and ss_customer_sk = c_customer_sk
          and c_current_addr_sk = ca_address_sk
          and ss_sold_date_sk in (select d_date_sk from date_dim
                                  where d_year = 2001)
          and ss_store_sk in (select s_store_sk from store)
          and ((cd_marital_status = 'M'
                and cd_education_status = '4 yr Degree'
                and ss_sales_price between 100.0 and 150.0)
               or (cd_marital_status = 'D'
                   and cd_education_status = '2 yr Degree'
                   and ss_sales_price between 50.0 and 100.0)
               or (cd_marital_status = 'S'
                   and cd_education_status = 'College'
                   and ss_sales_price between 150.0 and 200.0))
          and ((ca_state in ('TX','NY')
                and ss_ext_discount_amt between 0.0 and 2000.0)
               or (ca_state in ('CA','OH')
                   and ss_ext_discount_amt between 150.0 and 3000.0)
               or (ca_state in ('GA','IL')
                   and ss_ext_discount_amt between 50.0
                       and 25000.0))"""),
}


@pytest.mark.parametrize("qn", sorted(_CASES))
def test_sqlite_equivalence(db, qn):
    kwargs, sql = _CASES[qn]
    got = run_plan_pydict(tpcds_plan(qn, **kwargs).build())
    _compare(got, db.execute(sql))


def test_sqlite_coverage_nonvacuous(db):
    """At least half the cross-checked queries return rows — the
    equivalence suite is not vacuously comparing empty sets."""
    nonempty = 0
    for qn, (kwargs, sql) in _CASES.items():
        if db.execute(sql).fetchone() is not None:
            nonempty += 1
    assert nonempty >= len(_CASES) // 2, nonempty
