"""Golden-output parity against the reference's own published results.

Every expected value below is a psql output embedded in the reference
writeup (/root/reference/assignment-5.md, cited per test).  Counts/ids/2-dp
sums are exact; unbounded-precision Postgres averages compare at 1e-4
tolerance (SURVEY.md §7.3 D4).  Skipped wholesale if the reference tree is
not present.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

from postgresql_datawarehouse_excercise_spark import refparity as rp
from postgresql_datawarehouse_excercise_spark.sources import bookorders

pytestmark = pytest.mark.skipif(
    not bookorders.available(), reason="reference dump not present"
)

TOL = 1e-4


@pytest.fixture(scope="module")
def wh(spark):
    return rp.RefWarehouse(spark)


def approx(x, expected):
    assert abs(float(x) - expected) < TOL, (x, expected)


def test_seed_row_counts(wh):
    # FIXTURES.md §A.1 (dump data blocks)
    assert wh.author.count() == 14
    assert wh.book.count() == 12
    assert wh.book_author.count() == 18
    assert wh.cust_order.count() == 222
    assert wh.customer.count() == 118
    assert wh.order_detail.count() == 1100


def test_cleanup_applied(wh):
    assert wh.customer.filter("city = 'Sidney'").count() == 0
    assert wh.customer.filter("customerid = 96 AND district = 'Povardarje'").count() == 1
    assert wh.customer.filter("customerid = 100 AND district = 'Budapest'").count() == 1


def test_time_dim_golden(wh):
    # 124 rows (assignment-5.md:77-82); earliest date gets timeid 1
    t = wh.time()
    assert t.count() == 124
    first = t.orderBy("timeid").first()
    assert first.timeid == 1
    assert str(first.orderdate) == "1998-03-01"
    assert first.dayofweek == "Sunday" and first.month == "March" and first.year == 1998


def test_sales_fact_golden(wh):
    # 1,070 rows (assignment-5.md:148-153); 3-col key unique (sql:80)
    s = wh.sales()
    assert s.count() == 1070
    assert s.select("customerid", "timeid", "isbn").distinct().count() == 1070


def test_q2_averages_golden(wh):
    # avg-of-avgs 202.9588... (md:171-175); per-transaction 161.3691... (md:182-186)
    approx(rp.avg_of_avgs(wh).first()[0], 202.9588687852809865)
    approx(rp.avg_transaction(wh).first()[0], 161.3691588785046729)
    assert rp.avg_amnt_view(wh).count() == 104  # md:170


def test_q2_weighted_reconstruction_golden(wh):
    # 198 customer-day tuples; avg 872.0454... (md:204-212); weighted
    # reconstruction must reproduce it exactly (md:229-239)
    scpd = rp.sum_customer_per_day(wh)
    assert scpd.count() == 198
    from pyspark.sql import functions as F

    approx(scpd.agg(F.avg("amnt_spent_daily_by_customers")).first()[0], 872.0454545454545455)
    approx(rp.weighted_avg(wh).first()[0], 872.0454545454545455)


def test_q3a_best_buyers_golden(wh):
    # ids 1,3,14,2,79 spending 17810/14100/11780/7145/6095 (md:268-275)
    rows = rp.best_buyers(wh).collect()
    assert [r.customerid for r in rows] == [1, 3, 14, 2, 79]
    assert [r.spending for r in rows] == [
        Decimal("17810.00"), Decimal("14100.00"), Decimal("11780.00"),
        Decimal("7145.00"), Decimal("6095.00"),
    ]


def test_q3b_chain_golden(wh):
    assert rp.amount_per_order(wh).count() == 222          # md:300
    approx(rp.ord_avg_amnt(wh).first()[0], 777.7702702702702703)  # md:308-313
    assert rp.no_of_ord(wh).first()[0] == 14               # md:329-334
    assert rp.amount_per_order_by_customer(wh).count() == 14  # md:357-374
    approx(rp.perc_of_ord(wh).first()[0], 71.4285714285714286)  # md:389-394
    assert (
        rp.classification(wh).first()[0]
        == "greater (than average) to medium number of orders are above the average amount"
    )  # md:421-426


def test_q4_view_cardinalities_golden(wh):
    assert rp.view1(wh).count() == 1070   # full fact grain
    assert rp.view2(wh).count() == 132    # md:616
    assert rp.view3(wh).count() == 1006   # md:807


def test_q4b_top_country_consistent(wh):
    # raw and View3+FD-bridge formulations must agree (md:820-825)
    raw = rp.top_country_raw(wh).first()
    via_view = rp.top_country_view3(wh).first()
    assert raw.country == via_view.country
    assert raw.spending == via_view.spending


def test_q5a_golden(wh):
    assert rp.q5a_customer_sums(wh).count() == 25   # md:847-874
    assert rp.q5a_city_avgs(wh).count() == 13       # md:885-900
    assert rp.q5a_window_report(wh).count() == 25   # md:919-946
    assert rp.customer_spending(wh).count() == 25   # md:962


def test_q5a_window_equals_groupby(wh):
    # window-total formulation == groupBy formulation (same 25 customers)
    win = {
        (r.customerid, r.sumofsalesbycustomer)
        for r in rp.q5a_window_report(wh).collect()
    }
    grp = {
        (r.customerid, r.sumofsalesbycustomer)
        for r in rp.q5a_customer_sums(wh).collect()
    }
    assert win == grp


def test_q5b_cumulative_golden(wh):
    # 33 rows; MV and nested-window formulations identical (md:1035-1129)
    mv_rows = sorted(
        map(tuple, rp.q5b_cumulative_from_mv(wh).collect())
    )
    nested_rows = sorted(
        map(tuple, rp.q5b_cumulative_nested(wh).collect())
    )
    assert len(mv_rows) == 33
    assert mv_rows == nested_rows


def test_q5b_last_cumulative_equals_city_total(wh):
    # invariant: final running sum per city == city total in the period
    from pyspark.sql import functions as F

    cum = rp.q5b_cumulative_from_mv(wh)
    last = (
        cum.groupBy("city")
        .agg(F.max("cumulative_sum").alias("final_cum"))
    )
    totals = (
        rp.sum_per_day_per_city(wh)
        .groupBy("city")
        .agg(F.sum("sumspending").alias("total"))
    )
    joined = last.join(totals, "city").collect()
    assert joined and all(r.final_cum == r.total for r in joined)


def test_q5a_period_avg_variant_golden(wh):
    # 25 rows (md:977-1004); within a city every row carries the same avg,
    # equal to mean of the period spends in that city
    rows = rp.q5a_period_avg_by_city(wh).collect()
    assert len(rows) == 25
    by_city = {}
    for r in rows:
        by_city.setdefault(r.city, []).append(r)
    for city, rs in by_city.items():
        avgs = {float(r.avgspendingbycity) for r in rs}
        assert len(avgs) == 1
        want = sum(float(r.amountofspending) for r in rs) / len(rs)
        assert abs(avgs.pop() - want) < 1e-6, city
