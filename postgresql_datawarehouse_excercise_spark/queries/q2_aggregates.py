"""Q2 -- aggregate hierarchy: avg-of-avgs vs per-transaction avg vs the
correct two-step (per-customer-per-day) average and its weighted
reconstruction.

Reference: /root/reference/assignment-5.sql:128-175; golden lesson: the
avg-of-avgs (202.95...) differs from the per-transaction avg (161.36...),
while the weighted reconstruction exactly reproduces the two-step average
(872.04...) -- the same invariants must hold on the driver data (tested in
tests/test_invariants.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..etl.sales_fact import ORACLE_SALES_CTE
from ..functions import avg4_exact, money, ratio
from . import query

_W = f"WITH {ORACLE_SALES_CTE}"


@query(
    "q2_avg_amnt_per_customer",
    oracle=f"""{_W}
SELECT customerid,
       FLOOR((CAST(SUM(amnt) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_amnt
FROM sales GROUP BY customerid
""",
)
def q2_avg_amnt_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_amnt_view: per-customer average transaction amount
    (assignment-5.sql:128-133)."""
    sales = catalog.load(spark, sf_dir).sales()
    return sales.groupBy("customerid").agg(
        ratio(F.sum("amnt"), F.count(F.lit(1))).alias("avg_amnt")
    )


@query(
    "q2_avg_of_avgs",
    oracle=f"""{_W},
per_cust AS (
  SELECT customerid,
         CAST(FLOOR((CAST(SUM(amnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(18,4)) AS avg_amnt
  FROM sales GROUP BY customerid
)
SELECT FLOOR((CAST(SUM(avg_amnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_of_avgs
FROM per_cust
""",
)
def q2_avg_of_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deliberately 'wrong' average-of-per-customer-averages
    (assignment-5.sql:135-139, golden 202.9588... at reference scale)."""
    sales = catalog.load(spark, sf_dir).sales()
    per_cust = sales.groupBy("customerid").agg(
        avg4_exact(F.sum("amnt"), F.count(F.lit(1))).alias("avg_amnt")
    )
    return per_cust.agg(
        ratio(F.sum("avg_amnt"), F.count(F.lit(1))).alias("avg_of_avgs")
    )


@query(
    "q2_avg_transaction",
    oracle=f"""{_W}
SELECT FLOOR((CAST(SUM(amnt) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_transaction
FROM sales
""",
)
def q2_avg_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction (per fact-row) average amount
    (assignment-5.sql:135-139 'accepted answer', golden 161.3691...)."""
    sales = catalog.load(spark, sf_dir).sales()
    return sales.agg(
        ratio(F.sum("amnt"), F.count(F.lit(1))).alias("avg_transaction")
    )


@query(
    "q2_sum_customer_per_day",
    oracle=f"""{_W}
SELECT customerid, timeid,
       CAST(ROUND(SUM(amnt), 2) AS DOUBLE) AS amnt_spent_daily
FROM sales GROUP BY customerid, timeid
""",
)
def q2_sum_customer_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum_customer_per_day: per-(customer, day) spend -- first step of the
    correct two-step average (assignment-5.sql:149-155)."""
    sales = catalog.load(spark, sf_dir).sales()
    return sales.groupBy("customerid", "timeid").agg(
        money(F.sum("amnt")).alias("amnt_spent_daily")
    )


@query(
    "q2_daily_avg_spending",
    oracle=f"""{_W},
per_cd AS (
  SELECT customerid, timeid, SUM(amnt) AS spent
  FROM sales GROUP BY customerid, timeid
)
SELECT timeid,
       COUNT(*) AS number_of_customer_a_day,
       FLOOR((CAST(SUM(spent) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_spending
FROM per_cd GROUP BY timeid
""",
)
def q2_daily_avg_spending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg_spending_by_customer_on_each_day: per-day customer count and avg
    spend (assignment-5.sql:165-170)."""
    sales = catalog.load(spark, sf_dir).sales()
    per_cd = sales.groupBy("customerid", "timeid").agg(F.sum("amnt").alias("spent"))
    return per_cd.groupBy("timeid").agg(
        F.count(F.lit(1)).alias("number_of_customer_a_day"),
        ratio(F.sum("spent"), F.count(F.lit(1))).alias("avg_spending"),
    )


@query(
    "q2_avg_per_customer_day",
    oracle=f"""{_W},
per_cd AS (
  SELECT customerid, timeid, SUM(amnt) AS spent
  FROM sales GROUP BY customerid, timeid
)
SELECT COUNT(*) AS customer_day_tuples,
       FLOOR((CAST(SUM(spent) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS total_avg
FROM per_cd
""",
)
def q2_avg_per_customer_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step correct average over (customer, day) tuples
    (assignment-5.sql:159-161, golden 872.0454... / 198 tuples)."""
    sales = catalog.load(spark, sf_dir).sales()
    per_cd = sales.groupBy("customerid", "timeid").agg(F.sum("amnt").alias("spent"))
    return per_cd.agg(
        F.count(F.lit(1)).alias("customer_day_tuples"),
        ratio(F.sum("spent"), F.count(F.lit(1))).alias("total_avg"),
    )


@query(
    "q2_weighted_avg",
    oracle=f"""{_W},
per_cd AS (
  SELECT customerid, timeid, SUM(amnt) AS spent
  FROM sales GROUP BY customerid, timeid
),
daily AS (
  SELECT timeid, COUNT(*) AS n,
         CAST(FLOOR((CAST(SUM(spent) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS DECIMAL(18,4)) AS avg_spending
  FROM per_cd GROUP BY timeid
)
SELECT FLOOR((CAST(SUM(avg_spending * n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS total_avg
FROM daily
""",
)
def q2_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reconstruction SUM(avg*n)/SUM(n) over the daily MV -- must
    equal q2_avg_per_customer_day.total_avg (assignment-5.sql:172-175,
    golden equality at 872.0454...)."""
    sales = catalog.load(spark, sf_dir).sales()
    per_cd = sales.groupBy("customerid", "timeid").agg(F.sum("amnt").alias("spent"))
    daily = per_cd.groupBy("timeid").agg(
        F.count(F.lit(1)).alias("n"),
        avg4_exact(F.sum("spent"), F.count(F.lit(1))).alias("avg_spending"),
    )
    return daily.agg(
        ratio(F.sum(F.col("avg_spending") * F.col("n")), F.sum("n")).alias("total_avg")
    )
