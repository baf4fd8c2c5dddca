"""Q5 -- window-function suite: partition totals, two windows per SELECT,
named windows, cumulative sums, window-over-window nesting.

Reference: /root/reference/assignment-5.sql:489-614.  The reference filters
April-May 2017; the driver testdata spans 1995-2001, so the period is
parameterized to April-May 1997 (FIXTURES.md section B: "parameterized to a
month-pair/year present in the synthetic data").  "city" maps to the nation
name per the geography mapping.

Window averages are computed as exact-decimal window SUM / window COUNT
(double-rounded at 4dp) so both engines agree bit-for-bit; cumulative sums
stay in DECIMAL until the final money() projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..etl.sales_fact import ORACLE_SALES_CTE
from ..functions import money, ratio
from . import query

PERIOD_MONTHS = ("April", "May")
PERIOD_YEAR = 1997

_PERIOD_SQL = f"month IN ('April','May') AND year = {PERIOD_YEAR}"

# sales rows of the period, joined to customer geography and time attributes.
_PERIOD_CTE = f"""{ORACLE_SALES_CTE},
tfull AS (
  SELECT CAST(row_number() OVER (ORDER BY orderdate) AS BIGINT) AS timeid,
         orderdate, dayname(orderdate) AS day, monthname(orderdate) AS month,
         CAST(year(orderdate) AS BIGINT) AS year
  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS orderdate FROM orders)
),
period_sales AS (
  SELECT s.customerid, c.c_name AS name, n.n_name AS city,
         s.timeid, t.day, s.partkey, s.amnt
  FROM sales s
  JOIN customer c ON s.customerid = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN tfull t ON s.timeid = t.timeid
  WHERE t.{_PERIOD_SQL}
)"""


def _period_sales(t: catalog.Tables) -> DataFrame:
    """Sales facts restricted to the report period, with name/city/day --
    the shared scan of every Q5 query (filter pushes to the time dim join;
    month/year predicates prune before the fact join at scale)."""
    sales = t.sales()
    tdim = (
        t.time_dim()
        .filter(F.col("month").isin(*PERIOD_MONTHS) & (F.col("year") == PERIOD_YEAR))
        .select("timeid", F.col("dayofweek").alias("day"))
    )
    cust = t.customer.select(
        F.col("c_custkey").alias("customerid"), F.col("c_name").alias("name"), "c_nationkey"
    )
    nation = t.nation.select("n_nationkey", F.col("n_name").alias("city"))
    return (
        sales.join(F.broadcast(tdim), "timeid")
        .join(cust, "customerid")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("customerid", "name", "city", "timeid", "day", "partkey", "amnt")
    )


@query(
    "q5a_customer_spending",
    oracle=f"""WITH {_PERIOD_CTE}
SELECT customerid, name, city, CAST(ROUND(SUM(amnt), 2) AS DOUBLE) AS amountofspending
FROM period_sales GROUP BY 1, 2, 3
""",
)
def q5a_customer_spending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer_spending MV: per-customer period spend with name and city
    (assignment-5.sql:534-543)."""
    t = catalog.load(spark, sf_dir)
    return (
        _period_sales(t)
        .groupBy("customerid", "name", "city")
        .agg(money(F.sum("amnt")).alias("amountofspending"))
    )


@query(
    "q5a_window_report",
    oracle=f"""WITH {_PERIOD_CTE}
SELECT DISTINCT customerid, name, city,
       CAST(ROUND(SUM(amnt) OVER custwin, 2) AS DOUBLE) AS sumspending,
       FLOOR((CAST(SUM(amnt) OVER citywin AS DOUBLE) / CAST(COUNT(*) OVER citywin AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avgcityspending
FROM period_sales
WINDOW custwin AS (PARTITION BY customerid), citywin AS (PARTITION BY city)
""",
)
def q5a_window_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two named windows in one SELECT: per-customer total + per-city average
    without collapsing rows, then DISTINCT (assignment-5.sql:514-527,
    SURVEY 2 E2-E5/E8)."""
    t = catalog.load(spark, sf_dir)
    cust_win = Window.partitionBy("customerid")
    city_win = Window.partitionBy("city")
    return (
        _period_sales(t)
        .select(
            "customerid",
            "name",
            "city",
            money(F.sum("amnt").over(cust_win)).alias("sumspending"),
            ratio(F.sum("amnt").over(city_win), F.count(F.lit(1)).over(city_win)).alias(
                "avgcityspending"
            ),
        )
        .distinct()
    )


_SPDPC_CTE = f"""{_PERIOD_CTE},
sum_per_day_per_city AS (
  SELECT city, timeid, day, SUM(amnt) AS sumspending
  FROM period_sales GROUP BY 1, 2, 3
)"""


@query(
    "q5b_sum_per_day_per_city",
    oracle=f"""WITH {_SPDPC_CTE}
SELECT city, timeid, day, CAST(ROUND(sumspending, 2) AS DOUBLE) AS sumspending
FROM sum_per_day_per_city
""",
)
def q5b_sum_per_day_per_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum_per_day_per_city MV (assignment-5.sql:567-576)."""
    t = catalog.load(spark, sf_dir)
    return (
        _period_sales(t)
        .groupBy("city", "timeid", "day")
        .agg(money(F.sum("amnt")).alias("sumspending"))
    )


_CUMSUM_SQL = f"""WITH {_SPDPC_CTE}
SELECT city, timeid, day,
       CAST(ROUND(sumspending, 2) AS DOUBLE) AS sumspending,
       CAST(ROUND(SUM(sumspending) OVER (PARTITION BY city ORDER BY timeid), 2) AS DOUBLE) AS cumulative
FROM sum_per_day_per_city
"""


@query("q5b_cumulative_sum", oracle=_CUMSUM_SQL)
def q5b_cumulative_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-city running total over days -- ORDER BY window with the default
    RANGE UNBOUNDED PRECEDING..CURRENT ROW frame, identical in Spark and
    Postgres (assignment-5.sql:585-588, SURVEY 2 E6)."""
    t = catalog.load(spark, sf_dir)
    per_day = (
        _period_sales(t).groupBy("city", "timeid", "day").agg(F.sum("amnt").alias("sum_d"))
    )
    run = Window.partitionBy("city").orderBy("timeid")
    return per_day.select(
        "city",
        "timeid",
        "day",
        money(F.col("sum_d")).alias("sumspending"),
        money(F.sum("sum_d").over(run)).alias("cumulative"),
    )


@query("q5b_nested_windows", oracle=_CUMSUM_SQL)
def q5b_nested_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same report as a single nested-window query: inner per-(city,day)
    window sum + DISTINCT, outer per-city running sum -- window over a
    windowed subquery (assignment-5.sql:597-614, SURVEY 2 E7).  Must equal
    q5b_cumulative_sum row-for-row (reference golden: both formulations
    identical, assignment-5.md:1035-1129)."""
    t = catalog.load(spark, sf_dir)
    day_win = Window.partitionBy("city", "timeid")
    inner = (
        _period_sales(t)
        .select(
            "city",
            "timeid",
            "day",
            F.sum("amnt").over(day_win).alias("sum_d"),
        )
        .distinct()
    )
    run = Window.partitionBy("city").orderBy("timeid")
    return inner.select(
        "city",
        "timeid",
        "day",
        money(F.col("sum_d")).alias("sumspending"),
        money(F.sum("sum_d").over(run)).alias("cumulative"),
    )


@query(
    "q5a_period_avg_by_city",
    oracle=f"""WITH {_PERIOD_CTE},
customer_spending AS (
  SELECT customerid, name, city, SUM(amnt) AS amountofspending
  FROM period_sales GROUP BY 1, 2, 3
)
SELECT customerid, name, city,
       CAST(ROUND(amountofspending, 2) AS DOUBLE) AS amountofspending,
       FLOOR((CAST(SUM(amountofspending) OVER citywin AS DOUBLE)
             / CAST(COUNT(*) OVER citywin AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avgspendingbycity
FROM customer_spending
WINDOW citywin AS (PARTITION BY city)
""",
)
def q5a_period_avg_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's second Q5a report (assignment-5.sql:545-557): average
    of per-customer PERIOD spending per city (window over the
    customer_spending MV grain, not over transactions -- the 'different
    report' the writeup contrasts, md:977-1004)."""
    t = catalog.load(spark, sf_dir)
    spending = (
        _period_sales(t)
        .groupBy("customerid", "name", "city")
        .agg(F.sum("amnt").alias("amountofspending"))
    )
    city_win = Window.partitionBy("city")
    return spending.select(
        "customerid",
        "name",
        "city",
        money(F.col("amountofspending")).alias("amountofspending"),
        ratio(
            F.sum("amountofspending").over(city_win),
            F.count(F.lit(1)).over(city_win),
        ).alias("avgspendingbycity"),
    )
