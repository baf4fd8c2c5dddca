"""Time dimension builder.

Re-expresses the reference's SERIAL-keyed time dimension
(/root/reference/assignment-5.sql:42-61: CREATE TABLE time ... INSERT SELECT
DISTINCT orderdate, to_char(Day), to_char(Month), extract(YEAR)) as a
DataFrame pipeline:

  distinct order dates  ->  row_number() over (order by date)  ->  name cols

Scale design: the DISTINCT is a map-side-combinable aggregate that collapses
100 TB of orders to at most ~tens-of-thousands of calendar dates BEFORE the
window; the single-partition row_number therefore runs on a trivially small
set (dates are bounded by the calendar span, not by data volume).  This is the
SURVEY.md 7.3 D5 decision: keep `build_time_dim` as the stable interface; the
global-window step never sees more than |distinct dates| rows.

Postgres `to_char(d,'Day')` blank-pads names to 9 chars (bpchar semantics);
we store trimmed names per SURVEY.md 7.3 D1 -- `date_format` already returns
unpadded 'Tuesday' / 'April'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_time_dim(orders: DataFrame, date_col: str = "o_orderdate") -> DataFrame:
    """timeid BIGINT, orderdate DATE, dayofweek STRING, month STRING, year BIGINT."""
    dates = orders.select(F.col(date_col).cast("date").alias("orderdate")).distinct()
    w = Window.orderBy("orderdate")  # tiny input: |distinct dates| rows
    return dates.select(
        F.row_number().over(w).cast("long").alias("timeid"),
        F.col("orderdate"),
        F.date_format("orderdate", "EEEE").alias("dayofweek"),
        F.date_format("orderdate", "MMMM").alias("month"),
        F.year("orderdate").cast("long").alias("year"),
    )


TIME_DIM_SCHEMA = (
    "timeid BIGINT, orderdate DATE, dayofweek STRING, month STRING, year BIGINT"
)


def empty_time_dim(spark) -> DataFrame:
    """Zero-row time dimension (the bootstrap state for incremental
    maintenance: the first delta batch extends from here)."""
    return spark.createDataFrame([], TIME_DIM_SCHEMA)


def extend_time_dim(
    existing: DataFrame, orders: DataFrame, date_col: str = "o_orderdate"
) -> DataFrame:
    """Incremental SERIAL append: dates not yet in the dimension get ids
    continuing from max(timeid), in date order; existing rows keep their
    ids.  Stable surrogate keys are what a live warehouse needs -- a full
    rebuild renumbers every fact row's foreign key if a late-arriving date
    interleaves, this append never does.  When new dates all sort after the
    existing ones (the normal forward-moving-clock case) the result is
    identical to a full rebuild.  Scale: the anti join compares distinct
    dates (calendar-bounded), the window sees only the NEW dates."""
    new_dates = (
        orders.select(F.col(date_col).cast("date").alias("orderdate"))
        .distinct()
        .join(existing.select("orderdate"), "orderdate", "left_anti")
    )
    w = Window.orderBy("orderdate")  # tiny input: new distinct dates only
    base_max = existing.agg(F.coalesce(F.max("timeid"), F.lit(0)).alias("max_id"))
    appended = new_dates.crossJoin(F.broadcast(base_max)).select(
        (F.row_number().over(w) + F.col("max_id")).cast("long").alias("timeid"),
        F.col("orderdate"),
        F.date_format("orderdate", "EEEE").alias("dayofweek"),
        F.date_format("orderdate", "MMMM").alias("month"),
        F.year("orderdate").cast("long").alias("year"),
    )
    return existing.unionByName(appended)


# DuckDB oracle twin (same semantics; dayname/monthname return unpadded names).
ORACLE_TIME_DIM = """
SELECT CAST(row_number() OVER (ORDER BY orderdate) AS BIGINT) AS timeid,
       orderdate,
       dayname(orderdate) AS dayofweek,
       monthname(orderdate) AS month,
       CAST(year(orderdate) AS BIGINT) AS year
FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS orderdate FROM orders)
"""
