"""Sales fact builder (star-schema materialization).

Re-expresses the reference's sales materialized view
(/root/reference/assignment-5.sql:70-80: SELECT customerid, timeid, isbn,
SUM(quantity*price) FROM 5-way NATURAL JOIN GROUP BY customer, day, book)
on the driver schema per FIXTURES.md section B:

  customer->c_custkey, order->o_orderkey, book->p_partkey,
  amnt = SUM(l_quantity * p_retailprice).

Plan shape (the one we want at 100 TB):
  lineitem JOIN orders        -- the only big-big join; shuffle on orderkey,
                                 AQE skew-split if a hot order key exists
  ... JOIN part (un-hinted)   -- part scales LINEARLY with SF (200k x SF in
                                 TPC-H terms), so no static broadcast hint:
                                 AQE promotes the join to broadcast at
                                 runtime while the slice fits, and falls
                                 back to shuffle when it no longer does
  ... JOIN time (broadcast)   -- bounded by CALENDAR DAYS (Deduplicate of
                                 order dates), constant at any SF
  groupBy(custkey,timeid,partkey)  -- partial (map-side) agg then final

Money arithmetic is DECIMAL(18,2)-exact (functions.dec) so the fact content is
bit-stable regardless of partitioning -- see functions/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cents_sum


def build_sales(
    lineitem: DataFrame, orders: DataFrame, part: DataFrame, time_dim: DataFrame
) -> DataFrame:
    """customerid BIGINT, timeid BIGINT, partkey BIGINT, amnt DECIMAL(38,4)."""
    line = lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    ords = orders.select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("orderdate")
    )
    prices = part.select("p_partkey", "p_retailprice")
    tdim = time_dim.select("timeid", "orderdate")
    joined = (
        line.join(ords, line.l_orderkey == ords.o_orderkey)
        .join(prices, line.l_partkey == prices.p_partkey)
        .join(F.broadcast(tdim), "orderdate")
    )
    return joined.groupBy(
        F.col("o_custkey").alias("customerid"),
        F.col("timeid"),
        F.col("l_partkey").alias("partkey"),
    ).agg(cents_sum("l_quantity", "p_retailprice").alias("amnt"))


# DuckDB oracle twin over the same parquet views; `time` is the ORACLE_TIME_DIM
# subquery. Kept as a CTE template so query oracles can compose WITH sales AS...
ORACLE_SALES_CTE = """
time AS (
  SELECT CAST(row_number() OVER (ORDER BY orderdate) AS BIGINT) AS timeid, orderdate
  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS orderdate FROM orders)
),
sales AS (
  SELECT o_custkey AS customerid, timeid, l_partkey AS partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS amnt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN time ON CAST(o_orderdate AS DATE) = time.orderdate
  GROUP BY 1, 2, 3
)
"""
