"""Q1 -- the ETL surface as queries: time dimension and sales fact.

Reference: /root/reference/assignment-5.sql:42-61 (time), :70-80 (sales MV).
Retargeted onto the driver schema per FIXTURES.md section B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..etl.sales_fact import ORACLE_SALES_CTE
from ..etl.time_dim import ORACLE_TIME_DIM
from ..functions import money
from . import query


@query("q1_time_dim", oracle=ORACLE_TIME_DIM)
def q1_time_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time dimension: distinct order dates keyed by ascending-date row_number
    (SERIAL analog, assignment-5.sql:44), weekday/month names, year."""
    return catalog.load(spark, sf_dir).time_dim()


@query(
    "q1_sales_fact",
    oracle=f"""
WITH {ORACLE_SALES_CTE}
SELECT customerid, timeid, partkey, CAST(ROUND(amnt, 2) AS DOUBLE) AS amnt
FROM sales
""",
)
def q1_sales_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales fact: 4-way join + group by (customer, day, part),
    amnt = SUM(quantity * retailprice)  (assignment-5.sql:70-78)."""
    sales = catalog.load(spark, sf_dir).sales()
    return sales.select(
        "customerid", "timeid", "partkey", money(F.col("amnt")).alias("amnt")
    )
