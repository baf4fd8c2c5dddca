"""Extension: event-stream analytics over `events` (batch twins of the
streaming/ operators; streaming versions use readStream + watermark on the
same logic -- see streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..functions import dec, money, ratio
from . import query


@query(
    "x_events_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
)
def x_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type (batch form of the
    streaming tumbling-window operator)."""
    t = catalog.load(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
    )


@query(
    "x_events_user_daily",
    oracle="""
SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_value
FROM events GROUP BY 1, 2
""",
)
def x_events_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup (count + exact-decimal average value)."""
    t = catalog.load(spark, sf_dir)
    return (
        t.events.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ratio(F.sum(dec("value")), F.count(F.lit(1))).alias("avg_value"),
        )
    )
