"""Extension: as-of and range joins over events x orders
(operators/asof.py).  DuckDB's native ASOF JOIN and a plain inequality join
are the oracles, so both composed operators are value-hash checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators import asof
from . import query

RANGE_SECONDS = 3600  # follow-up events within 1 hour of a click


def _events(t: catalog.Tables) -> DataFrame:
    return t.events.select("event_id", "user_id", "ts")


def _orders_daily(t: catalog.Tables) -> DataFrame:
    """Right side made unique per (customer, day): greatest orderkey wins —
    the determinism contract asof_join requires of its right input."""
    return (
        t.orders.filter(F.col("o_custkey") < 150)  # events cover users 0..149
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            # parquet timestamp[ms] surfaces as NTZ; align with the events
            # timestamp type (and the oracle's TIMESTAMP) under UTC session tz
            F.col("o_orderdate").cast("timestamp").alias("odate"),
        )
        .agg(F.max("o_orderkey").alias("orderkey"))
    )


@query(
    "x_asof_latest_order",
    oracle="""
WITH od AS (
  SELECT o_custkey AS user_id, o_orderdate AS odate, MAX(o_orderkey) AS orderkey
  FROM orders WHERE o_custkey < 150 GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       od.orderkey AS asof_orderkey,
       od.odate AS asof_odate
FROM events e ASOF LEFT JOIN od
  ON e.user_id = od.user_id AND e.ts >= od.odate
""",
)
def x_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the customer's latest order at-or-before
    the event time — one shuffle + one window pass (operators/asof.py), no
    inequality join."""
    t = catalog.load(spark, sf_dir)
    return asof.asof_join(
        _events(t),
        _orders_daily(t),
        on="user_id",
        left_time="ts",
        right_time="odate",
        payload=["orderkey", "odate"],
    )


@query(
    "x_range_join_click_followups",
    oracle=f"""
SELECT c.event_id AS click_id, e.event_id AS followup_id, c.ts AS click_ts, e.ts
FROM events c JOIN events e
  ON e.user_id = c.user_id
 AND e.ts >= c.ts
 AND epoch(e.ts) < epoch(c.ts) + {RANGE_SECONDS}
WHERE c.event_type = 'click' AND e.event_id != c.event_id
""",
)
def x_range_join_click_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for every click, the same user's events within the next
    hour, via time-bucket equi-join (each row probes <= 2 buckets — linear
    shuffle, not the cross-product the raw inequality join implies)."""
    t = catalog.load(spark, sf_dir)
    clicks = t.events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    evs = t.events.select(F.col("event_id").alias("followup_id"), "user_id", "ts")
    return (
        asof.range_join_buckets(
            clicks, evs, on="user_id", left_time="click_ts", right_time="ts",
            window_seconds=RANGE_SECONDS,
        )
        .filter(F.col("followup_id") != F.col("click_id"))
        .select("click_id", "followup_id", "click_ts", "ts")
    )


TOLERANCE_SECONDS = 7 * 24 * 3600  # orders older than a week don't count


@query(
    "x_asof_latest_order_7d",
    oracle=f"""
WITH od AS (
  SELECT o_custkey AS user_id, o_orderdate AS odate, MAX(o_orderkey) AS orderkey
  FROM orders WHERE o_custkey < 150 GROUP BY 1, 2
),
a AS (
  SELECT e.event_id, e.user_id, e.ts, od.orderkey, od.odate
  FROM events e ASOF LEFT JOIN od
    ON e.user_id = od.user_id AND e.ts >= od.odate
)
SELECT event_id, user_id, ts,
       CASE WHEN epoch_us(ts) - epoch_us(odate) <= {TOLERANCE_SECONDS * 1000000}
            THEN orderkey END AS asof_orderkey,
       CASE WHEN epoch_us(ts) - epoch_us(odate) <= {TOLERANCE_SECONDS * 1000000}
            THEN odate END AS asof_odate
FROM a
""",
)
def x_asof_latest_order_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 7-day tolerance horizon (pandas merge_asof
    `tolerance` semantics): the latest at-or-before order counts only when
    it is at most a week old at event time -- the freshness-bounded feature
    lookup of a training pipeline.  Same one-window-pass plan; the horizon
    is a projection, not a second join."""
    t = catalog.load(spark, sf_dir)
    return asof.asof_join_tolerance(
        _events(t),
        _orders_daily(t),
        on="user_id",
        left_time="ts",
        right_time="odate",
        payload=["orderkey", "odate"],
        tolerance_seconds=TOLERANCE_SECONDS,
    )


PEAK_HOURS = 20


@query(
    "x_range_interval_overlap",
    oracle=f"""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
sess AS (
  SELECT user_id,
         CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS ls,
         CAST(epoch_us(MAX(ts) + INTERVAL 30 MINUTE) // 1000000 AS BIGINT) AS le,
         COUNT(*) AS n_events
  FROM s GROUP BY user_id, sid
),
peaks AS (
  SELECT CAST(epoch_us(h) // 1000000 AS BIGINT) AS rs, n FROM (
    SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
    FROM events GROUP BY 1
    ORDER BY n DESC, h ASC LIMIT {PEAK_HOURS}
  )
)
SELECT sess.user_id, sess.ls AS session_start_s, sess.le AS session_end_s,
       CAST(sess.n_events AS BIGINT) AS n_events,
       peaks.rs AS peak_hour_s, CAST(peaks.n AS BIGINT) AS peak_events,
       CAST(least(sess.le, peaks.rs + 3600) - greatest(sess.ls, peaks.rs) AS BIGINT) AS overlap_seconds
FROM sess JOIN peaks
  ON sess.ls < peaks.rs + 3600 AND peaks.rs < sess.le
""",
)
def x_range_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (interval x interval, not point-in-window):
    per-user session windows against the corpus's top-{PEAK_HOURS} peak
    traffic hours -- which sessions rode a load spike, and for how long.

    The Spark side runs operators/asof.interval_overlap_join: both interval
    sets decompose into hour buckets, the join is an EQUI join on bucket,
    and the first-shared-bucket rule dedups multi-bucket matches without a
    DISTINCT shuffle -- the standard rewrite that keeps interval joins off
    the nested-loop path at 100 TB.  The DuckDB oracle is the plain theta
    join (the semantics); the bucket decomposition must reproduce it
    exactly, boundary cases included (half-open [start, end) intervals)."""
    t = catalog.load(spark, sf_dir)
    sess = (
        t.events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("ls"),
            F.unix_timestamp(F.col("w.end")).alias("le"),
            "n_events",
        )
    )
    peaks = (
        t.events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("peak_events"))
        .orderBy(F.col("peak_events").desc(), F.col("h").asc())
        .limit(PEAK_HOURS)
        .select(
            F.unix_timestamp("h").alias("rs"),
            (F.unix_timestamp("h") + 3600).alias("re"),
            "peak_events",
        )
    )
    return asof.interval_overlap_join(
        sess, peaks, "ls", "le", "rs", "re", bucket_seconds=3600
    ).select(
        "user_id",
        F.col("ls").alias("session_start_s"),
        F.col("le").alias("session_end_s"),
        "n_events",
        F.col("rs").alias("peak_hour_s"),
        F.col("peak_events").cast("long").alias("peak_events"),
        (F.least("le", "re") - F.greatest("ls", "rs")).cast("long").alias("overlap_seconds"),
    )
