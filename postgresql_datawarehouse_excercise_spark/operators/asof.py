"""As-of and range joins — time-series operators Spark lacks as built-ins.

Both are expressed as compositions of existing DataFrame operators (the
SURVEY §7 custom-operator policy: composition first, Pandas UDF only if
semantics demand it — here they don't):

* **As-of join** (latest right row at-or-before each left time): tag both
  sides, UNION on (key, time), and run ONE window pass carrying the last
  non-null right payload forward.  Cost = a single shuffle on the join key +
  a sort within partitions — strictly better at scale than the naive
  inequality join (quadratic per key) and equivalent to what dedicated
  engines do with ordered merges.  DuckDB's native ASOF JOIN is the oracle.

* **Range join** (right rows within a time interval after the left time):
  bucket both sides by interval-sized time buckets and equi-join on
  (key, bucket) for the left bucket and its successor, then filter the
  exact predicate.  Each row joins <= 2 buckets, so the shuffle is linear
  in the data instead of the cross-product the raw inequality join implies.

Determinism: ties are resolved by preferring the greatest right timestamp
and then the greatest right key; right rows at exactly the left timestamp
DO match (at-or-before semantics, DuckDB `>=`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """For every left row: the right row with the greatest right_time <=
    left_time within the same `on` key (left rows keep NULL payload when no
    right row precedes them)."""
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    unioned = lt.unionByName(rt)
    # right rows sort BEFORE left rows at equal time => at-or-before matches
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload
        ],
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .select(
            *[f.name for f in left.schema.fields],
            *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in payload],
        )
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    window_seconds: int,
) -> DataFrame:
    """All (left, right) pairs with same key and
    left_time <= right_time < left_time + window_seconds, via time-bucket
    equi-join: each left row probes its own bucket and the next one."""
    bucket = lambda c: (F.unix_timestamp(c) / window_seconds).cast("long")  # noqa: E731
    lt = left.withColumn("_bk", bucket(F.col(left_time)))
    lt = lt.withColumn("_probe", F.explode(F.array(F.col("_bk"), F.col("_bk") + 1)))
    rt = right.withColumn("_probe", bucket(F.col(right_time)))
    joined = lt.join(rt, on=[on, "_probe"])
    keep = (F.col(right_time) >= F.col(left_time)) & (
        F.unix_timestamp(right_time)
        < F.unix_timestamp(left_time) + F.lit(window_seconds)
    )
    return joined.filter(keep).drop("_bk", "_probe")


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tolerance_seconds: int,
) -> DataFrame:
    """asof_join with a match horizon (pandas merge_asof `tolerance`): the
    latest right row at-or-before left_time counts ONLY if it is within
    `tolerance_seconds`; older matches become NULL payload.  Same single
    window pass; the tolerance is a post-projection, not another join.
    The matched right_time must be in `payload` so the horizon can be
    evaluated.  The delta is evaluated in MICROSECONDS (unix_micros), not
    cast('long') seconds: second-truncation silently widens the horizon by
    up to a second for sub-second timestamps, and disagrees with an oracle
    evaluating fractional epochs at the exact boundary."""
    if right_time not in payload:
        payload = [*payload, right_time]
    joined = asof_join(left, right, on, left_time, right_time, payload)
    within = (
        F.unix_micros(F.col(left_time)) - F.unix_micros(F.col(f"asof_{right_time}"))
    ) <= F.lit(int(round(tolerance_seconds * 1_000_000)))  # honors fractional tolerances
    return joined.select(
        *[f.name for f in left.schema.fields],
        *[
            F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in payload
        ],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """All (left, right) pairs whose HALF-OPEN epoch-second intervals
    [start, end) overlap, via bucket decomposition -- the pattern that
    turns an interval theta join (a nested-loop cross product at scale)
    into an equi join: every interval explodes to the fixed-size buckets
    it covers, the join keys on bucket, and a pair is kept only in the
    FIRST bucket both intervals share (bucket == floor(max(starts)/B)) --
    the standard dedup trick that avoids a DISTINCT shuffle over the
    multi-bucket double matches.  Explode fanout is bounded by
    interval_length/bucket_seconds + 1, so pick the bucket near the
    typical interval length; the residual overlap predicate keeps
    correctness independent of that tuning.

    Degenerate (empty) intervals with end <= start are DROPPED before the
    burst: an empty interval overlaps nothing under half-open semantics,
    but F.sequence(lo, hi) with hi < lo would generate a DESCENDING bucket
    range instead of none, resurrecting the row with a bucket it never
    covers -- and the residual predicate alone (left_start < right_end AND
    right_start < left_end) can still pass for e.g. [100,100) vs [50,200)
    (ADVICE r8)."""
    b = bucket_seconds

    def burst(df: DataFrame, s: str, e: str) -> DataFrame:
        # floor division, NOT cast-truncation: epochs before 1970 are
        # negative, and truncate-toward-zero would shift their buckets up
        # one and break coverage
        return df.filter(F.col(s) < F.col(e)).withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / b).cast("long"),
                    # end is exclusive: an interval ending exactly on a
                    # boundary does not reach into the next bucket
                    F.floor((F.col(e) - 1) / b).cast("long"),
                )
            ),
        )

    lt = burst(left, left_start, left_end)
    rt = burst(right, right_start, right_end)
    joined = lt.join(rt, "_bk")
    first_shared = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / b
    ).cast("long")
    keep = (
        (F.col("_bk") == first_shared)
        & (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
    )
    return joined.filter(keep).drop("_bk")
