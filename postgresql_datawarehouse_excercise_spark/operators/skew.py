"""Skew-mitigation utilities.

Joins get skew handling for free from AQE (`skewJoin.enabled`, session.py);
aggregations do not: a single hot group key funnels every row of that group
through one reducer.  `salted_agg` is the classic two-phase fix — pre-
aggregate on (key, salt) so the hot key fans out over `buckets` reducers,
then combine the partials.

The salt must be DETERMINISTIC (no rand(): task retries must re-produce the
same salt or partials double-count): here it derives from xxhash64 of the
whole row, which distributes uniformly without any extra column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    out_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase sum: groupBy(keys + salt) partials, then groupBy(keys).

    Equivalent to ``df.groupBy(keys).agg(sum(value))`` for any additive
    measure; the extra exchange costs one pass over the (already reduced)
    partials — at 100 TB with a hot key this converts a straggler reducer
    into `buckets` parallel ones."""
    value_col = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).alias("_salt")
    partial = (
        df.select(*keys, value_col.alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: DataFrame,
    buckets: int = 16,
) -> DataFrame:
    """Skew-salted equi-join -- the JOIN half of the skew toolkit beside
    `salted_sum` (aggregation) and x_pipeline_skew_report (diagnosis).

    A shuffle join on a skewed key funnels every row of a hot key through
    ONE reducer pair; AQE's skew-join splits oversized partitions after
    the fact, but the canonical fix when the hot keys are KNOWN (from the
    skew_report pre-flight) is to salt before shuffling: the big side gets
    a deterministic salt in [0, buckets) on its hot-key rows (0 on cold
    rows, so cold keys pay nothing), and the small side replicates its
    hot-key rows `buckets` ways (cold rows once, salt 0); the join key
    becomes (key, salt), fanning each hot key over `buckets` reducers.
    Row-identical to the plain join by construction: every (big-row,
    small-row) key match meets on exactly one salt value.

    `hot_keys` is a small one-column (key) relation -- skew_report's top-k
    or a share-threshold filter -- broadcast into both sides.  It is
    DEDUPLICATED here (distinct) before the marker joins: a duplicate key
    value would fan out both sides and break the row-identical guarantee.
    The salt must be DETERMINISTIC (task retries: xxhash64 of the whole
    big row, same rule as salted_sum).  The returned plan is hinted
    shuffle_hash on the small side: at the scales where salting matters
    the replicated small side no longer broadcasts, and sort-merge would
    pay a sort on the salted fanout for nothing.
    """
    is_hot = F.broadcast(
        hot_keys.select(key).distinct().withColumn("_is_hot", F.lit(True))
    )
    big_s = (
        big.join(is_hot, key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_is_hot"),
                F.pmod(F.xxhash64(*big.columns), F.lit(buckets)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("_is_hot")
    )
    small_s = (
        small.join(is_hot, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_is_hot"),
                F.sequence(F.lit(0), F.lit(buckets - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt_raw", F.explode("_salts"))
        .withColumn("_salt", F.col("_salt_raw").cast("int"))
        .drop("_is_hot", "_salts", "_salt_raw")
    )
    return big_s.join(small_s.hint("shuffle_hash"), [key, "_salt"]).drop("_salt")
