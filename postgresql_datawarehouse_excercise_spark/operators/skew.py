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
