"""Sink writers: layout-aware persistence for facts and dimensions.

The reference persists MVs as heap tables with indexes (SURVEY.md §2-A3/A7);
the Spark-native analogs are physical *layout* choices at write time:

  * `write_partitioned` — date/key-partitioned parquet: partition pruning is
    the index-scan analog (a filtered read touches only matching dirs).
  * `write_bucketed`    — hash-bucketed + sorted saveAsTable: co-located
    joins on the bucket key skip the shuffle entirely (the 100 TB answer to
    the reference's repeated sales-fact joins).
  * `write_sorted`      — sort-within-partitions before write: row-group
    min/max stats become effective (Z-order-lite clustering analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partition_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Plain read; prune by filtering on the partition column (tests assert
    the scan's `PartitionFilters`)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_sorted(df: DataFrame, path: str, sort_cols: list[str]) -> None:
    df.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)
