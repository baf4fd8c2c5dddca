"""Text-format sources/sinks: JSONL and CSV with explicit schemas.

The reference ingests via Postgres COPY (BookOrdersDatabaseDump_17.sql COPY
blocks); a 100 TB training-data pipeline additionally ingests/exports
JSONL and CSV.  Both directions here are schema-explicit (never
inferSchema: a schema inference pass is a full extra scan at scale, and
silently drifts), partition-parallel (each output file is an independent
read task), and compressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSONL export: one JSON object per line, gzip per-file (splittable at
    the file level -- shard count = upstream partition count)."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-explicit JSONL scan; corrupt lines land in a quarantine column
    instead of failing the job (PERMISSIVE + columnNameOfCorruptRecord)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_csv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    df.write.mode("overwrite").option("header", "true").option(
        "compression", compression
    ).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


BUCKETS = 8  # bucket count shared by co-located fact pairs


def write_bucketed(df: DataFrame, name: str, path: str, key: str) -> None:
    """Persist `df` as an external table bucketed AND sorted on `key`
    (BUCKETS buckets): the write-time shuffle that makes every later join
    on `key` between same-bucketed tables exchange-free.  Both sides of a
    co-located pair must use this one function so the bucketing scheme
    can never drift between them."""
    (
        df.write.bucketBy(BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )
