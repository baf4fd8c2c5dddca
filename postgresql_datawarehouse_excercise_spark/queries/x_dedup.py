"""Extension: deduplication over `documents` (training-data pipeline).

Exact and normalized dedup here (hash-groupBy, fully shuffle-parallel);
MinHash-LSH / SimHash near-dup live in operators/dedup.py and register their
own query entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from . import query


@query(
    "x_dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
""",
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content md5, keep lowest doc_id.
    Map-side partial agg collapses duplicates before the shuffle, so network
    volume is O(distinct docs) at 100 TB."""
    t = catalog.load(spark, sf_dir)
    return (
        t.documents.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "x_dedup_normalized",
    oracle=r"""
SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
""",
)
def x_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on the normalized fingerprint (case/whitespace
    folded)."""
    t = catalog.load(spark, sf_dir)
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        t.documents.groupBy(F.md5(norm).alias("content_hash"))
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
