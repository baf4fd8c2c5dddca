"""Extension: deduplication over `documents` (training-data pipeline).

Exact and normalized dedup here (hash-groupBy, fully shuffle-parallel);
MinHash-LSH / SimHash near-dup live in operators/dedup.py and register their
own query entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators import dedup
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


@query("x_dedup_minhash_signatures", oracle=dedup.minhash_signature_sql())
def x_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (32 perms) per document -- row-local, zero-shuffle
    (operators/dedup.py); md5-based hashing makes the DuckDB oracle bit-exact."""
    t = catalog.load(spark, sf_dir)
    return dedup.minhash_signature_df(t.documents)


@query("x_dedup_minhash_lsh_pairs", oracle=dedup.minhash_lsh_pairs_sql())
def x_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (8 bands x 4 rows) verified with
    exact Jaccard on the shingle sets."""
    t = catalog.load(spark, sf_dir)
    return dedup.minhash_lsh_pairs(t.documents)


@query("x_dedup_simhash", oracle=dedup.simhash_sql())
def x_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document via a single per-row array fold."""
    t = catalog.load(spark, sf_dir)
    return dedup.simhash_df(t.documents)


@query("x_dedup_simhash_pairs", oracle=dedup.simhash_pairs_sql())
def x_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 15-bit chunk banding + hamming<=3 verify
    (bit_count(xor) -- JVM built-ins)."""
    t = catalog.load(spark, sf_dir)
    return dedup.simhash_pairs(t.documents)


@query("x_dedup_ngram_jaccard", oracle=dedup.ngram_jaccard_pairs_sql())
def x_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard via inverted index with a
    document-frequency cutoff (the quadratic-blowup guard at scale)."""
    t = catalog.load(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(t.documents)


@query("x_dedup_clusters", oracle=dedup.dedup_clusters_sql())
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup decision: connected components over strong near-dup pairs
    (jaccard >= 0.5) via min-label propagation; cluster_id = smallest
    member, `keep` marks the representative.  The DuckDB oracle is the
    recursive-CTE transitive closure."""
    t = catalog.load(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(t.documents).filter(
        F.col("jaccard") >= dedup.DEDUP_CLUSTER_MIN_JACCARD
    )
    return dedup.dedup_clusters(pairs)


@query("x_dedup_incremental", oracle=dedup.incremental_dedup_sql())
def x_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time dedup: an incoming batch (doc_id % 5 == 0) is checked
    against the existing corpus via the LSH band-key index -- candidates
    confirmed with exact Jaccard, batch doc kept iff no corpus near-dup.
    Per-batch cost tracks |batch| x BANDS probe rows against a persisted
    bucket-keyed corpus index, never |corpus|^2 (operators/dedup.py
    incremental_dedup)."""
    t = catalog.load(spark, sf_dir)
    return dedup.incremental_dedup(t.documents)
