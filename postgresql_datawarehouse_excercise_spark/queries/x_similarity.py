"""Extension: similarity search over `embeddings` (array<float> column).

Brute-force cosine top-k as the exact baseline (JVM-side zip_with/aggregate
fold -- deterministic sequential reduction, no Python in the loop); the
LSH-bucketed scale path lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from . import query

QUERY_VEC_ID = 0
TOP_K = 10


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns (exact
    evaluation order => engine-portable to the last bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def as_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


@query("x_sim_topk_bruteforce", oracle=None)  # fp fold order differs across engines
def x_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k neighbours of QUERY_VEC_ID: broadcast the query
    vector against a full scan -- the O(N) baseline every ANN variant is
    measured against."""
    t = catalog.load(spark, sf_dir)
    emb = t.embeddings.select("vec_id", as_double_array(F.col("embedding")).alias("e"))
    qvec = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("q")
    )
    scored = (
        emb.crossJoin(F.broadcast(qvec))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.round(cosine(F.col("e"), F.col("q")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(TOP_K)
