"""Extension: multimodal binary-column pipeline (operators/multimodal.py).

The decode itself is a deterministic md5-derived fake (no image libs in the
container; `decode_media_real` is the marked swap point), but the Spark
plumbing under test is real: Arrow-batched mapInPandas (1->1 and 1->N) and a
vectorized pandas_udf over a binary column — with full DuckDB value-hash
oracles reproducing the md5 arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from ..operators import multimodal
from . import query


@query("x_media_metadata", oracle=multimodal.extract_metadata_sql())
def x_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->1 metadata extract over the opaque binary payload via mapInPandas
    (n_bytes + fake-decoded width/height/n_frames)."""
    t = catalog.load(spark, sf_dir)
    return multimodal.extract_metadata(multimodal.media_from_documents(t.documents))


@query("x_media_frames", oracle=multimodal.sample_frames_sql())
def x_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N frame sampling via mapInPandas: each media row explodes into
    n_frames rows with deterministic per-frame hashes."""
    t = catalog.load(spark, sf_dir)
    return multimodal.sample_frames(multimodal.media_from_documents(t.documents))


@query("x_media_features", oracle=multimodal.media_features_sql())
def x_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas_udf feature extraction -> array<double> embedding
    column (Arrow batch transfer; md5-derived stand-in features), serialized
    to a fixed-format csv string for the driver comparator (array cells are
    unhashable in its pandas sort path; same fix as x_sql_collect_agg)."""
    t = catalog.load(spark, sf_dir)
    return multimodal.media_features_serialized(
        multimodal.media_from_documents(t.documents)
    )


@query("x_media_binary_dedup", oracle=multimodal.binary_dedup_sql())
def x_media_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the opaque BINARY media column (md5 of the payload
    bytes, JVM-side, zero decode): identical re-crawled media collapse
    before any decoder runs -- the multimodal twin of x_dedup_exact
    (operators/multimodal.py binary_dedup)."""
    t = catalog.load(spark, sf_dir)
    return multimodal.binary_dedup(multimodal.media_from_documents(t.documents))
