"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio libraries, so the *decode* step is stubbed
(`decode_media_real` raises unless PIL is importable), but everything Spark
cares about is real and tested:

  * the media schema (binary content + typed metadata columns),
  * Arrow-batched `mapInPandas` over binary columns (1->1 metadata extract
    and 1->N frame sampling),
  * a vectorized `pandas_udf` feature extractor returning array<double>,
  * partitioning notes: binary payloads stay columnar in Parquet; the
    metadata extract is a narrow map (no shuffle); frame sampling multiplies
    rows, so it runs AFTER any filter pushdown.

The deterministic fake decode derives every "decoded" property from md5 of
the payload, which makes the whole pipeline reproducible in DuckDB — these
queries carry full value-hash oracles even though they run through real
Python worker plumbing (schema fidelity + batch iteration are what is being
verified).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8
MAX_FRAMES = 5

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("content", BinaryType(), False),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_frames", LongType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("frame_hash", StringType(), False),
    ]
)


def decode_media_real(content: bytes) -> dict:
    """Real decoder — requires an image library the container doesn't ship.
    Kept as the single swap point for production use."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "media decoding requires an image library (PIL); "
            "use the deterministic fake decode in tests"
        ) from exc
    raise NotImplementedError("wire a real decoder here when the lib exists")


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: md5-derived (width, height, n_frames)."""
    h = hashlib.md5(content).hexdigest()
    width = int(h[:4], 16) % 1920 + 1
    height = int(h[4:8], 16) % 1080 + 1
    n_frames = int(h[8:10], 16) % MAX_FRAMES + 1
    return width, height, n_frames


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt `documents` into the media shape: utf-8 payload as the opaque
    binary column, media_type cycled from the source id."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """1->1 Arrow-batched metadata extraction over the binary column."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(extract, META_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """1->N frame sampling: each media row yields n_frames rows with a
    deterministic per-frame hash (md5(payload_md5 + ':' + frame_no))."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_no, out_hash = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                h = hashlib.md5(payload).hexdigest()
                n = int(h[8:10], 16) % MAX_FRAMES + 1
                for i in range(n):
                    out_doc.append(doc_id)
                    out_no.append(i)
                    out_hash.append(
                        hashlib.md5(f"{h}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_no": out_no, "frame_hash": out_hash}
            )

    return media.mapInPandas(frames, FRAME_SCHEMA)


@F.pandas_udf(ArrayType(DoubleType()))
def feature_vector(content: pd.Series) -> pd.Series:
    """Vectorized feature extraction: FEATURE_DIM doubles from md5 byte pairs
    (the stand-in for a real CNN/audio embedding; Arrow batch transfer and
    array<double> output shape are the real, tested parts)."""

    def feats(payload) -> list[float]:
        h = hashlib.md5(bytes(payload)).hexdigest()
        return [
            round(int(h[2 * i : 2 * i + 2], 16) / 255.0, 4)
            for i in range(FEATURE_DIM)
        ]

    return content.map(feats)


def media_features(media: DataFrame) -> DataFrame:
    return media.select(
        "doc_id", "media_type", feature_vector(F.col("content")).alias("features")
    )


def media_features_serialized(media: DataFrame) -> DataFrame:
    """media_features with the array<double> embedding serialized to a
    fixed-format csv string (%.4f per element).  The driver's comparator
    sorts pandas frames column-wise and list cells are unhashable, so the
    registry entry exposes this form; the array form (media_features) is the
    pipeline-facing API."""
    return media_features(media).select(
        "doc_id",
        "media_type",
        F.array_join(
            F.transform("features", lambda v: F.format_string("%.4f", v)), ","
        ).alias("features_csv"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (md5 arithmetic over the utf-8 payload = md5(text))
# ---------------------------------------------------------------------------

_SQL_MEDIA = """
media AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
         text
  FROM documents
)
"""


def extract_metadata_sql() -> str:
    return f"""
WITH {_SQL_MEDIA}
SELECT doc_id, media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1 AS BIGINT) AS width,
       CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1 AS BIGINT) AS height,
       CAST(CAST(concat('0x', substr(md5(text), 9, 2)) AS BIGINT) % {MAX_FRAMES} + 1 AS BIGINT) AS n_frames
FROM media
"""


def sample_frames_sql() -> str:
    return f"""
WITH {_SQL_MEDIA},
m AS (
  SELECT doc_id, md5(text) AS h,
         CAST(concat('0x', substr(md5(text), 9, 2)) AS BIGINT) % {MAX_FRAMES} + 1 AS n
  FROM media
)
SELECT doc_id, CAST(i AS BIGINT) AS frame_no, md5(h || ':' || CAST(i AS VARCHAR)) AS frame_hash
FROM m, range(0, 100) r(i)
WHERE i < n
"""


def media_features_sql() -> str:
    feats = ", ".join(
        f"printf('%.4f', ROUND(CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) AS BIGINT) / 255.0, 4))"
        for i in range(FEATURE_DIM)
    )
    return f"""
WITH {_SQL_MEDIA}
SELECT doc_id, media_type, array_to_string([{feats}], ',') AS features_csv
FROM media
"""


def binary_dedup(media: DataFrame) -> DataFrame:
    """Exact binary dedup over the opaque content column: md5 the PAYLOAD
    BYTES (F.md5 accepts binary directly -- no decode, no Python), keep the
    lowest doc_id per (hash, media_type).  The first curation step of any
    multimodal pipeline: identical images/audio re-crawled under different
    ids collapse before any expensive decode runs.  Map-side partial
    aggregation collapses duplicates before the shuffle, so network volume
    is O(distinct payloads) -- the x_dedup_exact shape on bytes.

    The oracle hashes the source TEXT: the media adapter's payload is
    encode(text, 'UTF-8'), so md5(bytes) == md5(string) by construction
    (DuckDB's md5 is VARCHAR-only), while the Spark side exercises the real
    binary-column path."""
    return (
        media.groupBy(
            F.md5(F.col("content")).alias("content_hash"), "media_type"
        )
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.length("content")).cast("long").alias("n_bytes"),
        )
    )


def binary_dedup_sql() -> str:
    return f"""
WITH {_SQL_MEDIA}
SELECT md5(text) AS content_hash, media_type,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       COUNT(*) AS n_copies,
       CAST(MIN(strlen(text)) AS BIGINT) AS n_bytes
FROM media GROUP BY 1, 2
"""
