"""Extension: training-data pipeline utilities (sampling, profiling, CDC).

Three operator families a 100 TB corpus pipeline needs around the core
dedup/similarity/text stack:

  * deterministic stratified sampling -- per-stratum rates keyed on a
    content-independent id hash (reproducible under task retries and across
    engines, unlike rand()-based sampleBy);
  * table profiling -- per-column null/distinct statistics in one scan (the
    ANALYZE/data-quality primitive; drives skew and join planning decisions);
  * CDC upsert -- key-based merge of a change batch into a base table
    without Delta (anti-join + union), the incremental-refresh primitive.

Scale design: the sample is a pure per-row filter (no shuffle); the profiler
is ONE full scan with all statistics computed in a single aggregate (not a
per-column loop over the table); the upsert shuffles each side once on the
merge key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..functions import dec, money, sql_dec, sql_money
from . import query

# per-language sampling rates (percent): heavier on the head language
SAMPLE_RATES = {"en": 50, "de": 20, "fr": 20, "es": 20, "zh": 20}
_DEFAULT_RATE = 10


def _bucket(col: F.Column) -> F.Column:
    """Deterministic 0..99 bucket from the md5 prefix -- identical in any
    engine (operators/dedup.py h32 recipe)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long") % 100


@query(
    "x_pipeline_stratified_sample",
    oracle=f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      < CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items())}
             ELSE {_DEFAULT_RATE} END
""",
)
def x_pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sample with per-language rates, keyed on the id
    hash: a pure filter (no shuffle, no state), so the same rows survive on
    any cluster, any partitioning, any retry -- the property rand()-based
    `sampleBy` cannot give."""
    t = catalog.load(spark, sf_dir)
    rate = F.lit(_DEFAULT_RATE)
    for k, v in reversed(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return t.documents.filter(_bucket(F.col("doc_id")) < rate).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority")


@query(
    "x_pipeline_profile_columns",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,"
        f" COUNT(*) - COUNT({c}) AS n_nulls,"
        f" COUNT(DISTINCT {c}) AS n_distinct FROM orders"
        for c in _PROFILE_COLS
    ),
)
def x_pipeline_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (rows / nulls / distinct) of `orders` in ONE scan:
    all per-column statistics are expressions of a single aggregate, then the
    1-row result unpivots to the long shape.  The naive per-column loop would
    scan the table N times; this is the ANALYZE-TABLE primitive (SURVEY.md
    section 2 A9) as a query."""
    t = catalog.load(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    one = t.orders.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS)
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


@query(
    "x_pipeline_upsert_orders",
    oracle=f"""
WITH changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
),
merged AS (
  SELECT * FROM changes
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       {sql_money(f"SUM({sql_dec('o_totalprice')})")} AS total_price
FROM merged GROUP BY o_orderstatus
""",
)
def x_pipeline_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert without Delta: change batch (here: every 7th order key,
    repriced) replaces matching base rows via left-anti join + union, then a
    per-status aggregate proves the merge content.  Both sides shuffle once
    on the merge key; at 100 TB the anti join is the same exchange a MERGE
    INTO would plan."""
    t = catalog.load(spark, sf_dir)
    changes = t.orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    kept = t.orders.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = changes.unionByName(kept)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum(dec("o_totalprice"))).alias("total_price"),
    )


@query(
    "x_pipeline_quality_gate",
    oracle=r"""
WITH scored AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
         CAST(length(text) AS BIGINT) AS n_chars,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
  FROM documents WHERE lang = 'en'
), kept AS (
  SELECT * FROM scored WHERE n_tokens >= 20 AND n_punct * 20 <= n_chars
), canonical AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp
)
SELECT source, COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
FROM kept JOIN canonical USING (doc_id)
GROUP BY source ORDER BY source
""",
)
def x_pipeline_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-cleaning gate: language filter -> quality
    thresholds (min length, max punctuation density as the exact integer
    test n_punct * 20 <= n_chars -- no double ratios) -> exact near-dup
    collapse on the normalized fingerprint (keep lowest doc_id) -> per-source
    survival report.  One scan computes every signal; the only shuffles are
    the fingerprint group and the tiny per-source aggregate -- the shape of
    a full training-data cleaning pass at 100 TB."""
    t = catalog.load(spark, sf_dir)
    scored = t.documents.filter(F.col("lang") == "en").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("long").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[.,;:!?]")).cast("long").alias("n_punct"),
        F.length("text").cast("long").alias("n_chars"),
        F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))).alias("fp"),
    )
    from pyspark.sql import Window

    kept = scored.filter(
        (F.col("n_tokens") >= 20) & (F.col("n_punct") * 20 <= F.col("n_chars"))
    )
    # keep-lowest-doc_id dedup as a window min over the fingerprint
    # partitioning: ONE scan of documents and one shuffle (the join-back
    # formulation scans and shuffles twice for the same result)
    min_doc = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        kept.withColumn("min_doc", min_doc)
        .filter(F.col("doc_id") == F.col("min_doc"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


@query(
    "x_pipeline_salted_hot_keys",
    oracle="""
SELECT event_type,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
""",
)
def x_pipeline_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: events has ~5 hot group keys, the exact
    shape where one reducer per key becomes the straggler at 100 TB.
    salted_sum (operators/skew.py) pre-aggregates on (key, deterministic
    xxhash64 salt) so each hot key fans out over 16 reducers, then combines
    partials -- bit-identical to the plain GROUP BY because the measure is
    exact decimal (the oracle IS the unsalted form)."""
    from ..operators.skew import salted_sum

    t = catalog.load(spark, sf_dir)
    out = salted_sum(t.events, ["event_type"], dec("value"), "total")
    return out.select("event_type", money(F.col("total")).alias("total_value"))
