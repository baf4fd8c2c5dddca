"""Language identification by stopword-profile scoring (n-gram heuristic).

Pure JVM expressions: one regexp_count per language profile, argmax with a
fixed tie-break order.  The same regex counts run in DuckDB (RE2 and Java
regex agree on `\\b(word|word)\\b` token matching), so the query carries a
full value-hash oracle.

At 100 TB this is a narrow per-row map over one string column — fully
pipelined inside whole-stage codegen, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Profiles are matched against lower-cased text.  Order fixes the tie-break.
PROFILES: dict[str, str] = {
    "en": r"\b(the|of|and|to|in|is|that|it|was|for)\b",
    "es": r"\b(el|la|de|que|y|en|los|del|las|por)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein|mit|von|zu)\b",
    "fr": r"\b(le|la|les|de|et|un|une|est|pour|dans)\b",
}
UNKNOWN = "und"


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.regexp_count(low, F.lit(pattern)).cast("long")
        for lang, pattern in PROFILES.items()
    }


def lang_id_df(documents: DataFrame) -> DataFrame:
    """doc_id, per-language stopword hit counts, argmax prediction."""
    scores = lang_scores(F.col("text"))
    langs = list(PROFILES)
    # argmax = first profile (in PROFILES order) whose score equals the max,
    # provided the max is positive; all-zero => "und".
    mx = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit(UNKNOWN)
    for lang in reversed(langs):
        pred = F.when((mx > 0) & (scores[lang] == mx), F.lit(lang)).otherwise(pred)
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
        F.col("lang").alias("label_lang"),
    )


def lang_id_sql() -> str:
    score_exprs = ",\n       ".join(
        f"CAST(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT) AS score_{lang}"
        for lang, pat in PROFILES.items()
    )
    langs = list(PROFILES)
    mx = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = f"'{UNKNOWN}'"
    for lang in reversed(langs):
        pred = f"CASE WHEN {mx} > 0 AND score_{lang} = {mx} THEN '{lang}' ELSE {pred} END"
    return f"""
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       {score_exprs}
  FROM documents
)
SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)},
       {pred} AS pred_lang,
       lang AS label_lang
FROM s
"""
