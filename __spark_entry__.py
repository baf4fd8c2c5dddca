"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``postgresql_datawarehouse_excercise_spark``; this module
just adapts the query registry to the driver's shape.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from postgresql_datawarehouse_excercise_spark.queries import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# A couple of cheap, known-green entries stay at the very front of queries()
# as stability sentinels (a regression there flags an engine-wide problem
# immediately, before any budget is spent on the long tail).
_SENTINELS = ("q1_time_dim", "q2_avg_transaction")

# Entries whose IMPLEMENTATION changed this round (verified green locally
# against DuckDB, but the driver's own gate should confirm before their next
# natural rotation): fronted right after any known-red entries.
_TOUCHED_THIS_ROUND = (
    # round 6: SF-scaling broadcast de-hinting (customer/part/supplier sides)
    "x_tpch_q2_min_cost_supplier",
    "x_tpch_q3_shipping_priority",
    "x_tpch_q5_local_supplier",
    "x_tpch_q7_volume_shipping",
    "x_tpch_q8_market_share",
    "x_tpch_q9_product_profit",
    "x_tpch_q10_returned_items",
    "x_tpch_q11_important_parts",
    "x_tpch_q14_promo_revenue",
    "x_tpch_q15_top_supplier",
    "x_tpch_q16_supplier_part_counts",
    "x_tpch_q17_small_quantity",
    "x_tpch_q18_large_orders",
    "x_tpch_q19_disjunctive_bands",
    "x_tpch_q20_dominant_suppliers",
    "x_tpch_q21_late_sole_supplier",
    # de-hinted sales-fact ETL + reference family derived from it
    "q1_sales_fact",
    "q3a_best_buyers",
    "q3b_amount_per_order",
    "q4a_best_buyers_raw",
    "q4b_top_country_raw",
    "q4_view1",
    "q4_view2",
    "q4_view3",
    "q5a_window_report",
    "x_events_segment_hourly",
    # k-means IVF ANN (recall 0.0-0.4 -> 0.89) + limit-bounded query sides
    "x_sim_semantic_dedup",         # new: SemDeDup-style embedding dedup
    "x_sim_pca_power",              # new: int-exact covariance + power iter
    "x_dedup_incremental",          # new: batch-vs-corpus ingest dedup
    "x_pipeline_scd2_pointintime",  # new: as-of fact join on SCD2 history
    "x_sql_recursive_cte",          # new: WITH RECURSIVE hierarchy walk
    "x_source_python_datasource",   # new: Spark 4 Python DataSource API
    "x_sql_variant_json",           # new: VARIANT parse_json/variant_get
    "x_text_udtf_runs",             # new: Arrow UDTF token run-lengths
    "x_events_interpolate",         # new: linear interpolation on the grid
    "x_sim_ann_ivf",
    "x_sim_ann_recall",
    "x_sim_ann_lsh",
    "x_sim_topk_bruteforce",
    "x_sim_knn_join",
    # expression-measure / COUNT(DISTINCT) / join-text SQL rewrite +
    # AVG headroom guard + catalog ANALYZE
    "x_mv_sql_rewrite_expr",
    "x_mv_sql_rewrite_distinct",
    "x_mv_sql_rewrite_join",
    "x_mv_sql_rewrite",
    "x_mv_sql_rewrite_multi",
    "x_stream_incremental_mv",      # 2 micro-batches
    # merge duplicate-check reserved alias; bloom tree-OR fold
    "x_mutation_merge_upsert",
    "x_pipeline_decontaminate_bloom",
)

# Family priority for never-verified entries (the driver's correctness budget
# runs the dict in order; the LLM-pipeline families are graded first-class, so
# they go before the SQL-surface and TPC-H-shape extensions).
_FAMILY_ORDER = (
    "x_media_", "x_text_", "x_sim_", "x_pipeline_", "x_events_",
    "x_asof", "x_range", "x_dedup_", "x_sql_", "x_tpch_",
    "q1_", "q2_", "q3", "q4", "q5",
)


def _family_rank(name: str) -> int:
    for i, prefix in enumerate(_FAMILY_ORDER):
        if name.startswith(prefix):
            return i
    return len(_FAMILY_ORDER)


def _verified_counts() -> dict[str, int]:
    """How many committed CORRECTNESS_r*.json rounds verified each entry green.

    The driver checks a bounded prefix of ``queries()`` per round; sorting by
    ascending verified-count rotates that window across rounds so every entry
    eventually gets a hard correctness row.
    """
    counts: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and not row.get("err")
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            ):
                counts[name] = counts.get(name, 0) + 1
    return counts


def _erred_last_round() -> set[str]:
    """Entries whose row in the LATEST committed correctness round erred or
    mismatched.  These carry a known-red signal, so after a fix they need a
    green row more urgently than anything merely unrotated -- front them."""
    paths = sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        return set()
    try:
        with open(paths[-1]) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return set()
    return {
        name
        for name, row in data.items()
        if isinstance(row, dict)
        and (
            row.get("err")
            or not row.get("rows_match")
            or not row.get("schema_match", True)
            or not row.get("hash_match", True)
        )
    }


def _ordered_names() -> list[str]:
    registry = load_all()
    counts = _verified_counts()
    erred = _erred_last_round()

    def key(name: str):
        sentinel = 0 if name in _SENTINELS else 1
        touched = 0 if name in _TOUCHED_THIS_ROUND else 1
        return (
            sentinel,
            0 if name in erred else 1,
            touched,
            counts.get(name, 0),
            _family_rank(name),
            name,
        )

    return sorted(registry, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (best buyers -- scan, joins, agg, top-k) on sf0.001."""
    registry = load_all()
    return registry["q3a_best_buyers"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2.

    Ordered never-verified-first (see _verified_counts) so the driver's
    per-round correctness budget lands on entries without a hard signal yet.
    """
    registry = load_all()
    return {name: registry[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query (same order)."""
    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _ordered_names()
        if registry[name].oracle
    }
