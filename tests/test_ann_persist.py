"""Persisted IVF-PQ index: the reloaded-index serving path must reproduce
the in-plan x_sim_ann_ivfpq lane row-for-row (exact BIGINT index relations,
lossless parquet round-trip)."""

from __future__ import annotations

from postgresql_datawarehouse_excercise_spark.operators import pq
from postgresql_datawarehouse_excercise_spark.queries.x_similarity import (
    x_sim_ann_index_persist,
)
from postgresql_datawarehouse_excercise_spark import catalog

SF = "/root/testdata/sf0.001"


def test_persist_reload_bit_identical_to_in_plan(spark):
    t = catalog.load(spark, SF)
    direct = sorted(map(tuple, pq.ivfpq_topk(t.embeddings).collect()))
    persisted = sorted(map(tuple, x_sim_ann_index_persist(spark, SF).collect()))
    assert len(direct) > 0
    assert persisted == direct


def test_persisted_index_recall_floor(spark):
    """The reload path keeps the x_sim_ann_ivfpq recall contract: with
    results bit-identical to the in-plan lane (test above), the pinned
    IVFPQ floor applies transitively; here we only re-check the shape --
    every query returns exactly PQ_TOPK ranked rows with distinct ranks."""
    rows = x_sim_ann_index_persist(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == pq.PQ_QUERIES
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, pq.PQ_TOPK + 1)), q
