"""Recall floors for the PQ / IVFPQ indexes (operators/pq.py).

Round-9 verdict #1: the round-8 exit criterion was "recall@10 >= 0.8,
test-pinned".  The rework that got there (PQ_K=64 codewords, PQ_ROUNDS=2
Lloyd rounds, PQ_REFINE=200 exact re-rank) was measured at 1.0 (PQ) /
0.8-1.0 (IVFPQ) per query but only NOTES said so -- a codebook or refine
regression would have sailed through the value-hash gate, because the
oracle replays whatever the engine computes.  These tests pin the floors
the same way tests/test_ivf.py:60 pins the IVF index, so index-quality
regressions fail loudly instead of shipping green.
"""

from __future__ import annotations

from postgresql_datawarehouse_excercise_spark import catalog
from postgresql_datawarehouse_excercise_spark.operators import pq


def test_pq_recall_floor(spark, sf_dir):
    """ADC + exact-refine recall@10 >= 0.9 on every evaluation query (the
    measured value is 1.0; 0.9 leaves headroom for corpus regeneration, not
    for algorithm regressions -- dropping the refine or shrinking the
    codebooks lands well below it)."""
    t = catalog.load(spark, sf_dir)
    rows = pq.pq_recall(t.embeddings).collect()
    assert len(rows) == pq.PQ_QUERIES
    assert all(r.recall >= 0.9 for r in rows), sorted(r.recall for r in rows)


def test_ivfpq_recall_floor(spark, sf_dir):
    """Composed IVF x PQ recall@10 >= 0.8 on every evaluation query (cell
    pruning adds loss on top of code distortion, hence the lower floor --
    the same 0.8 the plain-IVF gate pins)."""
    t = catalog.load(spark, sf_dir)
    rows = pq.ivfpq_recall(t.embeddings).collect()
    assert len(rows) == pq.PQ_QUERIES
    assert all(r.recall >= 0.8 for r in rows), sorted(r.recall for r in rows)


def test_mrl_frontloaded_population_beats_uniform(spark, sf_dir):
    """The MRL evaluator's two populations must show the spread MRL
    training creates: on the front-loaded (power-of-two energy decay)
    twin the prefix ranking recalls strictly more than on the raw
    uniform-energy corpus, for the query-set average."""
    from postgresql_datawarehouse_excercise_spark.operators import similarity

    t = catalog.load(spark, sf_dir)
    rows = similarity.mrl_recall_populations(t.embeddings).collect()
    by_pop = {}
    for r in rows:
        by_pop.setdefault(r.population, []).append(r.recall)
    assert set(by_pop) == {"uniform", "frontloaded"}
    uni = sum(by_pop["uniform"]) / len(by_pop["uniform"])
    fl = sum(by_pop["frontloaded"]) / len(by_pop["frontloaded"])
    assert fl > uni + 0.2, (uni, fl)


def test_jl_projection_oblivious_to_energy_profile(spark, sf_dir):
    """The JL evaluator's claim, pinned: on the BACK-loaded population the
    16-dim prefix arm ranks by dims carrying none of the full ranking's
    signal (recall ~ random), while the dense +/-1 JL mix at the same
    width keeps its level -- the query-set means must separate clearly."""
    from postgresql_datawarehouse_excercise_spark.operators import similarity

    t = catalog.load(spark, sf_dir)
    rows = similarity.jl_recall_populations(t.embeddings).collect()
    by = {}
    for r in rows:
        by.setdefault((r.population, r.method), []).append(r.recall)
    assert set(p for p, _ in by) == {"uniform", "backloaded"}
    mean = {k: sum(v) / len(v) for k, v in by.items()}
    assert mean[("backloaded", "jl16")] > mean[("backloaded", "prefix16")] + 0.1, mean
    # prefix on backloaded is near-random; jl holds a real level
    assert mean[("backloaded", "prefix16")] <= 0.15, mean
    assert mean[("backloaded", "jl16")] >= 0.15, mean
