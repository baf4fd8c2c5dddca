"""Large-star/small-star connected components (operators/dedup.py
dedup_clusters_bigstar) vs a sequential union-find and vs min-label
propagation.

The decisive case: a duplicate CHAIN of 41 docs (diameter 40).  Label
propagation moves the min one hop per round, so its 15-round default
cannot converge; the star contraction collapses the whole path in a
handful of rounds (Kiveris et al., SoCC 2014, converges in O(log^2 n)).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark.operators import dedup


def _truth(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    out: dict[int, int] = {}
    for members in comps.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = dedup.dedup_clusters_bigstar(df).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in rows}
    # keep flag marks exactly the per-cluster minimum
    keeps = {r["doc_id"] for r in rows if r["keep"]}
    assert keeps == set(got.values())
    return got


def test_bigstar_random_graph_matches_union_find(spark):
    random.seed(7)
    edges = [(random.randint(0, 59), random.randint(0, 59)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _truth(edges)


def test_bigstar_long_chain_where_label_propagation_stalls(spark):
    # path 100-101-...-140: diameter 40 > dedup_clusters' 15-round default
    edges = [(100 + i, 101 + i) for i in range(40)]
    truth = _truth(edges)
    assert _run(spark, edges) == truth
    stalled = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(
            spark.createDataFrame(edges, "doc_a long, doc_b long")
        ).collect()
    }
    assert stalled != truth  # the documented label-propagation caveat


def test_bigstar_mixed_shapes(spark):
    # two cliques bridged by one edge + an isolated pair + a star
    clique1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique2 = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    edges = clique1 + clique2 + [(4, 10), (200, 201)] + [(300, 301 + k) for k in range(6)]
    assert _run(spark, edges) == _truth(edges)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_bigstar_property_random(spark, seed):
    random.seed(seed)
    n = random.randint(10, 80)
    m = random.randint(5, 2 * n)
    edges = [(random.randint(0, n), random.randint(0, n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    assert _run(spark, edges) == _truth(edges)


def test_triangle_contraction_matches_bruteforce(spark, sf_dir):
    """The cohort-contracted triangle count equals a pure-Python wedge
    count on the EXPANDED strong-pair graph, exercised with real cohorts:
    documents multiplied 10x (exact copies; past CONTRACT_MIN_COHORT so
    the CONTRACTED path runs) and every closed-form term non-trivial.
    The direct path is exercised by the gate corpora (max cohort 2)."""
    from itertools import combinations

    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.operators import dedup
    from postgresql_datawarehouse_excercise_spark.queries.x_dedup import dedup_triangles

    docs = (
        catalog.load(spark, sf_dir)
        .documents.select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)  # 100 base docs keep brute force cheap
    )
    k = 10
    assert k >= dedup.CONTRACT_MIN_COHORT
    multi = docs
    for i in range(1, k):
        multi = multi.union(
            docs.select((F.col("doc_id") + 1_000_000_000 * i).alias("doc_id"), "text")
        )

    got = {
        r.doc_id: (r.degree, r.n_triangles)
        for r in dedup_triangles(multi).collect()
    }

    strong = (
        dedup.minhash_lsh_pairs(multi)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in strong:
        adj.setdefault(r.doc_a, set()).add(r.doc_b)
        adj.setdefault(r.doc_b, set()).add(r.doc_a)
    want = {}
    for v, nb in adj.items():
        if len(nb) < 2:
            continue
        t = sum(1 for a, b in combinations(sorted(nb), 2) if b in adj.get(a, ()))
        want[v] = (len(nb), t)
    assert got == want


def test_cc_bigstar_contracted_matches_expanded(spark, sf_dir):
    """The cohort-contracted bigstar CC equals label propagation run on the
    fully EXPANDED pair relation, on 10x-multiplied docs (past
    CONTRACT_MIN_COHORT so the contracted path runs)."""
    from postgresql_datawarehouse_excercise_spark import catalog

    docs = (
        catalog.load(spark, sf_dir)
        .documents.select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)
    )
    k = 10
    assert k >= dedup.CONTRACT_MIN_COHORT
    multi = docs
    for i in range(1, k):
        multi = multi.union(
            docs.select((F.col("doc_id") + 1_000_000_000 * i).alias("doc_id"), "text")
        )
    got = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in dedup.dedup_clusters_bigstar_contracted(multi).collect()
    }
    pairs = dedup.minhash_lsh_pairs(multi).filter(
        F.col("jaccard") >= dedup.DEDUP_CLUSTER_MIN_JACCARD
    )
    want = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in dedup.dedup_clusters(pairs, max_iterations=40).collect()
    }
    assert got == want


def test_kcore_contracted_matches_direct(spark, sf_dir):
    """Weighted cohort peeling equals per-node peeling on the fully
    expanded strong-pair graph (10x copies => the contracted path runs)."""
    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.queries.x_dedup import (
        _kcore_direct,
        dedup_kcore,
    )

    docs = (
        catalog.load(spark, sf_dir)
        .documents.select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)
    )
    k = 10
    assert k >= dedup.CONTRACT_MIN_COHORT
    multi = docs
    for i in range(1, k):
        multi = multi.union(
            docs.select((F.col("doc_id") + 1_000_000_000 * i).alias("doc_id"), "text")
        )
    got = {
        (r.doc_id, r.degree_full, r.degree_core)
        for r in dedup_kcore(multi).collect()
    }
    strong = dedup.minhash_lsh_pairs(multi).filter(F.col("jaccard") >= 0.5).select(
        "doc_a", "doc_b"
    )
    want = {
        (r.doc_id, r.degree_full, r.degree_core)
        for r in _kcore_direct(strong).collect()
    }
    assert got == want


def test_pagerank_contracted_matches_direct(spark, sf_dir):
    """Cohort-contracted power iteration equals the direct per-node
    iteration on the fully expanded strong-pair graph, bit-for-bit (all
    integer arithmetic), on 10x-multiplied docs (past CONTRACT_MIN_COHORT
    so the contracted path runs; the gate corpora exercise direct)."""
    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.queries.x_dedup import (
        _pagerank_direct,
        pagerank,
    )

    docs = (
        catalog.load(spark, sf_dir)
        .documents.select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)
    )
    k = 10
    assert k >= dedup.CONTRACT_MIN_COHORT
    multi = docs
    for i in range(1, k):
        multi = multi.union(
            docs.select((F.col("doc_id") + 1_000_000_000 * i).alias("doc_id"), "text")
        )
    got = {(r.doc_id, r.rank, r.degree) for r in pagerank(multi).collect()}
    want = {(r.doc_id, r.rank, r.degree) for r in _pagerank_direct(multi).collect()}
    assert got == want


def test_winnow_pairs_contracted_matches_direct(spark, sf_dir):
    """Cohort-contracted winnowing pair join equals the direct posting
    self-join on 10x-multiplied docs, including the weighted-DF cutoff
    (the expanded per-member document frequency)."""
    from postgresql_datawarehouse_excercise_spark import catalog

    docs = (
        catalog.load(spark, sf_dir)
        .documents.select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)
    )
    k = 10
    assert k >= dedup.CONTRACT_MIN_COHORT
    multi = docs
    for i in range(1, k):
        multi = multi.union(
            docs.select((F.col("doc_id") + 1_000_000_000 * i).alias("doc_id"), "text")
        )
    got = {
        (r.doc_a, r.doc_b, r.shared_fp, r.fp_a, r.fp_b, r.overlap)
        for r in dedup.winnow_overlap_pairs(multi).collect()
    }
    # force the direct arm on the same expanded input
    import postgresql_datawarehouse_excercise_spark.operators.dedup as dd

    orig = dd.max_cohort_size
    dd.max_cohort_size = lambda _df: 1
    try:
        want = {
            (r.doc_a, r.doc_b, r.shared_fp, r.fp_a, r.fp_b, r.overlap)
            for r in dedup.winnow_overlap_pairs(multi).collect()
        }
    finally:
        dd.max_cohort_size = orig
    assert got == want
