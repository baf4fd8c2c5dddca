"""Exact-arithmetic k-means (operators/clustering.py): Lloyd's invariants
plus the determinism the cross-engine oracle depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalog
from postgresql_datawarehouse_excercise_spark.operators import clustering


def test_every_vector_assigned_once(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    n_vecs = t.embeddings.count()
    out = clustering.kmeans_assignments(t.embeddings, k=8, iters=2)
    rows = out.collect()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    assert all(0 <= r.cluster < 8 for r in rows)
    assert all(r.dist2_q >= 0 for r in rows)


def test_lloyds_inertia_never_increases(spark, sf_dir):
    """Each assign/recompute round can only lower total squared distance --
    the defining monotonicity of Lloyd's.  (Quantizing centroid means to
    the integer grid perturbs by <= 0.5 ulp of 1e-6 per component, far
    below the distances involved, so the invariant must still hold.)"""
    t = catalog.load(spark, sf_dir)
    q = clustering.quantize(t.embeddings)
    cents = clustering.init_centroids(q, 8)
    a1 = clustering.assign(q, cents)
    a2 = clustering.assign(q, clustering.recompute(q, a1))
    i1 = a1.agg(F.sum("dist2")).collect()[0][0]
    i2 = a2.agg(F.sum("dist2")).collect()[0][0]
    assert i2 <= i1, (i1, i2)


def test_assignments_deterministic_across_runs(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    r1 = sorted(map(tuple, clustering.kmeans_assignments(t.embeddings).collect()))
    r2 = sorted(map(tuple, clustering.kmeans_assignments(t.embeddings).collect()))
    assert r1 == r2


def test_init_centroids_are_lowest_vec_ids(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    q = clustering.quantize(t.embeddings)
    cents = clustering.init_centroids(q, 4).collect()
    assert [c.cid for c in sorted(cents, key=lambda c: c.cid)] == [0, 1, 2, 3]
    lowest = [r.qv for r in q.orderBy("vec_id").limit(4).collect()]
    got = [c.cq for c in sorted(cents, key=lambda c: c.cid)]
    assert [list(x) for x in got] == [list(x) for x in lowest]


def test_assign_gemm_bit_identical_to_expression_assign(spark, sf_dir):
    """The large-k GEMM assignment fast path must produce the exact rows of
    the expression-based assign() -- same integer distances, same
    lowest-cid tie-break -- at several k values (the contract that lets
    semantic_dedup swap kernels without touching its oracle)."""
    t = catalog.load(spark, sf_dir)
    q = clustering.quantize(t.embeddings)
    for k in (3, 8, 17):
        cents = clustering.init_centroids(q, k)
        a = sorted(map(tuple, clustering.assign(q, cents).collect()))
        b = sorted(map(tuple, clustering.assign_gemm(q, cents).collect()))
        assert a == b, f"k={k}"


def test_semdedup_k_scales_with_corpus():
    """The gated entry's k derivation IS the production k-with-N shape the
    scale smokes measure (round-6 verdict #3): floor 8 at gate scale, then
    one cluster per 250 vectors; the DuckDB twin's GREATEST/COUNT(*) //
    derivation agrees at every size."""
    import duckdb

    from postgresql_datawarehouse_excercise_spark.operators import similarity as sim

    assert sim.semdedup_k(500) == 8        # gate (sf0.01) keeps k=8
    assert sim.semdedup_k(20_000) == 80    # 10x-of-sf0.1 smoke config
    assert sim.semdedup_k(60_000) == 240   # 30x
    assert sim.semdedup_k(200_000) == 800  # 100x
    for n in (1, 499, 500, 2000, 2001, 250 * 8, 250 * 8 + 1, 10**6):
        sql_k = duckdb.sql(
            f"SELECT GREATEST({sim.SEMDEDUP_MIN_K}, "
            f"CAST({n} // {sim.SEMDEDUP_VECS_PER_CLUSTER} AS INT))"
        ).fetchone()[0]
        assert sim.semdedup_k(n) == sql_k, n


def test_pq_assign_gemm_bit_identical_to_expression_assign(spark, sf_dir):
    """operators/pq._assign_gemm must produce the EXACT same (vec_id, m,
    cid) assignment as the expression-fold _assign on the driver data --
    the per-subspace twin of the k-means assign_gemm pin."""
    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.operators import pq
    from postgresql_datawarehouse_excercise_spark.operators.clustering import quantize

    t = catalog.load(spark, sf_dir)
    q = quantize(t.embeddings)
    subs = pq._subvectors(q)
    cb1 = pq._init_codebooks(q)
    # round-1 assignment AND the final encode off the recomputed books
    cb2 = pq._recompute(subs, pq._assign_gemm(subs, cb1))
    for cb in (cb1, cb2):
        expr = {
            (r["vec_id"], r["m"]): r["cid"] for r in pq._assign(subs, cb).collect()
        }
        gemm = {
            (r["vec_id"], r["m"]): r["cid"]
            for r in pq._assign_gemm(subs, cb).collect()
        }
        assert expr == gemm
