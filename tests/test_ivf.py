"""N-scaled IVF index configuration (operators/similarity.py).

Round-6 verdict: a fixed 16-cell / nprobe-4 index re-ranks a constant 25%
of the corpus per query — an exact scan over 25 TB at the 100 TB target.
The configuration now derives from the corpus size (cells ~ sqrt(N),
nprobe ~ N^(1/4)); these tests pin the three contracts that make it safe:
the derivation matches the SQL oracle's re-derivation exactly, recall@10
stays >= 0.8 on every gate query, and the candidate rows actually probed
grow strictly sublinearly in N (measured from executed-plan actuals, not
estimated).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalog, plans
from postgresql_datawarehouse_excercise_spark.operators import similarity as sim


def test_ivf_config_formula_matches_sql_derivation():
    """ivf_cells/ivf_nprobe must equal the oracle's GREATEST/FLOOR(SQRT(...))
    re-derivation for any corpus size, INCLUDING perfect squares (the only
    place FLOOR over IEEE sqrt could plausibly diverge from isqrt)."""
    ns = list(range(1, 2000)) + [22**2, 447**2, 10**6, 10**6 + 1, 31623**2, 10**9]
    rows = duckdb.sql(
        f"""
        SELECT n,
               GREATEST({sim.IVF_MIN_CELLS},
                        CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS INT)) AS cells
        FROM (SELECT UNNEST({ns}) AS n)
        """
    ).fetchall()
    for n, sql_cells in rows:
        assert sim.ivf_cells(n) == sql_cells, n
        assert sim.ivf_nprobe(sql_cells) == max(
            sim.IVF_MIN_NPROBE,
            duckdb.sql(
                f"SELECT CAST(FLOOR(SQRT(CAST({sql_cells} AS DOUBLE))) AS INT)"
            ).fetchone()[0],
        ), n


def test_ivf_config_scales_with_n():
    """Cells grow as sqrt(N); the candidate FRACTION nprobe/cells shrinks
    monotonically past the floor — the property the fixed config lacked."""
    assert sim.ivf_cells(500) == 22
    assert sim.ivf_nprobe(22) == 5
    prev_frac = 1.0
    for n in (500, 5_000, 50_000, 500_000, 5_000_000, 10**9):
        cells = sim.ivf_cells(n)
        frac = sim.ivf_nprobe(cells) / cells
        assert frac <= prev_frac, n
        prev_frac = frac
    # at a 100 TB-class corpus the probed fraction is well under 1%
    assert prev_frac < 0.01


def test_ivf_recall_at_gate(spark, sf_dir):
    """Every evaluation query's recall@10 >= 0.8 at the derived gate
    configuration (N=500 -> 22 cells / 5 probes)."""
    t = catalog.load(spark, sf_dir)
    rows = sim.ann_recall(t.embeddings).collect()
    assert len(rows) == sim.KNN_QUERIES
    assert all(r.recall >= 0.8 for r in rows), sorted(r.recall for r in rows)


def _multiplied(emb, k: int):
    """k re-keyed copies (copy i shifts vec_id by i*10^9), so vec_id 0 —
    the query — still exists exactly once."""
    return (
        emb.withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(
            "vec_id",
            F.col("vec_id").cast("long") + F.col("copy").cast("long") * F.lit(10**9),
        )
        .drop("copy")
    )


def _candidate_rows(df) -> int:
    """Executed-plan actuals of the cell-key BroadcastHashJoin — the rows
    the index actually re-ranks for the query (verdict r6: assert
    candidates from actuals, not from the formula).  The plan carries two
    hash joins: the payload attach on vec_id (outputs the whole corpus)
    and the qcells probe on cell (outputs the candidate set, always the
    smaller: nprobe < cells)."""
    rows = plans.actual_output_rows(df, "BroadcastHashJoin")
    assert len(rows) == 2, rows
    return min(rows)


def test_ivf_candidates_sublinear_in_n(spark, sf_dir):
    """Candidate rows = o(N): growing the corpus 8x must grow the probed
    candidate set far less than 8x (expected ~3.9x: fraction 22.7% -> 11.1%
    as cells 22 -> 63, nprobe 5 -> 7)."""
    t = catalog.load(spark, sf_dir)
    c1 = _candidate_rows(sim.ann_ivf_topk(t.embeddings, 0))
    c8 = _candidate_rows(sim.ann_ivf_topk(_multiplied(t.embeddings, 8), 0))
    n = t.embeddings.count()
    # sanity: candidates are a minority of the corpus at both scales
    assert 0 < c1 < n
    assert 0 < c8 < 8 * n
    # the o(N) assertion: an 8x corpus probes < 0.62 * 8x the candidates
    assert c8 < 0.62 * 8 * c1, (c1, c8)


def test_nprobe_sweep_recall_monotone(spark, sf_dir):
    """Probed cell sets are nested in nprobe, so per-query recall along the
    sweep must be non-decreasing and the production point (nprobe >= 5 at
    gate scale) at least matches the nprobe=4 arm."""
    rows = sim.ann_recall_sweep(catalog.load(spark, sf_dir).embeddings).collect()
    per_q: dict[int, list[tuple[int, float]]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.nprobe, r.recall))
    assert len(per_q) == sim.KNN_QUERIES
    for q, arms in per_q.items():
        arms.sort()
        recalls = [rec for _, rec in arms]
        assert recalls == sorted(recalls), (q, arms)
        # candidates grow with nprobe too (cost axis sanity)
    by_np: dict[int, int] = {}
    for r in rows:
        by_np[r.nprobe] = by_np.get(r.nprobe, 0) + r.n_candidates
    nps = sorted(by_np)
    assert all(by_np[a] < by_np[b] for a, b in zip(nps, nps[1:])), by_np
