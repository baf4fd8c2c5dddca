"""Exact-arithmetic k-means over the embedding column (IVF training step).

The IVF ANN entry (operators/similarity.py) coarse-quantizes with
DETERMINISTIC centroids; this module supplies the training loop that would
produce such centroids -- Lloyd's algorithm expressed as DataFrame ops:

  assign     broadcast the K-row centroid relation against the vector scan,
             squared-L2 per pair via zip_with/aggregate (JVM codegen, no
             UDF), keep each vector's argmin by (dist, centroid id);
  recompute  posexplode components -> per-(cluster, position) exact sums ->
             half-up integer mean -> regroup to arrays.

Cross-engine determinism (the DuckDB oracle must reproduce every
assignment bit-for-bit) comes from running entirely on an exact integer
grid: components quantize to micro-units (floor(x*1e6 + 0.5) as BIGINT --
the portable fround trick), so distances are exact BIGINT sums, argmin
ties break on centroid id, and centroid means use the floored-quotient
half-up trick ((2s+n) fld (2n), mathematical floor via mod subtraction)
that x_events_user_daily established.  Floating-point k-means is NOT
reproducible across engines (sum order, tie handling); quantized k-means
is, and 1e-6 resolution is far below any clustering-relevant signal.

Scale design (100 TB): centroids are always a K-row relation -- broadcast,
never shuffled; the assign step is a map over vector splits; recompute
shuffles |V| x dim skinny (cluster, pos, component) rows with map-side
partial aggregation.  Iteration count here is FIXED (2) for the oracled
entry; an open-ended loop would drive convergence from a 1-row aggregate
per round exactly like dedup's label propagation (operators/dedup.py).

Empty-cluster semantics: a centroid that attracts no members in iteration
1 simply drops out (standard Lloyd's degeneracy handling); both engines
derive surviving clusters from the same exact assignment, so they agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
SCALE = 1_000_000


def quantize_col(col):
    """Micro-unit quantization of one array column -- THE formula every
    integer-grid operator (k-means, IVF, PCA, SemDeDup) and its SQL twin
    must share; change it here and in the f-string oracles via SCALE."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * SCALE + F.lit(0.5)).cast("long")
    )


def quantize(embeddings: DataFrame, col: str = "embedding") -> DataFrame:
    """(vec_id, qv: array<long>) -- components in exact micro-units."""
    return embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        quantize_col(F.col(col)).alias("qv"),
    )


def init_centroids(q: DataFrame, k: int) -> DataFrame:
    """Deterministic init: the k lowest vec_ids, cid = 0..k-1 by that order.
    The k-row result is materialized through the driver -- k is a
    hyperparameter (bounded, tiny), and building the relation directly
    avoids a single-partition ranking window in every plan."""
    rows = q.orderBy("vec_id").limit(k).collect()
    return q.sparkSession.createDataFrame(
        [(i, list(r.qv)) for i, r in enumerate(sorted(rows, key=lambda r: r.vec_id))],
        "cid int, cq array<bigint>",
    )


def _dist2(qcol, ccol):
    """Exact squared L2 between two micro-unit arrays (BIGINT fold)."""
    return F.aggregate(
        F.zip_with(qcol, ccol, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cid, dist2): each vector's nearest centroid, ties to the
    lowest cid.  Broadcast cross join (K rows against the vector scan),
    then argmin as MIN over (dist2, cid) structs -- lexicographic struct
    ordering IS the (distance, centroid-id) tie-break, and the aggregate
    combines map-side, so the shuffle carries |V| pre-reduced rows rather
    than the K-expanded set a ranking window would sort."""
    j = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _dist2(F.col("qv"), F.col("cq")).alias("dist2")
    )
    best = j.groupBy("vec_id").agg(F.min(F.struct("dist2", "cid")).alias("_m"))
    return best.select(
        "vec_id", F.col("_m.cid").alias("cid"), F.col("_m.dist2").alias("dist2")
    )


def recompute(q: DataFrame, assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, position) exact component sums ->
    half-up integer mean -> arrays re-assembled in position order."""
    a = assigned.select("vec_id", "cid").join(q, "vec_id")
    comp = a.select("cid", F.posexplode("qv").alias("pos", "x"))
    sums = comp.groupBy("cid", "pos").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mean = sums.select(
        "cid",
        "pos",
        (2 * F.col("s") + F.col("n")).alias("_a"),
        (2 * F.col("n")).alias("_b"),
    ).select(
        "cid",
        "pos",
        F.expr("(_a - ((_a % _b + _b) % _b)) div _b").alias("c"),
    )
    return mean.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda st: st.getField("c"),
        ).alias("cq")
    )


def kmeans_assignments(
    embeddings: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """Run `iters` Lloyd's rounds; return the final exact assignment
    (vec_id, cluster, dist2_q)."""
    q = quantize(embeddings)
    cents = init_centroids(q, k)
    assigned = assign(q, cents)
    for _ in range(iters - 1):
        cents = recompute(q, assigned)
        assigned = assign(q, cents)
    return assigned.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist2").alias("dist2_q")
    )


def assign_gemm(q: DataFrame, cents: DataFrame) -> DataFrame:
    """assign()'s large-k fast path: the same EXACT integer argmin
    (squared L2 on the micro-unit grid, ties to the lowest cid), computed
    as ||q||^2 - 2 qC^T + ||c||^2 with int64 numpy GEMM inside mapInPandas
    instead of k per-row fold expressions.  Output is bit-identical to
    assign(); per-vector cost drops from k interpreted 64-element folds to
    one BLAS row.  The k-row centroid relation ships to executors as a
    closure-captured array (k is a bounded hyperparameter).  Overflow
    bound: |q| <= ~2^21 micro-units keeps every term under 2^63 for
    dim 64."""
    import numpy as np
    import pandas as pd

    crows = sorted(cents.collect(), key=lambda r: r.cid)
    cent_mat = np.array([list(r.cq) for r in crows], dtype=np.int64)
    cids = np.array([r.cid for r in crows], dtype=np.int64)
    c2 = (cent_mat * cent_mat).sum(axis=1)

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qm = np.array(pdf["qv"].tolist(), dtype=np.int64)
            q2 = (qm * qm).sum(axis=1)
            d2 = q2[:, None] - 2 * (qm @ cent_mat.T) + c2[None, :]
            # cids ascend, np.argmin returns the FIRST minimum -> ties break
            # to the lowest cid, matching assign()'s MIN(struct(dist2, cid))
            best = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cids[best].astype("int32"),
                    "dist2": d2[np.arange(len(best)), best],
                }
            )

    return q.select("vec_id", "qv").mapInPandas(kern, "vec_id long, cid int, dist2 long")


def kmeans_assignments_gemm(
    embeddings: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """kmeans_assignments with the GEMM assignment path -- identical
    output; the form to use when k is large (SemDeDup-style clustering
    where k scales with the corpus)."""
    q = quantize(embeddings)
    cents = init_centroids(q, k)
    assigned = assign_gemm(q, cents)
    for _ in range(iters - 1):
        cents = recompute(q, assigned)
        assigned = assign_gemm(q, cents)
    return assigned.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist2").alias("dist2_q")
    )
