"""Principal component of the embedding corpus via distributed covariance
+ power iteration -- the "embedding analytics" building block (corpus drift
monitoring, whitening, SemDeDup-style preprocessing all start from the top
principal directions).

Architecture (the only shape that survives 100 TB):

  second moment   S = sum_i q_i q_i^T is computed as PER-PARTITION GEMM
                  partials (numpy int64 inside mapInPandas -- one Arrow
                  pass over the vectors, BLAS-speed, no shuffle of the
                  data itself); the shuffle carries only P x DIM^2 partial
                  rows, and the driver holds exactly DIM^2 integers --
                  both independent of corpus size.
  mean / count    one exact integer aggregation (posexplode -> SUM/COUNT).
  covariance      derived on the driver from the moment identity
                  sum (q_j - M_j)(q_k - M_k) = S_jk - M_j T_k - M_k T_j
                  + N M_j M_k  (exact for integer M), then floor-divided
                  by N so the matrix magnitude is scale-independent.
  power iteration runs on the DIM x DIM matrix -- a constant-size object;
                  iterating it driver-side is the distributed-systems
                  norm (the data-sized work is the two passes above).
  projection      one final map over the vectors with the eigenvector as
                  a broadcast literal array (zip_with/aggregate fold, JVM
                  codegen).

Cross-engine determinism: everything runs on the micro-unit integer grid
(operators/clustering.py quantize); means/normalizations use the half-up
floored-quotient trick ((2a+b) fld (2b)), so the DuckDB oracle replays the
covariance, all unrolled iterations, and every projection bit-for-bit.
Overflow bounds (documented, asserted nowhere hot): |q| <= ~2^21 micro-units
for unit-norm-ish embeddings, so S partials stay under 2^63 to ~2e6 rows per
partition and C*v products under 2^63 for any N (C is divided by N first).
At larger partitions, pre-scale q by 2^-5 (one more floor-round) -- same
discipline, 5 bits of resolution traded for 10 bits of headroom.

The reference exercise has no linear-algebra surface; this family belongs
to the BASELINE.json training-pipeline north star (SURVEY SS2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import fround
from .clustering import SCALE, quantize

DIM = 64
V_SCALE = 1000          # eigenvector normalized to max-abs = 1000
PCA_ITERS = 3


def _fld_half_up(a: int, b: int) -> int:
    """floor((a + b/2) / b) for integer a, positive integer b -- Python //
    already floors, matching the SQL mod-subtraction formulation exactly."""
    return (2 * a + b) // (2 * b)


def _moment_rows(batches):
    """mapInPandas kernel: int64 GEMM partial (DIM x DIM) per partition."""
    import numpy as np
    import pandas as pd

    acc = np.zeros((DIM, DIM), dtype=np.int64)
    seen = False
    for pdf in batches:
        if len(pdf) == 0:
            continue
        m = np.array(pdf["qv"].tolist(), dtype=np.int64)
        acc += m.T @ m
        seen = True
    if seen:
        j, k = np.meshgrid(np.arange(DIM), np.arange(DIM), indexing="ij")
        yield pd.DataFrame(
            {"j": j.ravel(), "k": k.ravel(), "s": acc.ravel()}
        )


def principal_component(q: DataFrame, iters: int = PCA_ITERS) -> list[int]:
    """Top eigenvector of the integer covariance of `q` (vec_id, qv), as
    DIM integers with max-abs = V_SCALE.  Two distributed passes; the
    driver never holds more than DIM^2 integers."""
    tn = {
        r["j"]: (r["t"], r["n"])
        for r in q.select(F.posexplode("qv").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum("x").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = tn[0][1]
    t = [tn[j][0] for j in range(DIM)]
    mean = [_fld_half_up(t[j], n) for j in range(DIM)]
    s_rows = (
        q.select("qv")
        .mapInPandas(_moment_rows, "j int, k int, s long")
        .groupBy("j", "k")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    s = {(r["j"], r["k"]): r["s"] for r in s_rows}
    c = [
        [
            _fld_half_up(
                s[(j, k)] - mean[j] * t[k] - mean[k] * t[j] + n * mean[j] * mean[k],
                n,
            )
            for k in range(DIM)
        ]
        for j in range(DIM)
    ]
    v = [V_SCALE] * DIM
    for _ in range(iters):
        w = [sum(c[j][k] * v[k] for k in range(DIM)) for j in range(DIM)]
        m = max(max(abs(x) for x in w), 1)
        v = [_fld_half_up(w[j] * V_SCALE, m) for j in range(DIM)]
    return v


def pca_project(embeddings: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """(vec_id, pc1_score, pc1): every vector's projection onto the corpus's
    top principal direction.  pc1_score is the exact integer fold
    sum_j q_j * v_j; pc1 rescales it to original units (micro-unit grid x
    V_SCALE normalization)."""
    q = quantize(embeddings)
    v = principal_component(q, iters=iters)
    vlit = F.array(*[F.lit(int(x)).cast("long") for x in v])
    score = F.aggregate(
        F.zip_with(F.col("qv"), vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return q.select("vec_id", score.alias("pc1_score")).select(
        "vec_id",
        "pc1_score",
        fround(
            F.col("pc1_score").cast("double") / F.lit(float(SCALE * V_SCALE)), 6
        ).alias("pc1"),
    )


def _sql_fld(num: str, den: str) -> str:
    """Exact floor division via mod subtraction (division-semantics-proof:
    the numerator becomes an exact multiple of the denominator)."""
    return f"(({num}) - ((({num}) % ({den}) + ({den})) % ({den}))) // ({den})"


def pca_project_sql(iters: int = PCA_ITERS) -> str:
    """DuckDB twin: same quantization, same moment identity, same unrolled
    power iterations, same projection -- bit-exact."""
    fld_mean = _sql_fld("2*t + n", "2*n")
    fld_c = _sql_fld("2*num + n", "2*n")
    parts = [
        f"""
WITH q AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * {SCALE}.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
comp AS (SELECT vec_id, r.i - 1 AS j, qv[r.i] AS x FROM q, range(1, {DIM + 1}) r(i)),
tn AS (SELECT j, CAST(SUM(x) AS BIGINT) AS t, COUNT(*) AS n FROM comp GROUP BY j),
mean AS (SELECT j, {fld_mean} AS m FROM tn),
smat AS (
  SELECT a.j AS j, b.j AS k, CAST(SUM(a.x * b.x) AS BIGINT) AS s
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id GROUP BY a.j, b.j
),
cnum AS (
  SELECT smat.j, smat.k,
         smat.s - mj.m * tk.t - mk.m * tj.t + tj.n * mj.m * mk.m AS num,
         tj.n AS n
  FROM smat
  JOIN mean mj ON mj.j = smat.j
  JOIN mean mk ON mk.j = smat.k
  JOIN tn tj ON tj.j = smat.j
  JOIN tn tk ON tk.j = smat.k
),
c AS (SELECT j, k, {fld_c} AS c FROM cnum),
v0 AS (SELECT j, CAST({V_SCALE} AS BIGINT) AS v FROM tn)"""
    ]
    for i in range(1, iters + 1):
        fld_v = _sql_fld("2*w*" + str(V_SCALE) + " + m", "2*m")
        parts.append(
            f"""w{i} AS (
  SELECT c.j, CAST(SUM(c.c * v{i - 1}.v) AS BIGINT) AS w
  FROM c JOIN v{i - 1} ON c.k = v{i - 1}.j GROUP BY c.j
),
m{i} AS (SELECT GREATEST(MAX(ABS(w)), 1) AS m FROM w{i}),
v{i} AS (SELECT j, {fld_v} AS v FROM w{i}, m{i})"""
        )
    parts.append(
        f"""score AS (
  SELECT comp.vec_id, CAST(SUM(comp.x * v{iters}.v) AS BIGINT) AS pc1_score
  FROM comp JOIN v{iters} ON comp.j = v{iters}.j GROUP BY comp.vec_id
)
SELECT vec_id, pc1_score,
       FLOOR((CAST(pc1_score AS DOUBLE) / {float(SCALE * V_SCALE)})
             * 1000000.0 + 0.5) / 1000000.0 AS pc1
FROM score"""
    )
    return ",\n".join(parts)
