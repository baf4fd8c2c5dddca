"""Extension: in-place table mutation (operators/mutations.py).

The reference mutates its warehouse with `UPDATE ... WHERE`
(assignment-5.sql:13-15) on tables with declared constraints; this entry
exercises the engine's copy-on-write equivalent end-to-end on the driver's
tables: materialize customer as a partitioned ManagedParquetTable, run an
UPDATE and a DELETE through the partition-pruned COW path, and aggregate the
mutated snapshot.  The DuckDB oracle states the same mutations relationally
(CASE projection + anti-filter), so the value hash pins mutation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..functions import money, sql_dec, sql_money, sum_c100
from ..operators import mutations
from . import query

_UPDATE_PRED = "c_mktsegment = 'BUILDING' AND c_acctbal < 0"
_DELETE_PRED = "c_mktsegment = 'MACHINERY' AND c_custkey % 10 = 0"


@query(
    "x_mutation_update_delete",
    oracle=f"""
WITH mutated AS (
  SELECT c_mktsegment,
         CASE WHEN {_UPDATE_PRED} THEN 0.0 ELSE c_acctbal END AS c_acctbal
  FROM customer
  WHERE NOT ({_DELETE_PRED})
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_money(f"SUM({sql_dec('c_acctbal')})")} AS sum_acctbal
FROM mutated
GROUP BY c_mktsegment
""",
)
def x_mutation_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE + DELETE through partition-pruned copy-on-write, verified by
    aggregating the mutated snapshot per segment."""
    t = catalog.load(spark, sf_dir)
    tbl = mutations.temp_table(
        spark, t.customer, partition_by=("c_mktsegment",)
    )
    tbl.update_where(_UPDATE_PRED, {"c_acctbal": F.lit(0.0)})
    tbl.delete_where(_DELETE_PRED)
    return (
        tbl.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money(sum_c100("c_acctbal")).alias("sum_acctbal"),
        )
    )


@query(
    "x_mutation_time_travel",
    oracle=f"""
SELECT 'v0' AS snapshot, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_money(f"SUM({sql_dec('c_acctbal')})")} AS sum_acctbal
FROM customer GROUP BY c_mktsegment
UNION ALL
SELECT 'v1' AS snapshot, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_money(f"SUM({sql_dec(f'CASE WHEN {_UPDATE_PRED} THEN 0.0 ELSE c_acctbal END')})")}
         AS sum_acctbal
FROM customer GROUP BY c_mktsegment
""",
)
def x_mutation_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation / time travel on the managed table: after an
    UPDATE commits as snapshot v=1, `read(version=0)` still serves the
    pre-mutation state -- both snapshots aggregated side by side, tagged.
    The lakehouse property the reference's MV refresh-by-overwrite lacks
    (assignment-5.sql:70-80: a concurrent reader mid-refresh); here the
    version-pointer commit keeps every retained snapshot fully readable."""
    t = catalog.load(spark, sf_dir)
    tbl = mutations.temp_table(
        spark, t.customer, partition_by=("c_mktsegment",)
    )
    tbl.update_where(_UPDATE_PRED, {"c_acctbal": F.lit(0.0)})

    def seg_agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_customers"),
            money(sum_c100("c_acctbal")).alias("sum_acctbal"),
        ).select(F.lit(tag).alias("snapshot"), "c_mktsegment", "n_customers", "sum_acctbal")

    return seg_agg(tbl.read(version=0), "v0").unionByName(
        seg_agg(tbl.read(), "v1")
    )


@query(
    "x_mutation_optimize_zorder",
    oracle=f"""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_money(f"SUM({sql_dec('o_totalprice')})")} AS sum_totalprice
FROM orders GROUP BY o_orderstatus
""",
)
def x_mutation_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER through the managed table (the A7 clustering analog):
    orders re-clustered on the Morton interleave of (custkey, totalprice)
    committed as a new snapshot, then aggregated -- the oracle pins that
    clustering is pure layout (bit-identical content), and the entry raises
    unless the optimize actually committed a new version."""
    t = catalog.load(spark, sf_dir)
    tbl = mutations.temp_table(spark, t.orders)
    tbl.optimize(cluster_by=("o_custkey", "o_totalprice"), zorder=True, num_files=8)
    if tbl.version() != 1:
        raise AssertionError(f"optimize did not commit: version={tbl.version()}")
    return (
        tbl.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(sum_c100("o_totalprice")).alias("sum_totalprice"),
        )
    )
