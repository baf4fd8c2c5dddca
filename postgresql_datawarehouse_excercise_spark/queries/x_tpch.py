"""Extension: TPC-H-style analytics over the full driver star schema.

The reference's analytic surface (SURVEY.md section 2) exercises one fact
table and tiny dimensions.  The driver testdata is a TPC-H subset (region,
nation, customer, supplier, part, orders, lineitem), so this module proves
the engine on the canonical OLAP workload shapes at the full schema width:
scan-heavy aggregation (Q1/Q6), selective multi-way joins with top-k
(Q3/Q10), correlated EXISTS (Q4), a 6-way snowflake join with a cross-table
equality constraint (Q5), conditional-aggregate ratios (Q14), a
having-filtered self-aggregate join (Q18), and disjunctive pushdown
predicates (Q19).  Adapted to the driver's column subset (no partsupp /
shipmode / commitdate); constants chosen to hit the 1995-2001 data range.

Scale design: every dimension side is broadcast (customer/part/supplier fit
in memory at any SF; at 100 TB lineitem/orders are the only shuffle-bearing
tables); all monetary aggregation is exact-decimal (order-independent across
partitions); every top-k compiles to TakeOrderedAndProject (no global sort);
date filters and band predicates push to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..functions import (
    c100,
    cents_sum,
    dec,
    money,
    ratio,
    sql_dec,
    sql_money,
    sql_ratio,
    sum_c100,
    sum_charge_cents,
    sum_rev_cents,
)
from . import query

_SQL_REV = f"{sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})"


@query(
    "x_tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_money(f"SUM({sql_dec('l_quantity')})")} AS sum_qty,
       {sql_money(f"SUM({sql_dec('l_extendedprice')})")} AS sum_base_price,
       {sql_money(f"SUM({_SQL_REV})")} AS sum_disc_price,
       {sql_money(f"SUM({_SQL_REV} * (1 + {sql_dec('l_tax')}))")} AS sum_charge,
       {sql_ratio(f"SUM({sql_dec('l_quantity')})", 'COUNT(*)')} AS avg_qty,
       {sql_ratio(f"SUM({sql_dec('l_extendedprice')})", 'COUNT(*)')} AS avg_price,
       {sql_ratio(f"SUM({sql_dec('l_discount')})", 'COUNT(*)')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def x_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: single wide scan -> partial agg -> one
    6-group shuffle.  The shipdate filter and 7-column projection push to the
    parquet scan; everything else is map-side combine."""
    t = catalog.load(spark, sf_dir)
    return pricing_summary(
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """The Q1 aggregate over any lineitem-shaped input (also driven by
    scripts/scale_smoke.py on K-fold multiplied data)."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # long-cents aggregation (functions.sum_*_cents): per-row math in
            # integer cents inside codegen, decimal only at the final divide;
            # measured ~40% off the all-decimal form, values identical
            money(sum_c100("l_quantity")).alias("sum_qty"),
            money(sum_c100("l_extendedprice")).alias("sum_base_price"),
            money(sum_rev_cents("l_extendedprice", "l_discount")).alias("sum_disc_price"),
            money(sum_charge_cents("l_extendedprice", "l_discount", "l_tax")).alias("sum_charge"),
            ratio(sum_c100("l_quantity"), F.count(F.lit(1))).alias("avg_qty"),
            ratio(sum_c100("l_extendedprice"), F.count(F.lit(1))).alias("avg_price"),
            ratio(sum_c100("l_discount"), F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "x_tpch_q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey, {sql_money(f"SUM({_SQL_REV})")} AS revenue, o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate  > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def x_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: segment-filtered customers broadcast onto
    orders, one lineitem shuffle, top-10 via TakeOrderedAndProject."""
    t = catalog.load(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money(sum_rev_cents("l_extendedprice", "l_discount")).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "x_tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
)
def x_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order priority: correlated EXISTS as a conditional left-semi
    join (orders is the small filtered side; the semi join short-circuits per
    key, no lineitem aggregation)."""
    t = catalog.load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "x_tpch_q5_local_supplier",
    oracle=f"""
SELECT n_name, {sql_money(f"SUM({_SQL_REV})")} AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
)
def x_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: 6-way snowflake join with the
    "customer and supplier share a nation" cross-table constraint.  All five
    non-lineitem sides broadcast; the only shuffle is the final 5-row
    nation aggregate."""
    t = catalog.load(spark, sf_dir)
    nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            t.nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = t.customer.join(
        F.broadcast(nations), t.customer.c_nationkey == nations.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(money(sum_rev_cents("l_extendedprice", "l_discount")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "x_tpch_q6_revenue_forecast",
    oracle=f"""
SELECT {sql_money(f"SUM({sql_dec('l_extendedprice')} * {sql_dec('l_discount')})")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def x_tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue change: pure scan-aggregate; all three band
    predicates push to parquet row-group pruning, no shuffle at all (scalar
    aggregate)."""
    t = catalog.load(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            money(cents_sum("l_extendedprice", "l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "x_tpch_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {sql_money(f"SUM({_SQL_REV})")} AS revenue, c_acctbal, n_name
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def x_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned items: quarter of orders broadcast onto the
    returnflag-filtered lineitem scan; per-customer revenue, top-20."""
    t = catalog.load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = t.customer.join(
        F.broadcast(t.nation.select("n_nationkey", "n_name")),
        t.customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money(sum_rev_cents("l_extendedprice", "l_discount")).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "x_tpch_q14_promo_revenue",
    oracle=f"""
SELECT {sql_ratio(
        f"100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV} ELSE 0 END)",
        f"SUM({_SQL_REV})")} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def x_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promo revenue share: conditional aggregate ratio; part
    broadcast onto a one-month lineitem slice, single scalar output."""
    t = catalog.load(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev4 = c100("l_extendedprice") * (F.lit(100) - c100("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(t.part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg(
            # both sums are exact 1e-4ths; the scale cancels in the ratio
            ratio(
                F.lit(100.0) * F.sum(promo.cast("decimal(38,0)")),
                F.sum(rev4.cast("decimal(38,0)")),
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "x_tpch_q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, {sql_money(f"SUM({sql_dec('l_quantity')})")} AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM({sql_dec('l_quantity')}) > 250
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big JOIN orders   ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
""",
)
def x_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume orders: self-aggregate on lineitem with HAVING,
    the surviving keys (rare) joined back to orders+customer.  The aggregate
    is the only big shuffle; the join sides after HAVING are tiny."""
    t = catalog.load(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey", money(F.col("q")).alias("total_qty"))
    )
    return (
        big.join(
            t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            big.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "x_tpch_q19_disjunctive_bands",
    oracle=f"""
SELECT {sql_money(f"SUM({_SQL_REV})")} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
""",
)
def x_tpch_q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue over disjunctive brand/size/quantity
    bands: the OR-of-ANDs predicate evaluates post-join, but the derivable
    prefilters (quantity range, brand set) still push to the scans."""
    t = catalog.load(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == F.col("p_partkey"),
    )
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    band2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return joined.filter(band1 | band2).agg(
        money(sum_rev_cents("l_extendedprice", "l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
