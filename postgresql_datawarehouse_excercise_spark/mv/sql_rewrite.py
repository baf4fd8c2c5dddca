"""SQL-text MV rewrite: spark.sql() queries answered from materialized views.

The navigator (mv/navigator.py) mechanizes the reference's four rewrite
checks for queries stated as AggQuery intents; this module extends the same
rewrite to SQL TEXT.  ``spark_sql`` parses and analyzes the text through
Catalyst, pattern-matches the ANALYZED logical plan --

    Aggregate [group attrs] [SUM(measure) AS alias]
      +- (Filter condition)?
          +- SubqueryAlias <star view>

-- extracts the grouping / filter attribute sets and the measure, and asks
the navigator for the cheapest sufficient MV.  On a match the returned
DataFrame reads the MV parquet (plus FD bridge joins), re-applies the
filter predicate at MV grain, and re-aggregates; otherwise the original
``spark.sql`` DataFrame is returned untouched.  Either way the result is
column-for-column identical to executing the text directly.

Divergence note (SURVEY.md section 4 option b): the by-the-book Spark
mechanism is a logical rule injected via ``spark.sql.extensions`` so the
OPTIMIZER performs the substitution; extension rules must be compiled JVM
classes, which this pure-Python repo cannot ship.  The match here runs on
the same Catalyst analyzed plan, just applied by a wrapper before
execution -- the plan test pins the observable property (the rewritten
query scans the MV parquet, not the fact).

The star view is the unified attribute namespace the reference queries
against (customer x nation x region x time denormalized onto the sales
fact); ``register_star_view`` publishes it as a temp view so users write
plain SQL over one wide relation and the navigator picks the narrowest
materialization that can answer it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .navigator import AggQuery, AggregateNavigator
from .registry import MVRegistry

STAR_VIEW = "sales_star"


def register_star_view(
    spark: SparkSession, sf_dir: str, name: str = STAR_VIEW
) -> DataFrame:
    """Publish the fully-denormalized sales star as a temp view: the base
    relation SQL-text queries aggregate against.  Executing it directly
    joins the fact to every dimension -- exactly what an MV rewrite should
    avoid."""
    t = catalog.load(spark, sf_dir)
    from ..queries.q4_views import _geo

    cust = t.customer.select(
        F.col("c_custkey").alias("customerid"), F.col("c_name").alias("name")
    )
    geo = _geo(t)
    tdim = t.time_dim().select("timeid", "orderdate", "dayofweek", "month", "year")
    star = (
        t.sales()
        .join(F.broadcast(cust), "customerid")
        .join(F.broadcast(geo), "customerid")
        .join(F.broadcast(tdim), "timeid")
        .select(
            "customerid", "name", "district", "country",
            "timeid", "orderdate", "dayofweek", "month", "year",
            "partkey", "amnt",
        )
    )
    star.createOrReplaceTempView(name)
    return star


# ---------------------------------------------------------------------------
# analyzed-plan pattern match (py4j traversal of Catalyst LogicalPlan)

def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _children(node) -> list:
    s = node.children()
    return [s.apply(i) for i in range(s.size())]


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _attr_names(expr) -> list[str]:
    return [a.name() for a in _seq(expr.references().toSeq())]


def _match_star_aggregate(jplan, view_name: str):
    """Match Aggregate[attrs][sum(m) as alias] <- Filter? <- SubqueryAlias
    view_name.  Returns (group_cols, measure, filter_attrs, filter_sql,
    out_cols) or None.  out_cols is (output name, source attr, is_measure)
    per output position so the rewrite reproduces the exact result schema,
    including aliased group columns (`name AS customer`)."""
    if _cls(jplan) != "Aggregate":
        return None
    groups = []
    for g in _seq(jplan.groupingExpressions()):
        if _cls(g) != "AttributeReference":
            return None
        groups.append(g.name())
    measure = None
    out_cols: list[tuple[str, str, bool]] = []  # (out name, src attr, is_measure)
    for e in _seq(jplan.aggregateExpressions()):
        kind = _cls(e)
        if kind == "AttributeReference":
            if e.name() not in groups:
                return None
            out_cols.append((e.name(), e.name(), False))
            continue
        if kind != "Alias":
            return None
        child = e.child()
        if _cls(child) == "AttributeReference":
            if child.name() not in groups:
                return None
            out_cols.append((e.name(), child.name(), False))
            continue
        if _cls(child) != "AggregateExpression":
            return None
        fn = child.aggregateFunction()
        if _cls(fn) != "Sum" or child.isDistinct():
            return None
        arg = fn.children().apply(0)
        if _cls(arg) == "Cast":  # analyzer-inserted numeric promotion
            arg = arg.child()
        if _cls(arg) != "AttributeReference":
            return None
        if measure is not None:  # one additive measure per navigable query
            return None
        measure = arg.name()
        out_cols.append((e.name(), measure, True))
    if measure is None:
        return None
    node = _children(jplan)[0]
    filter_sql = None
    filter_attrs: list[str] = []
    if _cls(node) == "Filter":
        filter_sql = node.condition().sql()
        filter_attrs = _attr_names(node.condition())
        node = _children(node)[0]
    if _cls(node) != "SubqueryAlias" or node.alias() != view_name:
        return None
    return groups, measure, filter_attrs, filter_sql, out_cols


def spark_sql(
    spark: SparkSession,
    sf_dir: str,
    sql_text: str,
    registry: MVRegistry,
    navigator: AggregateNavigator,
    view_name: str = STAR_VIEW,
    explain: list[str] | None = None,
) -> DataFrame:
    """spark.sql() with MV navigation (see module docstring)."""
    df = spark.sql(sql_text)
    m = _match_star_aggregate(df._jdf.queryExecution().analyzed(), view_name)
    if m is None:
        if explain is not None:
            explain.append("plan shape not navigable; executing as written")
        return df
    groups, measure, filter_attrs, filter_sql, out_cols = m
    q = AggQuery(
        group_cols=frozenset(groups),
        measure=measure,
        filter_attrs=frozenset(filter_attrs),
    )
    cand = navigator.choose(q)
    if cand is None:
        if explain is not None:
            explain.append(f"no sufficient MV for {q}; executing as written")
        return df
    mv = registry.defs[cand.mv_name]
    out = registry.read(spark, cand.mv_name)
    if explain is not None:
        explain.append(
            f"rewriting onto MV '{cand.mv_name}' (rows={cand.rowcount}); "
            f"direct={sorted(cand.direct)} via_fd={sorted(cand.via_fd)}"
        )
    for attr in sorted(cand.via_fd):
        src = navigator._bridge_source(mv.grain, attr)
        if src is None:
            if explain is not None:
                explain.append(f"no FD bridge to {attr}; executing as written")
            return df
        out = out.join(F.broadcast(navigator.bridges[(src, attr)](spark, sf_dir)), src)
        if explain is not None:
            explain.append(f"FD bridge join {src} -> {attr}")
    if filter_sql is not None:
        # the filter references only grain/bridged attrs (data sufficiency),
        # so it applies at MV grain BEFORE the re-aggregation; the rendered
        # predicate qualifies attrs with the view name, so alias the
        # rewritten relation to make those references resolve
        out = out.alias(view_name).filter(F.expr(filter_sql))
    agg = out.groupBy(*groups).agg(F.sum(measure).alias("__m"))
    # re-aggregating a pre-summed measure widens decimals one step further
    # than the direct query; pin the ORIGINAL result's dtype so the rewrite
    # is schema-identical to executing the text.  Group columns re-alias to
    # their OUTPUT names (the text may write `name AS customer`).
    return agg.select(
        *[
            F.col("__m").cast(df.schema[out].dataType).alias(out)
            if is_measure
            else F.col(src).alias(out)
            for out, src, is_measure in out_cols
        ]
    )
