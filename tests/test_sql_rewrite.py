"""SQL-text MV rewrite (mv/sql_rewrite.py): spark.sql queries over the star
view answered from materialized views, value- and schema-identical to direct
execution, with the rewrite visible in the physical plan (MV parquet scan,
no fact scan).

Extends the navigator's four reference checks (assignment-5.md:626-632) to
SQL TEXT via analyzed-plan matching -- SURVEY.md section 4 option (b), minus
the compiled-JVM extension rule (documented divergence in the module)."""

from __future__ import annotations

import tempfile

import pytest

from postgresql_datawarehouse_excercise_spark.mv import sql_rewrite
from postgresql_datawarehouse_excercise_spark.mv.definitions import (
    default_navigator,
    default_registry,
)


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    reg = default_registry(tempfile.mkdtemp(prefix="pdwx-sqlrw-"))
    reg.build_all(spark, sf_dir)
    nav = default_navigator(reg)
    sql_rewrite.register_star_view(spark, sf_dir)
    return reg, nav


def _run(spark, sf_dir, built, text):
    reg, nav = built
    explain: list[str] = []
    df = sql_rewrite.spark_sql(spark, sf_dir, text, reg, nav, explain=explain)
    return df, explain


def _assert_equivalent(spark, df, text):
    direct = spark.sql(text)
    assert df.schema == direct.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect()))


def test_rewrites_customer_year_aggregate_onto_view2(spark, sf_dir, built):
    """The reference's View2 decision, reproduced from SQL text: a
    name/year SUM plans against the view2 parquet and never scans the
    fact."""
    text = "SELECT name, year, SUM(amnt) AS amnt FROM sales_star GROUP BY name, year"
    df, explain = _run(spark, sf_dir, built, text)
    assert any("view2" in e for e in explain), explain
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "view2" in plan
    assert "lineitem" not in plan and "orders" not in plan
    _assert_equivalent(spark, df, text)


def test_aliased_group_column_rewrites(spark, sf_dir, built):
    """`name AS customer` in the SELECT must re-alias in the rewritten
    result (regression: the rewrite used to emit only the source column and
    crash resolving the output alias)."""
    text = (
        "SELECT name AS customer, year, SUM(amnt) AS total "
        "FROM sales_star GROUP BY name, year"
    )
    df, explain = _run(spark, sf_dir, built, text)
    assert any("rewriting onto MV" in e for e in explain), explain
    assert df.columns == ["customer", "year", "total"]
    _assert_equivalent(spark, df, text)


def test_fd_bridge_rewrite_with_filter(spark, sf_dir, built):
    """country is reachable from view2's grain only via the FD bridge; the
    WHERE predicate re-applies at MV grain before re-aggregation."""
    text = (
        "SELECT district, SUM(amnt) AS amnt FROM sales_star "
        "WHERE country = 'ASIA' GROUP BY district"
    )
    df, explain = _run(spark, sf_dir, built, text)
    assert any("FD bridge" in e for e in explain), explain
    _assert_equivalent(spark, df, text)


def test_time_fd_picks_cheapest_sufficient_mv(spark, sf_dir, built):
    text = "SELECT dayofweek, SUM(amnt) AS amnt FROM sales_star GROUP BY dayofweek"
    df, explain = _run(spark, sf_dir, built, text)
    assert any("rewriting onto MV" in e for e in explain), explain
    _assert_equivalent(spark, df, text)


@pytest.fixture(scope="module")
def built_stats(spark, sf_dir):
    """Registry extended with the count-bearing view2 twin (opt-in), making
    COUNT(*) / AVG / multi-measure texts navigable."""
    from postgresql_datawarehouse_excercise_spark.mv.definitions import with_count_stats

    reg = with_count_stats(default_registry(tempfile.mkdtemp(prefix="pdwx-sqlrw-st-")))
    for name in ("time", "sales", "view2_stats"):
        reg.build(spark, sf_dir, name)
    nav = default_navigator(reg)
    sql_rewrite.register_star_view(spark, sf_dir)
    return reg, nav


def test_multi_measure_having_sort_limit_rewrites(spark, sf_dir, built_stats):
    """SUM + COUNT(*) + AVG with WHERE/HAVING/ORDER BY/LIMIT rewrites onto
    the count-bearing MV and is bit-identical to direct execution -- the
    AVG re-derivation (SUM(sum)/SUM(cnt) at widened quotient scale) must
    reproduce Spark's correctly-rounded decimal Average exactly, and the
    LIMIT must pick the same rows (ordered compare, not sorted)."""
    text = (
        "SELECT name, year, SUM(amnt) AS total_amnt, COUNT(*) AS n_rows, "
        "AVG(amnt) AS avg_amnt FROM sales_star WHERE year >= 1996 "
        "GROUP BY name, year HAVING COUNT(*) > 1 "
        "ORDER BY total_amnt DESC, name, year LIMIT 50"
    )
    df, explain = _run(spark, sf_dir, built_stats, text)
    assert any("view2_stats" in e for e in explain), explain
    direct = spark.sql(text)
    assert df.schema == direct.schema
    assert list(map(tuple, df.collect())) == list(map(tuple, direct.collect()))


def test_multi_measure_rewrite_scans_mv_not_fact(spark, sf_dir, built_stats):
    """The rewritten multi-measure plan must read the view2_stats parquet
    and never touch the fact lineage (no lineitem/orders scan)."""
    text = (
        "SELECT name, year, SUM(amnt) AS s, COUNT(*) AS n, AVG(amnt) AS a "
        "FROM sales_star GROUP BY name, year"
    )
    df, explain = _run(spark, sf_dir, built_stats, text)
    assert any("view2_stats" in e for e in explain), explain
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "view2_stats" in plan
    assert "lineitem" not in plan and "orders" not in plan


def test_hidden_sort_aggregate_rewrites(spark, sf_dir, built_stats):
    """ORDER BY AVG(amnt) where AVG is not in the SELECT list: the analyzer
    parks it as a hidden aggregate output behind a Project; the rewrite must
    reproduce the sort and then drop the hidden column."""
    text = (
        "SELECT name, SUM(amnt) AS s FROM sales_star "
        "GROUP BY name ORDER BY AVG(amnt) DESC, name LIMIT 10"
    )
    df, explain = _run(spark, sf_dir, built_stats, text)
    assert any("rewriting onto MV" in e for e in explain), explain
    direct = spark.sql(text)
    assert df.schema == direct.schema
    assert list(map(tuple, df.collect())) == list(map(tuple, direct.collect()))


def test_count_without_count_mv_executes_as_written(spark, sf_dir, built):
    """A COUNT(*) text is only navigable when some MV materializes a count
    column; the default (reference-only) stack has none, so the query must
    fall through to direct execution rather than mis-rewrite."""
    text = "SELECT name, COUNT(*) AS n FROM sales_star GROUP BY name"
    df, explain = _run(spark, sf_dir, built, text)
    assert any("executing as written" in e for e in explain), explain
    _assert_equivalent(spark, df, text)


_MATRIX = [
    # (text, expect_rewrite) -- a sweep over group sets x measure mixes x
    # wrappers; every case must be value- and schema-identical to direct
    # execution whether or not the rewrite fires.
    ("SELECT year, SUM(amnt) AS s FROM sales_star GROUP BY year", True),
    ("SELECT district, year, SUM(amnt) AS s FROM sales_star GROUP BY district, year", True),
    # dayofweek is reachable only via timeid's FD, which the count-bearing
    # MV's grain does not carry -- a COUNT query on it must fall back
    ("SELECT dayofweek, COUNT(*) AS n FROM sales_star GROUP BY dayofweek", False),
    ("SELECT year, COUNT(*) AS n FROM sales_star GROUP BY year", True),
    ("SELECT year, AVG(amnt) AS a FROM sales_star GROUP BY year", True),
    ("SELECT year, SUM(amnt) AS s, AVG(amnt) AS a, COUNT(*) AS n "
     "FROM sales_star GROUP BY year", True),
    ("SELECT country, SUM(amnt) AS s FROM sales_star "
     "WHERE district <> 'JAPAN' GROUP BY country", True),
    ("SELECT year, COUNT(*) AS n FROM sales_star GROUP BY year "
     "HAVING SUM(amnt) > 1000 ORDER BY n DESC, year LIMIT 3", True),
    ("SELECT name AS who, year AS y, AVG(amnt) AS a FROM sales_star "
     "GROUP BY name, year ORDER BY a DESC, who, y LIMIT 9", True),
    # max-of-max / min-of-min re-aggregate from the extrema measures
    ("SELECT year, MAX(amnt) AS m FROM sales_star GROUP BY year", True),
    ("SELECT year, MIN(amnt) AS lo, MAX(amnt) AS hi, AVG(amnt) AS a, "
     "COUNT(*) AS n, SUM(amnt) AS s FROM sales_star GROUP BY year", True),
    # not navigable: measure expression, distinct, non-re-aggregable agg
    ("SELECT year, SUM(amnt * 2) AS s FROM sales_star GROUP BY year", False),
    ("SELECT year, SUM(DISTINCT amnt) AS s FROM sales_star GROUP BY year", False),
    ("SELECT year, stddev(amnt) AS sd FROM sales_star GROUP BY year", False),
    # value-semantics-changing casts must NOT match: string ordering under
    # MAX differs from numeric, and double accumulation under SUM diverges
    # at the ULP level from the MV's exact-decimal sum
    ("SELECT year, MAX(CAST(amnt AS STRING)) AS m FROM sales_star GROUP BY year",
     False),
    ("SELECT year, SUM(CAST(amnt AS DOUBLE)) AS s FROM sales_star GROUP BY year",
     False),
]


@pytest.mark.parametrize("text,expect_rewrite", _MATRIX)
def test_rewrite_equivalence_matrix(spark, sf_dir, built_stats, text, expect_rewrite):
    """Matrix sweep: the rewriter must be value- and schema-transparent on
    every navigable shape, and must fall back (not mis-rewrite) on every
    non-navigable one."""
    df, explain = _run(spark, sf_dir, built_stats, text)
    fired = any("rewriting onto MV" in e for e in explain)
    assert fired == expect_rewrite, (text, explain)
    direct = spark.sql(text)
    assert df.schema == direct.schema, text
    if "LIMIT" in text:
        assert list(map(tuple, df.collect())) == list(map(tuple, direct.collect())), text
    else:
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect())), text


def test_subquery_where_falls_back_not_crashes(spark, sf_dir, built):
    """A WHERE containing a subquery cannot round-trip through render-SQL;
    the rewrite must fall back to direct execution, never raise."""
    text = (
        "SELECT name, SUM(amnt) AS s FROM sales_star "
        "WHERE year IN (SELECT 1996) GROUP BY name"
    )
    df, explain = _run(spark, sf_dir, built, text)
    assert any("executing as written" in e for e in explain), explain
    _assert_equivalent(spark, df, text)


def test_count_null_literal_not_matched_as_count_star(spark, sf_dir, built_stats):
    """COUNT(NULL) is 0 per group, not the row count; the matcher must not
    rewrite it onto the count measure."""
    text = "SELECT name, COUNT(NULL) AS n FROM sales_star GROUP BY name"
    df, explain = _run(spark, sf_dir, built_stats, text)
    assert any("executing as written" in e for e in explain), explain
    _assert_equivalent(spark, df, text)


def test_non_navigable_shapes_execute_as_written(spark, sf_dir, built):
    """COUNT(DISTINCT) is not additively re-aggregable; a non-star FROM is
    not matched at all -- both must fall through untouched."""
    for text in (
        "SELECT name, COUNT(DISTINCT partkey) AS n FROM sales_star GROUP BY name",
        "SELECT r_name, COUNT(*) AS n FROM {} GROUP BY r_name",
    ):
        if "{}" in text:
            import os

            spark.read.parquet(os.path.join(sf_dir, "region.parquet")).createOrReplaceTempView("region_v")
            text = text.format("region_v")
        df, explain = _run(spark, sf_dir, built, text)
        assert any("executing as written" in e for e in explain), explain
        _assert_equivalent(spark, df, text)
