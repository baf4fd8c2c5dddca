"""The compiled JVM Catalyst MV-substitution rule (catalyst/), pinned:
fires on both the direct and roll-up shapes, preserves values exactly,
never rewrites unsoundly (unmappable outputs), and always restores the
session's rule set -- including on exceptions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalyst as cat


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    base_dir = str(tmp_path_factory.mktemp("cat") / "base.parquet")
    mv_dir = str(tmp_path_factory.mktemp("cat") / "mv.parquet")
    spark.range(0, 2000).select(
        (F.col("id") % 11).alias("cust"),
        (F.col("id") % 7).alias("day"),
        (F.col("id") * 3 % 97).alias("amount"),
    ).write.parquet(base_dir)

    def defining(s):
        return (
            s.read.parquet(base_dir)
            .groupBy("cust", "day")
            .agg(F.sum("amount").alias("spending"))
        )

    defining(spark).write.parquet(mv_dir)
    return base_dir, mv_dir, defining


def _fresh(spark, fixture):
    base_dir, mv_dir, defining = fixture
    s2 = spark.newSession()
    rule = cat.load_rule(s2)
    cat.register_mv(rule, defining(s2), s2.read.parquet(mv_dir))
    return s2, rule, base_dir, defining


def test_direct_substitution_and_rollup(spark, fixture):
    s2, rule, base_dir, defining = _fresh(spark, fixture)
    plain_direct = sorted(map(tuple, defining(s2).collect()))
    plain_rollup = sorted(
        map(
            tuple,
            defining(s2)
            .groupBy("cust")
            .agg(F.sum("spending").alias("total"))
            .collect(),
        )
    )
    with cat.installed(s2, rule):
        # direct: the user plan IS the defining query
        d = defining(s2)
        got_direct = sorted(map(tuple, d.collect()))
        assert rule.hits() >= 1
        # roll-up: aggregate NAVIGATION via subtree substitution -- the
        # outer Aggregate re-aggregates the swapped-in MV scan
        h0 = rule.hits()
        r = defining(s2).groupBy("cust").agg(F.sum("spending").alias("total"))
        got_rollup = sorted(map(tuple, r.collect()))
        assert rule.hits() > h0
        plan = r._jdf.queryExecution().executedPlan().toString()
        assert "base.parquet" not in plan
        assert "mv.parquet" in plan or "mv" in plan
    assert got_direct == plain_direct
    assert got_rollup == plain_rollup


def test_restoration_even_on_exception(spark, fixture):
    s2, rule, _, _ = _fresh(spark, fixture)
    em = s2._jsparkSession.experimental()
    assert em.extraOptimizations().size() == 0
    with pytest.raises(RuntimeError):
        with cat.installed(s2, rule):
            assert em.extraOptimizations().size() == 1
            raise RuntimeError("boom")
    assert em.extraOptimizations().size() == 0


def test_unmappable_output_is_left_untouched(spark, fixture):
    """Soundness fallback: if the replacement cannot supply a matched
    subtree's output names, the subtree stays as written (never a broken
    rewrite)."""
    base_dir, mv_dir, defining = fixture
    s2 = spark.newSession()
    rule = cat.load_rule(s2)
    # replacement with RENAMED columns: sameResult still matches the
    # defining plan, but the remap cannot find the output names
    renamed = (
        s2.read.parquet(mv_dir)
        .select(
            F.col("cust").alias("c2"),
            F.col("day").alias("d2"),
            F.col("spending").alias("s2"),
        )
    )
    rule.register(
        defining(s2)._jdf.queryExecution().optimizedPlan(),
        renamed._jdf.queryExecution().optimizedPlan(),
    )
    plain = sorted(map(tuple, defining(s2).collect()))
    with cat.installed(s2, rule):
        got = sorted(map(tuple, defining(s2).collect()))
        assert rule.hits() == 0
    assert got == plain


def test_clear_resets_registry_and_counter(spark, fixture):
    s2, rule, _, defining = _fresh(spark, fixture)
    with cat.installed(s2, rule):
        defining(s2).collect()
        assert rule.hits() >= 1
        rule.clear()
        defining(s2).collect()
        assert rule.hits() == 0  # nothing registered -> identity


def test_substitution_under_filter_and_sort(spark, fixture):
    """The rule matches SUBTREES, so shapes the text-layer rewriter needs
    explicit handling for (Filter / Sort / Limit above the aggregate)
    work with no extra code: the defining subtree swaps wherever it
    appears."""
    s2, rule, base_dir, defining = _fresh(spark, fixture)

    def shape(s):
        return (
            defining(s)
            .filter(F.col("spending") > 50)
            .groupBy("cust")
            .agg(F.sum("spending").alias("total"))
            .orderBy(F.col("total").desc(), F.col("cust"))
            .limit(5)
        )

    plain = [tuple(r) for r in shape(s2).collect()]
    with cat.installed(s2, rule):
        df = shape(s2)
        got = [tuple(r) for r in df.collect()]
        assert rule.hits() >= 1
        assert "base.parquet" not in df._jdf.queryExecution().executedPlan().toString()
    assert got == plain


def test_compiled_rule_on_reference_view2(spark, sf_dir, tmp_path):
    """The compiled rule executes the REFERENCE's View2 decision at the
    plan level: View2's own defining query (per-(customer, name, year)
    spending over the derived sales fact -- queries/q4_views._view2, the
    same shape the gated q4_view2 entry materializes) registers against
    its parquet materialization, and the Q4a-style per-customer roll-up
    written against the BASE lineage is answered from the MV scan --
    the plan-layer twin of the gated x_mv_sql_rewrite text entries."""
    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.queries.q4_views import _view2

    s2 = spark.newSession()
    t = catalog.load(s2, sf_dir)

    def defining():
        return _view2(t).withColumnRenamed("sum_d", "amnt")

    mv_path = str(tmp_path / "view2.parquet")
    defining().write.parquet(mv_path)
    rule = cat.load_rule(s2)
    cat.register_mv(rule, defining(), s2.read.parquet(mv_path))

    def q4a_rollup():
        return (
            defining()
            .groupBy("customerid", "name")
            .agg(F.sum("amnt").alias("total"))
        )

    plain = sorted(map(tuple, q4a_rollup().collect()))
    with cat.installed(s2, rule):
        df = q4a_rollup()
        got = sorted(map(tuple, df.collect()))
        assert rule.hits() >= 1
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the base lineage scans lineitem/orders; after substitution the
        # aggregate reads only the materialized view2 parquet (toString
        # truncates file locations, so pin the scan's ReadSchema instead)
        assert "lineitem" not in plan
        assert "ReadSchema: struct<customerid:bigint,name:string,amnt:" in plan
    assert got == plain and len(got) > 0


def test_fd_rollup_rewrite(spark, tmp_path):
    """register_fd_rollup (round 15): a coarse-key rollup stated over the
    base table is answered from the fine-grain MV joined to a verified
    (fine, coarse) bridge -- value-identical to plain execution, executed
    plan free of the base scan."""
    base_dir = str(tmp_path / "fd_base.parquet")
    mv_dir = str(tmp_path / "fd_mv.parquet")
    bridge_dir = str(tmp_path / "fd_bridge.parquet")
    # fine key `district` (20 values), FD district -> country (4 values)
    spark.range(0, 5000).select(
        (F.col("id") % 20).alias("district"),
        ((F.col("id") % 20) % 4).alias("country"),
        (F.col("id") * 7 % 101).alias("amount"),
    ).write.parquet(base_dir)

    def fine(s):
        return (
            s.read.parquet(base_dir)
            .groupBy("district")
            .agg(F.sum("amount").alias("spending"))
        )

    def coarse(s):
        return (
            s.read.parquet(base_dir)
            .groupBy("country")
            .agg(F.sum("amount").alias("spending"))
        )

    fine(spark).write.parquet(mv_dir)
    spark.read.parquet(base_dir).select(
        "district", "country"
    ).distinct().write.parquet(bridge_dir)

    s2 = spark.newSession()
    plain = sorted(map(tuple, coarse(s2).collect()))
    rule = cat.load_rule(s2)
    cat.register_fd_rollup(
        rule,
        coarse(s2),
        s2.read.parquet(mv_dir),
        s2.read.parquet(bridge_dir),
        "district",
        "country",
        lambda bridged: bridged.groupBy("country").agg(
            F.sum("spending").alias("spending")
        ),
    )
    with cat.installed(s2, rule):
        q = coarse(s2)
        got = sorted(map(tuple, q.collect()))
        plan = q._jdf.queryExecution().executedPlan().toString()
    assert rule.hits() >= 1
    assert got == plain
    assert "fd_base" not in plan
    assert "fd_mv" in plan and "fd_bridge" in plan


def test_fd_rollup_rejects_non_functional_bridge(spark, tmp_path):
    """A bridge where one fine value maps to two coarse values would
    double-count MV rows -- registration must refuse."""
    rows = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x")], "district int, country string"
    )
    bridge_dir = str(tmp_path / "bad_bridge.parquet")
    rows.write.parquet(bridge_dir)
    s2 = spark.newSession()
    rule = cat.load_rule(s2)
    with pytest.raises(ValueError, match="not functional"):
        cat.register_fd_rollup(
            rule,
            rows,  # placeholder defining; the FD check fires first
            rows,
            s2.read.parquet(bridge_dir),
            "district",
            "country",
            lambda b: b,
        )


def test_fd_rollup_rejects_duplicate_pair_bridge(spark, tmp_path):
    """ADVICE r15: a DUPLICATED (fine, coarse) pair is still one distinct
    coarse value per fine key, so a countDistinct check would pass it --
    yet the join duplicates MV rows and double-counts.  The count(*)
    check must refuse."""
    rows = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "district int, country string"
    )
    bridge_dir = str(tmp_path / "dup_bridge.parquet")
    rows.write.parquet(bridge_dir)
    s2 = spark.newSession()
    rule = cat.load_rule(s2)
    with pytest.raises(ValueError, match="not functional"):
        cat.register_fd_rollup(
            rule,
            rows,
            rows.select(F.col("district"), F.lit(1).alias("spending")),
            s2.read.parquet(bridge_dir),
            "district",
            "country",
            lambda b: b,
        )


def test_fd_rollup_rejects_uncovered_mv(spark, tmp_path):
    """ADVICE r15: a bridge missing fine keys present in the MV silently
    UNDERCOUNTS through the inner join -- registration must refuse."""
    bridge = spark.createDataFrame(
        [(1, "x"), (2, "y")], "district int, country string"
    )
    mv = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "district int, spending int"
    )
    bridge_dir = str(tmp_path / "thin_bridge.parquet")
    mv_dir = str(tmp_path / "wide_mv.parquet")
    bridge.write.parquet(bridge_dir)
    mv.write.parquet(mv_dir)
    s2 = spark.newSession()
    rule = cat.load_rule(s2)
    with pytest.raises(ValueError, match="does not cover"):
        cat.register_fd_rollup(
            rule,
            mv,
            s2.read.parquet(mv_dir),
            s2.read.parquet(bridge_dir),
            "district",
            "country",
            lambda b: b,
        )
