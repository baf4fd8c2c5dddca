"""MV registry + aggregate-navigator tests: build the stack, check refresh
and drop, and verify the navigator reproduces the reference's rewrite
decisions (best buyers <- View2; top country <- View2/View3 via FD bridges)
with answers identical to base-table computation."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark.mv.definitions import (
    default_navigator,
    default_registry,
)
from postgresql_datawarehouse_excercise_spark.mv.navigator import AggQuery
from postgresql_datawarehouse_excercise_spark.queries import load_all

REGISTRY_NAMES = {
    "time", "sales", "sales_table", "avg_amnt_view", "sum_customer_per_day",
    "avg_spending_by_customer_on_each_day", "best_buyers", "amount_per_order",
    "ord_avg_amnt", "no_of_ord", "amount_per_order_by_customer", "perc_of_ord",
    "view1", "view2", "view3", "customer_spending", "sum_per_day_per_city",
}


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="pdwx-wh-")
    reg = default_registry(tmp)
    reg.build_all(spark, sf_dir)
    yield reg
    reg.drop_all()


def test_registry_covers_reference_mvs(built):
    assert set(built.defs) == REGISTRY_NAMES


def test_all_mvs_built_with_stats(built):
    for name in built.defs:
        assert built.is_built(name), name
        assert built.stats[name] >= 0


def test_dep_reading_builders_match_pure_builders(built, spark, sf_dir):
    """Every MV with a builder_from_deps twin (the reference's FROM-the-MV
    definitions, assignment-5.sql:165-170,221-223,232-235,244-250,259-263,
    401-409) persisted EXACTLY what its pure base-lineage builder derives --
    the arms contract of MVDef.builder_from_deps.  build_all exercised the
    dep-reading arm (deps fresh), so the persisted parquet IS that arm's
    output."""
    from postgresql_datawarehouse_excercise_spark import catalog

    t = catalog.load(spark, sf_dir)
    checked = 0
    for name, mv in built.defs.items():
        if mv.builder_from_deps is None:
            continue
        got = sorted(map(tuple, built.read(spark, name).collect()))
        want = sorted(map(tuple, mv.builder(t).collect()))
        assert got == want, name
        checked += 1
    assert checked >= 6


def test_analyze_populates_catalog_statistics(built, spark):
    """The VACUUM ANALYZE analog (SURVEY A9): after build_all every
    unpartitioned MV has a catalog table whose statistics carry the exact
    row count plus grain-column min/max/ndv -- the inputs Spark's CBO
    needs.  The scan is deferred off the build critical path (autovacuum
    style): the first stats-read through table() computes it, after which
    the catalog answers directly."""
    built.table(spark, "sales")  # first stats-read runs the deferred ANALYZE
    desc = spark.sql(
        f"DESCRIBE EXTENDED {built.table_name('sales')}"
    ).collect()
    stats_row = next(r for r in desc if r.col_name == "Statistics")
    assert f"{built.stats['sales']} rows" in stats_row.data_type
    col = {
        r.info_name: r.info_value
        for r in spark.sql(
            f"DESCRIBE EXTENDED {built.table_name('sales')} timeid"
        ).collect()
    }
    assert col["min"] != "NULL" and col["max"] != "NULL"
    assert int(col["distinct_count"]) > 0


def test_cbo_column_stats_improve_filtered_join_plan(built, spark):
    """Stats-sensitive plan improvement: a selective filter over the
    ANALYZEd sales table estimates from column min/max (rowCount ~ the
    true slice), so the join side fits a small broadcast threshold; the
    identical query through the stats-free path-based read keeps the whole
    file's size estimate and falls back to a shuffle join.  This is what
    CBO buys on a cold multi-join query at scale: the optimizer sees
    through the filter instead of assuming the full relation."""
    probe = built.read(spark, "sales").select("timeid", "amnt")
    with_stats = (
        built.table(spark, "sales").filter(F.col("timeid") <= 5).select("timeid")
    )
    without = (
        built.read(spark, "sales").filter(F.col("timeid") <= 5).select("timeid")
    )

    def est_bytes(df):
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())

    s_est, p_est = est_bytes(with_stats), est_bytes(without)
    # the CBO estimate must see through the filter (the path-based one
    # keeps the whole relation's size)
    assert s_est * 4 <= p_est, (s_est, p_est)
    assert (
        with_stats._jdf.queryExecution().optimizedPlan().stats().rowCount().isDefined()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # a threshold BETWEEN the two estimates: only the stats-informed
        # side qualifies for broadcast, whatever the test SF
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str((s_est + p_est) // 2)
        )
        from postgresql_datawarehouse_excercise_spark import plans

        assert plans.num_broadcast_joins(probe.join(with_stats, "timeid")) == 1
        assert plans.num_broadcast_joins(probe.join(without, "timeid")) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_view_stack_row_monotonicity(built):
    # view3 aggregates view1; view2 aggregates sales: coarser grain => fewer rows
    assert built.stats["view3"] <= built.stats["view1"]
    assert built.stats["view2"] <= built.stats["sales"]
    assert built.stats["sales"] <= built.stats["view1"]


def test_navigator_picks_view2_for_best_buyers(built):
    nav = default_navigator(built)
    q = AggQuery(group_cols=frozenset({"customerid", "name"}), measure="amnt")
    cand = nav.choose(q)
    assert cand is not None and cand.mv_name == "view2"


def test_navigator_top_country_uses_fd_bridge(built):
    nav = default_navigator(built)
    q = AggQuery(group_cols=frozenset({"country"}), measure="amnt")
    cands = nav.eligible(q)
    names = [c.mv_name for c in cands]
    # every additive view can answer via FDs; cheapest must be a real view,
    # not the fact table
    assert set(names) >= {"sales", "view1", "view2", "view3"}
    assert cands[0].mv_name in {"view2", "view3"}
    assert cands[0].via_fd == frozenset({"country"})


def test_navigator_answer_matches_base_tables(built, spark, sf_dir):
    nav = default_navigator(built)
    q = AggQuery(group_cols=frozenset({"country"}), measure="amnt")
    explain: list[str] = []
    got = nav.answer(spark, sf_dir, q, explain=explain).collect()
    want = (
        load_all()["q4b_top_country_raw"].fn(spark, sf_dir).collect()
    )
    got_map = {r["country"]: float(r["amnt"]) for r in got}
    top = max(got_map.items(), key=lambda kv: kv[1])
    assert top[0] == want[0]["country"]
    assert abs(top[1] - want[0]["spending"]) < 1e-2
    assert any("FD bridge" in e for e in explain)


def test_refresh_rebuilds_downstream(built, spark, sf_dir):
    before = dict(built.stats)
    built.refresh(spark, sf_dir, "sales")
    # sales and everything depending on it rebuilt with same contents
    assert built.stats["sales"] == before["sales"]
    assert built.stats["view2"] == before["view2"]


def test_uniqueness_invariant_on_sales_key(built, spark):
    # A7: unique index analog -- ETL assertion on the 3-col key
    sales = built.read(spark, "sales")
    dups = (
        sales.groupBy("customerid", "timeid", "partkey")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


# --- incremental maintenance -------------------------------------------------


def _date_split(spark, sf_dir, cutoff="1998-07-01"):
    from postgresql_datawarehouse_excercise_spark import catalog

    t = catalog.load(spark, sf_dir)
    pred = F.col("o_orderdate").cast("date") >= F.lit(cutoff).cast("date")
    k2 = t.orders.filter(pred).select("o_orderkey")
    batch1 = catalog.delta_tables(
        spark, sf_dir,
        orders=t.orders.filter(~pred),
        lineitem=t.lineitem.join(k2, t.lineitem.l_orderkey == k2.o_orderkey, "left_anti"),
    )
    delta = catalog.delta_tables(
        spark, sf_dir,
        orders=t.orders.filter(pred),
        lineitem=t.lineitem.join(k2, t.lineitem.l_orderkey == k2.o_orderkey, "left_semi"),
    )
    return batch1, delta


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_incremental_view2_equals_full_rebuild(spark, sf_dir):
    """Build time/sales/view2 from the pre-cutoff batch, apply the rest as a
    delta, and require the merged view2 to equal a full one-shot rebuild
    bit-for-bit (grain, names, years, exact-decimal sums)."""
    from postgresql_datawarehouse_excercise_spark.etl.time_dim import build_time_dim

    batch1, delta = _date_split(spark, sf_dir)
    inc = default_registry(tempfile.mkdtemp(prefix="pdwx-incr-a-"))
    full = default_registry(tempfile.mkdtemp(prefix="pdwx-incr-b-"))
    try:
        inc.defs["time"].builder = lambda tt: build_time_dim(batch1.orders)
        inc.defs["sales"].builder = lambda tt: batch1.sales()
        _orig_v2 = full.defs["view2"].builder
        inc.defs["view2"].builder = lambda tt, b=batch1: _orig_v2(b)
        for n in ("time", "sales", "view2"):
            inc.build(spark, sf_dir, n)
        inc.defs["time"].builder = full.defs["time"].builder
        inc.defs["sales"].builder = full.defs["sales"].builder
        inc.defs["view2"].builder = _orig_v2
        inc.refresh_incremental(spark, sf_dir, "sales", delta)
        inc.refresh_incremental(spark, sf_dir, "view2", delta)

        for n in ("time", "sales", "view2"):
            full.build(spark, sf_dir, n)
        cols = sorted(full.read(spark, "view2").columns)
        assert _rows(inc.read(spark, "view2"), cols) == _rows(full.read(spark, "view2"), cols)
        assert _rows(inc.read(spark, "sales"), ["customerid", "timeid", "partkey", "amnt"]) == \
               _rows(full.read(spark, "sales"), ["customerid", "timeid", "partkey", "amnt"])
    finally:
        inc.drop_all()
        full.drop_all()


def test_rebuild_with_stale_dep_stays_unfresh(spark, sf_dir):
    """Freshness hole via MV deps (ADVICE r7 medium): after a base mutation,
    refresh() of a downstream MV rebuilds it from the STALE upstream MV
    parquet/cache — the registry must NOT stamp it fresh, or the rewriter
    would serve pre-mutation aggregates while is_fresh lies True.  Only a
    dependency-ordered rebuild (build_all / refresh of the stale root)
    restores the stamp."""
    import os
    import shutil

    from postgresql_datawarehouse_excercise_spark import catalog

    tmp_sf = tempfile.mkdtemp(prefix="pdwx-depfresh-sf-")
    shutil.rmtree(tmp_sf)
    shutil.copytree(sf_dir, tmp_sf)
    reg = default_registry(tempfile.mkdtemp(prefix="pdwx-depfresh-wh-"))
    try:
        reg.build_all(spark, tmp_sf)
        assert reg.is_fresh(tmp_sf, "view2")
        # base mutation: COW-delete one order's lines, swap files in place
        lp = os.path.join(tmp_sf, "lineitem.parquet")
        line = spark.read.parquet(lp)
        victim = line.select("l_orderkey").first()[0]
        line.filter(f"l_orderkey <> {victim}").write.parquet(lp + "__new")
        (os.remove if os.path.isfile(lp) else shutil.rmtree)(lp)
        os.rename(lp + "__new", lp)
        catalog._TABLES_CACHE.clear()
        # refresh ONLY the downstream MV: its dep (the sales MV) is still
        # stale, so view2's new contents derive from pre-mutation data
        reg.refresh(spark, tmp_sf, "view2")
        assert not reg.is_fresh(tmp_sf, "view2")
        # refresh from the stale ROOT rebuilds the closure downstream of
        # sales — but time (also a view2 dep) is stale too, so still no lie
        reg.refresh(spark, tmp_sf, "sales")
        assert not reg.is_fresh(tmp_sf, "view2")
        # dependency-ordered full rebuild restores freshness end-to-end
        reg.build_all(spark, tmp_sf)
        assert reg.is_fresh(tmp_sf, "view2")
        assert reg.is_fresh(tmp_sf, "view3")
    finally:
        reg.drop_all(spark)
        shutil.rmtree(tmp_sf, ignore_errors=True)
        catalog._TABLES_CACHE.clear()


def test_incremental_refresh_never_stamps_fresh(spark, sf_dir):
    """ADVICE r7 low: refresh_incremental merges delta rows passed
    IN-MEMORY — not necessarily present in the base parquet — so the MV
    must not read as fresh afterwards (a rewrite onto it could return rows
    a direct execution of the same SQL cannot see)."""
    _, delta = _date_split(spark, sf_dir)
    reg = default_registry(tempfile.mkdtemp(prefix="pdwx-incr-f-"))
    try:
        for n in ("time", "sales", "view2"):
            reg.build(spark, sf_dir, n)
        assert reg.is_fresh(sf_dir, "view2")
        reg.refresh_incremental(spark, sf_dir, "sales", delta)
        reg.refresh_incremental(spark, sf_dir, "view2", delta)
        assert not reg.is_fresh(sf_dir, "sales")
        assert not reg.is_fresh(sf_dir, "view2")
    finally:
        reg.drop_all()


def test_incremental_rejects_non_additive(spark, sf_dir):
    """avg-bearing / report MVs must refuse incremental maintenance."""
    _, delta = _date_split(spark, sf_dir)
    reg = default_registry(tempfile.mkdtemp(prefix="pdwx-incr-c-"))
    try:
        reg.build(spark, sf_dir, "time")
        reg.build(spark, sf_dir, "sales")
        reg.build(spark, sf_dir, "avg_amnt_view")
        with pytest.raises(ValueError, match="not incrementally maintainable"):
            reg.refresh_incremental(spark, sf_dir, "avg_amnt_view", delta)
    finally:
        reg.drop_all()


def test_extend_time_dim_keeps_ids_stable_under_late_dates(spark, sf_dir):
    """A late-arriving EARLY date must append a NEW id, never renumber the
    existing ones (stable surrogate keys -- the deliberate divergence from
    a full rebuild, which would shift every id after the insertion point)."""
    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.etl.time_dim import (
        build_time_dim,
        extend_time_dim,
    )

    t = catalog.load(spark, sf_dir)
    base = build_time_dim(t.orders.filter(F.col("o_orderkey") % 2 == 0))
    late = t.orders.filter(F.col("o_orderkey") % 2 == 1)
    ext = extend_time_dim(base, late)
    base_rows = {r["orderdate"]: r["timeid"] for r in base.collect()}
    ext_rows = {r["orderdate"]: r["timeid"] for r in ext.collect()}
    for d, i in base_rows.items():
        assert ext_rows[d] == i  # existing ids unchanged
    n_base = len(base_rows)
    new_ids = sorted(i for d, i in ext_rows.items() if d not in base_rows)
    assert new_ids == list(range(n_base + 1, n_base + 1 + len(new_ids)))
    # no duplicate ids, no duplicate dates
    assert len(set(ext_rows.values())) == len(ext_rows)


def test_sales_table_twin_equals_mv_and_validates(built, spark, sf_dir):
    """assignment-5.sql:90-112: the plain-table twin must hold exactly the
    MV's rows (INSERT INTO ... SELECT of the same query) and its build must
    have enforced the declared PK/NOT NULL/FK rules (write-after-validate)."""
    mv_rows = sorted(map(tuple, built.read(spark, "sales").collect()))
    tbl_rows = sorted(map(tuple, built.read(spark, "sales_table").collect()))
    assert mv_rows == tbl_rows

    # the declared constraints reject a corrupted INSERT: duplicate PK tuple
    from postgresql_datawarehouse_excercise_spark.etl import validate
    from postgresql_datawarehouse_excercise_spark.mv.definitions import _sales_table

    t = catalog_load_corrupt(spark, sf_dir)
    with pytest.raises(validate.ConstraintViolation, match="duplicate key"):
        _sales_table(t)


def catalog_load_corrupt(spark, sf_dir):
    """Tables facade whose sales() has a duplicated PK tuple."""
    from postgresql_datawarehouse_excercise_spark import catalog as cat

    base = cat.load(spark, sf_dir)
    t = cat.Tables(spark, sf_dir)
    dup = base.sales().limit(1)
    t._cache["sales"] = base.sales().unionAll(dup)
    return t


def test_incremental_extrema_measures_equal_full_rebuild(spark, sf_dir):
    """Max/min measures must survive incremental maintenance: view2_stats
    (sum + count + max + min) built from the pre-cutoff batch and merged
    with the delta must equal a full one-shot rebuild bit-for-bit -- the
    merge combines each measure with its OWN kind (max-of-max, min-of-min,
    sum-of-sum/count), never blanket SUM."""
    from postgresql_datawarehouse_excercise_spark.etl.time_dim import build_time_dim
    from postgresql_datawarehouse_excercise_spark.mv.definitions import with_count_stats

    batch1, delta = _date_split(spark, sf_dir)
    inc = with_count_stats(default_registry(tempfile.mkdtemp(prefix="pdwx-incr-x-")))
    full = with_count_stats(default_registry(tempfile.mkdtemp(prefix="pdwx-incr-y-")))
    try:
        _orig = full.defs["view2_stats"].builder
        inc.defs["time"].builder = lambda tt: build_time_dim(batch1.orders)
        inc.defs["sales"].builder = lambda tt: batch1.sales()
        inc.defs["view2_stats"].builder = lambda tt, b=batch1: _orig(b)
        for n in ("time", "sales", "view2_stats"):
            inc.build(spark, sf_dir, n)
        inc.defs["time"].builder = full.defs["time"].builder
        inc.defs["sales"].builder = full.defs["sales"].builder
        inc.defs["view2_stats"].builder = _orig
        inc.refresh_incremental(spark, sf_dir, "sales", delta)
        inc.refresh_incremental(spark, sf_dir, "view2_stats", delta)

        for n in ("time", "sales", "view2_stats"):
            full.build(spark, sf_dir, n)
        cols = sorted(full.read(spark, "view2_stats").columns)
        assert _rows(inc.read(spark, "view2_stats"), cols) == _rows(
            full.read(spark, "view2_stats"), cols
        )
    finally:
        inc.drop_all()
        full.drop_all()
