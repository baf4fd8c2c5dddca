"""Extended-SQL-surface semantics that the DuckDB value-hash gate can't pin:
approximate-distinct accuracy, and set-op/rollup invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalog
from postgresql_datawarehouse_excercise_spark.queries import load_all

REG = load_all()


def test_approx_distinct_within_2pct(spark, sf_dir):
    t = catalog.load(spark, sf_dir)
    approx = {
        r.o_orderpriority: r.approx_customers
        for r in t.orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"))
        .collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in t.orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        assert rel_err < 0.02, (k, approx[k], exact[k])
    # The registry entry exposes the oracle-checkable form: exact count plus
    # the 5% accuracy-bound boolean (must be uniformly true).
    rows = REG["x_sql_approx_distinct"].fn(spark, sf_dir).collect()
    assert {r.o_orderpriority: r.exact_customers for r in rows} == exact
    assert all(r.within_5pct for r in rows)


def test_rollup_grand_total_matches_plain_agg(spark, sf_dir):
    rows = REG["x_sql_rollup"].fn(spark, sf_dir).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    t = catalog.load(spark, sf_dir)
    assert grand[0].n_items == t.lineitem.count()


def test_setops_partition_building_segment(spark, sf_dir):
    """INTERSECT + EXCEPT partition the BUILDING segment exactly."""
    rows = REG["x_sql_setops"].fn(spark, sf_dir).collect()
    t = catalog.load(spark, sf_dir)
    n_building = t.customer.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert len(rows) == n_building
    assert len({r.c_custkey for r in rows}) == n_building


def test_left_join_keeps_orderless_customers(spark, sf_dir):
    rows = REG["x_sql_left_join_zero_counts"].fn(spark, sf_dir).collect()
    t = catalog.load(spark, sf_dir)
    assert len(rows) == t.customer.count()
    # anti-join = customers with no IN-PROGRESS order (kept non-empty at
    # every SF); cross-check it against the direct NOT-IN computation
    anti = REG["x_sql_anti_join"].fn(spark, sf_dir).count()
    with_p = {
        r[0]
        for r in t.orders.filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert anti == t.customer.count() - sum(
        1 for r in rows if r.c_custkey in with_p
    )


def test_ann_variants_are_subsets_of_bruteforce_ranking(spark, sf_dir):
    """LSH and IVF return true cosine values: each approximate result must
    appear in the exact ranking with the identical score (approximation
    affects recall, never correctness of returned scores)."""
    from postgresql_datawarehouse_excercise_spark.operators import similarity

    t = __import__(
        "postgresql_datawarehouse_excercise_spark.catalog", fromlist=["load"]
    ).load(spark, sf_dir)
    exact = {
        r.vec_id: r.cos_sim
        for r in similarity.cosine_topk(t.embeddings, 0, k=1 << 30).collect()
    }
    for variant in (similarity.ann_lsh_topk, similarity.ann_ivf_topk):
        for r in variant(t.embeddings, 0).collect():
            assert exact[r.vec_id] == r.cos_sim, (variant.__name__, r)


def test_ann_ivf_recall_and_candidate_bound(spark, sf_dir):
    """The production ANN must actually ANSWER: mean recall@10 >= 0.8 on
    the evaluation set (the round-5 single-bucket LSH scored 0.0-0.4 here)
    while probing a bounded fraction of the corpus -- the candidate set per
    query stays ~nprobe/ncells, never a hidden full scan."""
    from postgresql_datawarehouse_excercise_spark.operators import similarity

    t = __import__(
        "postgresql_datawarehouse_excercise_spark.catalog", fromlist=["load"]
    ).load(spark, sf_dir)
    rec = similarity.ann_recall(t.embeddings).collect()
    assert len(rec) == similarity.KNN_QUERIES
    mean_recall = sum(float(r.recall) for r in rec) / len(rec)
    assert mean_recall >= 0.8, [(r.query_id, float(r.recall)) for r in rec]
    # candidate bound: pairs surviving the probed-cell join, per query.
    # The index configuration is N-derived (ivf_cells/ivf_nprobe), so the
    # test derives it the same way the operator does.
    base = similarity._ivf_base(t.embeddings)
    n = t.embeddings.count()
    cells = similarity.ivf_cells(n)
    cents, assigned = similarity._ivf_train(base, cells)
    from pyspark.sql import functions as F

    q = base.filter(F.col("vec_id") < similarity.KNN_QUERIES).limit(
        similarity.KNN_QUERIES
    ).select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv"))
    qcells = similarity._probe_cells(q, cents, similarity.ivf_nprobe(cells))
    cand_pairs = assigned.join(qcells, "cell").count()
    frac = cand_pairs / (similarity.KNN_QUERIES * n)
    assert frac <= 0.5, f"candidate fraction {frac:.2%} -- index degenerated to a scan"


def test_spark_sql_entry_point_natural_join(spark, sf_dir):
    """The reference user writes SQL: registered views must support the
    reference's NATURAL JOIN formulation verbatim (SURVEY §2-C1) and agree
    with the DataFrame path."""
    catalog.register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT customerid, SUM(amnt) AS spending
        FROM sales NATURAL JOIN time
        WHERE year = 1997
        GROUP BY customerid
        ORDER BY spending DESC, customerid ASC
        LIMIT 5
        """
    ).collect()
    t = catalog.load(spark, sf_dir)
    from pyspark.sql import functions as F

    want = (
        t.sales()
        .join(t.time_dim().filter(F.col("year") == 1997).select("timeid"), "timeid")
        .groupBy("customerid")
        .agg(F.sum("amnt").alias("spending"))
        .orderBy(F.col("spending").desc(), F.col("customerid").asc())
        .limit(5)
        .collect()
    )
    assert [(r.customerid, r.spending) for r in got] == [
        (r.customerid, r.spending) for r in want
    ]


def test_runtime_confs_applied_to_foreign_session(spark):
    """The driver hands us ITS session: apply_runtime_confs must have set
    the semantics-critical confs (UTC casts, nanos handling, AQE)."""
    from postgresql_datawarehouse_excercise_spark.session import RUNTIME_CONFS

    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.legacy.parquet.nanosAsLong",
    ):
        assert spark.conf.get(k) == RUNTIME_CONFS[k]


def test_funnel_stages_monotone(spark, sf_dir):
    """Each funnel stage is a strict subset of the previous one."""
    row = REG["x_events_funnel"].fn(spark, sf_dir).first()
    assert row.n_viewed >= row.n_clicked_after_view >= row.n_purchased_after_click >= 0


def test_retention_day0_equals_cohort_sizes(spark, sf_dir):
    """Every user is active on their own first-seen day, so the offset-0
    diagonal of the retention triangle IS the cohort-size column."""
    ret = REG["x_events_retention_cohorts"].fn(spark, sf_dir)
    day0 = {r.cohort_day: r.n_users for r in ret.filter(F.col("day_offset") == 0).collect()}
    t = catalog.load(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    cohorts = (
        t.events.groupBy("user_id")
        .agg(F.min(day).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert day0 == {r.cohort_day: r.n for r in cohorts}


def test_vocab_df_bounded_by_tf_and_corpus(spark, sf_dir):
    """Document frequency can never exceed term frequency or the doc count."""
    t = catalog.load(spark, sf_dir)
    n_docs = t.documents.count()
    for r in REG["x_text_vocab_top50"].fn(spark, sf_dir).collect():
        assert 1 <= r.df_docs <= r.tf
        assert r.df_docs <= n_docs


def test_knn_join_ranking_is_consistent(spark, sf_dir):
    """Per query: ranks are 1..k, similarity is non-increasing in rank and
    within [-1, 1], and the rank-1 neighbour matches the single-query
    brute-force operator's answer for vec_id 0."""
    rows = REG["x_sim_knn_join"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cos_sim for r in rs]
        assert all(-1.0 <= s <= 1.0 for s in sims)
        assert sims == sorted(sims, reverse=True)
    top1_q0 = next(r for r in by_q[0] if r.rn == 1)
    brute = REG["x_sim_topk_bruteforce"].fn(spark, sf_dir).first()
    assert (top1_q0.vec_id, top1_q0.cos_sim) == (brute.vec_id, brute.cos_sim)


def test_quality_gate_bounded_by_english_corpus(spark, sf_dir):
    """The cleaning gate only removes rows: survivors are bounded by the
    English slice, and every reported source actually exists."""
    t = catalog.load(spark, sf_dir)
    en = t.documents.filter(F.col("lang") == "en")
    n_en = en.count()
    rows = REG["x_pipeline_quality_gate"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) <= n_en
    sources = {r.source for r in t.documents.select("source").distinct().collect()}
    assert {r.source for r in rows} <= sources


def test_hll_sketch_estimate_and_regime(spark, sf_dir):
    """The hand-built HLL's estimate lands within ~2 standard errors
    (1.04/sqrt(256) ~ 6.5% SE -> 13% bound), the shard-merge reproduces the
    direct registers exactly, and the input keeps the estimate above the
    linear-counting threshold 2.5*m that the entry deliberately excludes."""
    row = REG["x_sql_hll_sketch"].fn(spark, sf_dir).collect()[0]
    assert row.merged_equals_direct
    assert row.exact_keys > 0
    rel_err = abs(row.hll_estimate - row.exact_keys) / row.exact_keys
    assert rel_err < 0.13, (row.hll_estimate, row.exact_keys)
    assert row.hll_estimate > 2.5 * 256  # out of the ln()-based correction regime
    assert 0 < row.nonzero_registers <= 256


def test_histogram_sketch_error_bounded_and_merge_proof(spark, sf_dir):
    """The histogram quantile estimate must land within ONE bucket width of
    the rank-floor(q*(n-1))+1 ORDER STATISTIC -- the sketch's true bound:
    that value lies inside the bucket the cumulative counts selected.  (The
    entry's exact_p* columns interpolate toward the NEXT order statistic,
    which on a sparse tail can sit buckets higher, so they are reported
    context, not the bound.)  The shard-merge proof column must be True."""
    import math

    from postgresql_datawarehouse_excercise_spark.queries.x_sql_surface import HIST_B

    row = REG["x_sql_histogram_sketch"].fn(spark, sf_dir).collect()[0]
    assert row.merged_equals_direct is True
    assert 0 < row.nonzero_buckets <= HIST_B
    t = catalog.load(spark, sf_dir)
    cents = sorted(
        r.c
        for r in t.lineitem.select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
        ).collect()
    )
    n = len(cents)
    lo, hi = cents[0], cents[-1]
    width = ((hi - lo) // HIST_B + 1) / 100.0
    for q, label in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        k1 = math.floor(q * (n - 1)) + 1  # 1-based target rank
        stat = cents[k1 - 1] / 100.0
        est = getattr(row, f"est_{label}")
        assert abs(est - stat) <= width + 0.01, (label, est, stat, width)
