"""Plan-shape regression tests: the 100 TB design properties, pinned.

Each test asserts a structural property of the physical plan that must hold
for the query to scale -- dimension joins broadcast, scans prune columns,
predicates reach the parquet reader, per-row operators stay shuffle-free.
These mirror the reference's EXPLAIN-driven methodology (SURVEY.md §4, §6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark import catalog, plans
from postgresql_datawarehouse_excercise_spark.operators import dedup
from postgresql_datawarehouse_excercise_spark.queries import load_all

REG = load_all()


def test_best_buyers_broadcasts_dimensions(spark, sf_dir):
    """The flagship 5-way join must broadcast the small sides, never
    sort-merge (all dims fit the 64 MB threshold at any realistic SF)."""
    df = REG["q3a_best_buyers"].fn(spark, sf_dir)
    assert plans.num_broadcast_joins(df) >= 1
    assert plans.num_sortmerge_joins(df) == 0


def test_q4a_raw_vs_persisted_view_shuffle_ordering(spark, sf_dir):
    """The MV hierarchy must reduce plan work: answering best-buyers from the
    PERSISTED View2 takes strictly fewer exchanges than from raw tables.
    (Inline-derived views legitimately shuffle more -- materialization is the
    point; this mirrors BASELINE.md's raw > mart > view ordering.)"""
    import tempfile

    from postgresql_datawarehouse_excercise_spark.mv.definitions import default_registry

    reg = default_registry(tempfile.mkdtemp(prefix="pdwx-plans-wh-"))
    reg.build(spark, sf_dir, "time")
    reg.build(spark, sf_dir, "sales")
    reg.build(spark, sf_dir, "view2")
    try:
        from_view = (
            reg.read(spark, "view2")
            .groupBy("customerid")
            .agg(F.sum("amnt").alias("s"))
            .orderBy(F.col("s").desc())
            .limit(5)
        )
        raw = REG["q4a_best_buyers_raw"].fn(spark, sf_dir)
        # broadcast joins keep the shuffle count equal (one agg exchange
        # each); the MV's win is the plan it no longer contains -- scans,
        # joins, and the fact-build aggregate
        import re

        def nodes(df):
            return len(re.findall(r"^\(\d+\) ", plans.formatted_plan(df), re.MULTILINE))

        assert plans.num_shuffles(from_view) <= plans.num_shuffles(raw)
        assert nodes(from_view) < nodes(raw)
    finally:
        reg.drop_all()


def test_token_stats_prunes_columns(spark, sf_dir):
    """Text stats touch doc_id+text only; the parquet scan must not read
    lang/source/n_chars."""
    df = REG["x_text_token_stats"].fn(spark, sf_dir)
    plans.assert_reads_only(df, "doc_id", {"doc_id", "text"})


def test_events_filter_pushdown(spark, sf_dir):
    """A predicate on a stored column must reach the parquet reader."""
    t = catalog.load(spark, sf_dir)
    df = t.events.filter(F.col("event_type") == "click").select("event_id")
    plans.assert_pushed_filter(df, "event_type")


def test_minhash_signatures_single_shuffle(spark, sf_dir):
    """MinHash signatures: at most one key-forced exchange (the doc_id
    hash-aggregate, map-side combined to docs x 32 longs). The per-row
    zero-shuffle form is a CollapseProject trap that recomputes md5 32x --
    see operators/dedup.py.  When spread() fans out a small local scan, its
    repartition hashes on doc_id and the agg exchange is ELIDED (the
    exploded gram set never shuffles) -- hence data shuffles, not total."""
    t = catalog.load(spark, sf_dir)
    df = dedup.minhash_signature_df(t.documents)
    assert plans.num_data_shuffles(df) <= 1
    assert plans.num_shuffles(df) <= 2


def test_simhash_shuffle_free(spark, sf_dir):
    """The simhash fold is per-row: no key-forced exchange (spread()'s
    conditional fan-out of a small local scan is the only one allowed)."""
    t = catalog.load(spark, sf_dir)
    df = dedup.simhash_df(t.documents)
    assert plans.num_data_shuffles(df) == 0


def test_top_k_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    heaps), not a global sort -- the reference's top-N heapsort analog."""
    df = REG["q3a_best_buyers"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_whole_stage_codegen_present(spark, sf_dir):
    """Hot-path expressions must be inside codegen spans."""
    df = REG["x_text_quality"].fn(spark, sf_dir)
    assert plans.codegen_spans(df) >= 1


def test_sales_fact_prunes_lineitem_columns(spark, sf_dir):
    """The fact build must read only the 3 lineitem columns it uses (of 11)
    -- at 100 TB the scan width is the dominant cost."""
    t = catalog.load(spark, sf_dir)
    df = t.sales()
    plans.assert_reads_only(
        df, "l_orderkey", {"l_orderkey", "l_partkey", "l_quantity"}
    )


def test_asof_join_is_single_window_pass(spark, sf_dir):
    """The as-of composition must stay union + one window: no join node at
    all in the plan (the naive inequality join would show a
    BroadcastNestedLoopJoin/cartesian)."""
    df = REG["x_asof_latest_order"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Window" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_tpch_family_no_sortmerge_joins(spark, sf_dir):
    """Every TPC-H-style query must resolve its small join sides as broadcast
    hash joins AT THIS SF -- a SortMergeJoin against a slice that fits in
    memory wastes a fact shuffle.  Since the SF-scaling sides are
    deliberately un-hinted (an explicit hint would OOM at 100x; AQE promotes
    at runtime), the pin is on the FINAL post-AQE plan: the initial plan may
    show SortMergeJoin where static stats are unknown (post-aggregate
    relations), and AQE must have converted every one of them."""
    for name in sorted(n for n in REG if n.startswith("x_tpch_")):
        if name == "x_tpch_q18_bucketed":
            continue  # deliberate SMJ over co-located buckets; has its own
            # dedicated zero-shuffle pin (test_q18_bucketed_layout below)
        df = REG[name].fn(spark, sf_dir)
        if plans.num_sortmerge_joins(df) == 0:
            continue  # statically broadcast everywhere -- nothing to convert
        assert plans.final_sortmerge_joins(df) == 0, name


def test_tpch_dehinted_joins_respond_to_size_thresholds(spark, sf_dir):
    """The de-hinted join strategy must be AQE's size-based call, not a
    static pin: with default thresholds the small sides broadcast at this
    SF; with broadcast disabled (threshold -1, emulating the 100x case
    where no slice fits) every join falls back to shuffle.  A leftover
    F.broadcast hint would keep broadcasting at threshold -1 and fail
    here -- this is the runtime proof behind the no-SF-scaling-hints
    guard."""
    name = "x_tpch_q3_shipping_priority"
    df = REG[name].fn(spark, sf_dir)
    assert plans.final_broadcast_joins(df) >= 2  # customer + orders slices fit
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # build FIRST (catalog.load re-applies the default runtime confs), then
    # flip the thresholds -- physical planning happens at action time
    df2 = REG[name].fn(spark, sf_dir)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        assert plans.final_broadcast_joins(df2) == 0, "a static hint survived"
        assert plans.final_sortmerge_joins(df2) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_explain_analyze_reports_per_node_actuals(spark, sf_dir):
    """The reference's EXPLAIN ANALYZE methodology (per-node loops/rows,
    assignment-5.md:481-522) must have a real analog: after execution the
    final plan renders with ACTUAL output rows per node, and the final
    aggregate's actual equals the true group count."""
    t = catalog.load(spark, sf_dir)
    df = t.nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n"))
    report = plans.explain_analyze(df)
    assert "numOutputRows" in report and "Scan parquet" in report
    n_groups = df.count()
    actuals = plans.actual_output_rows(df, "HashAggregate")
    assert actuals and n_groups in actuals, (actuals, n_groups)


# Side-effectful families skipped by BOTH registry-wide plan guards (stream
# drains, mutations, source round-trips do real work at construction and are
# audited separately; the bloom entry eagerly builds + persists; q18_bucketed
# writes bucketed tables and is merge-hinted by design, pinned in
# test_q18_bucketed_layout).  One shared constant so the two audits can
# never drift apart.
SIDE_EFFECTFUL_PREFIXES = (
    "x_stream_", "x_mutation_", "x_source_", "x_mv_",
    "x_pipeline_incremental",
    "x_pipeline_decontaminate_bloom",
    "x_tpch_q18_bucketed",
    # returns a localCheckpoint(), so the registry guard would audit only a
    # checkpoint scan (vacuous); the REAL un-checkpointed shape is pinned in
    # test_runtime_bloom_filter_injects_in_conf_window
    "x_sql_runtime_bloom_join",
    # trains + writes the index parquet at construction; the serving plan is
    # pinned bit-identical to the audited x_sim_ann_ivfpq lane in
    # tests/test_ann_persist.py
    "x_sim_ann_index_persist",
    # writes the inverted index at construction; row-identical to the
    # audited x_text_bm25 lane (tests/test_bm25_cep.py)
    "x_text_bm25_index_persist",
    # round-12 persisted-index serving lanes: each writes its index
    # parquet at construction; serving plans are pinned against audited
    # in-plan twins (tests/test_ann_persist.py, tests/test_bm25_cep.py)
    "x_text_bm25_batch",
    "x_sim_ann_batch_serve",
    "x_sim_hybrid_rrf_persist",
    "x_text_bm25_index_refresh",
)

# Documented Arrow lanes allowed to carry Python nodes: the blocked-GEMM
# numpy kernels (operators/similarity.py -- MapInPandas over vector blocks),
# the one imperative row generator (Arrow-optimized UDTF), and the
# multimodal pandas-UDF decoders.
ARROW_LANES = {
    "x_sim_ann_ivf", "x_sim_ann_ivfpq", "x_sim_ann_ivfpq_recall",
    "x_sim_ann_index_insert",
    "x_sim_ann_index_delete",
    "x_sim_ann_pq", "x_sim_ann_pq_recall", "x_sim_ann_recall",
    "x_sim_cosine_neardup", "x_sim_semantic_dedup",
    "x_pipeline_decontaminate_semantic",
    "x_text_udtf_runs",
    "x_media_features", "x_media_frames", "x_media_metadata",
    "x_media_binary_dedup",
    # AFTER MATCH SKIP PAST LAST ROW: the greedy leftmost non-overlapping
    # chain is a per-user sequential fold -- one applyInPandas over
    # user_id groups (operators/cep.cep_match_skip_past)
    "x_events_cep_skip_past",
    # AFTER MATCH SKIP TO FIRST/LAST: the same per-user sequential fold
    # with the prefix-sum resume locator (operators/cep.cep_match_skip_to)
    "x_events_cep_skip_to_first",
    "x_events_cep_skip_to_last",
}


def test_registry_plan_guards(spark, sf_dir):
    """One sweep, two registry-wide pins (each entry is constructed ONCE --
    several do eager training/checkpoint work at construction):

    1. NO lazy entry may pin an EXPLICIT broadcast hint onto a relation
       that SCALES WITH SF (an explicit hint overrides the size threshold
       and AQE never demotes it -- at 100x a filtered slice of such a table
       is tens of GB and the hint OOMs every executor).  That is not just
       orders/lineitem: customer, part, supplier, events, documents and
       embeddings all grow linearly; only nation/region are constant.
       Hints over an Aggregate / Deduplicate / Limit of a scaling relation
       are allowed: the broadcast payload is the reduced output.

    2. UDF discipline: row-at-a-time Python (BatchEvalPython, including
       the non-Arrow UDTF fallback) is banned EVERYWHERE -- whitelist
       included; any other Python boundary (ArrowEvalPython, MapInPandas,
       grouped/window/cogrouped pandas, PythonMapInArrow) may appear only
       in the documented ARROW_LANES."""
    import re

    row_udf = re.compile(r"^\(\d+\) BatchEvalPython", re.MULTILINE)
    python_node = re.compile(
        r"^\(\d+\) (\w*EvalPython\w*|MapInPandas|PythonMapInArrow|"
        r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|AggregateInPandas|"
        r"WindowInPandas)",
        re.MULTILINE,
    )
    for name in sorted(REG):
        if name.startswith(SIDE_EFFECTFUL_PREFIXES):
            continue
        df = REG[name].fn(spark, sf_dir)
        offenders = plans.fact_broadcast_hints(df)
        assert not offenders, f"{name}: static broadcast hint on fact-side {offenders}"
        plan = plans.formatted_plan(df)
        assert not row_udf.search(plan), f"{name}: row-at-a-time Python UDF"
        if name not in ARROW_LANES:
            m = python_node.search(plan)
            assert not m, f"{name}: unexpected Python node {m.group(0) if m else ''}"


def test_tpch_q1_single_shuffle_with_pushed_filter(spark, sf_dir):
    """Q1: one exchange (the 6-group aggregate; partials map-side) and the
    shipdate predicate at the parquet reader."""
    df = REG["x_tpch_q1_pricing_summary"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) == 1
    plans.assert_pushed_filter(df, "l_shipdate")


def test_tpch_q6_scan_only_all_bands_pushed(spark, sf_dir):
    """Q6: all three band predicates (shipdate, discount, quantity) must
    reach the parquet reader -- row-group pruning does the work at scale."""
    df = REG["x_tpch_q6_revenue_forecast"].fn(spark, sf_dir)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        plans.assert_pushed_filter(df, col)


def test_tpch_q19_disjunction_decomposed_to_scans(spark, sf_dir):
    """Q19: Catalyst must derive per-table prefilters from the OR-of-ANDs
    (quantity bands onto lineitem, brand/size bands onto part) instead of
    evaluating the whole disjunction post-join."""
    df = REG["x_tpch_q19_disjunctive_bands"].fn(spark, sf_dir)
    pushed = " | ".join(plans.pushed_filters(df))
    assert "l_quantity" in pushed and "p_brand" in pushed and "p_size" in pushed


def test_tpch_topk_uses_take_ordered(spark, sf_dir):
    """Q3/Q10 top-k: TakeOrderedAndProject, never a global sort."""
    for name in ("x_tpch_q3_shipping_priority", "x_tpch_q10_returned_items"):
        df = REG[name].fn(spark, sf_dir)
        plan = plans.formatted_plan(df)
        assert "TakeOrderedAndProject" in plan, name


def test_tpch_q21_no_self_join_single_fact_shuffle(spark, sf_dir):
    """Q21: the per-order supplier/late counts must come from window
    aggregates over the (order, supplier) aggregate's own partitioning --
    no self-join of the aggregate (the join formulation doubles the
    orderkey shuffle and sort-merges at scale)."""
    df = REG["x_tpch_q21_late_sole_supplier"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Window" in plan
    assert plans.num_sortmerge_joins(df) == 0
    # exchanges: groupBy(ok, sk) + window repartition(ok); the final 10-row
    # top-k is TakeOrderedAndProject, not a sort exchange
    assert plans.num_shuffles(df) <= 3
    assert "TakeOrderedAndProject" in plan


def test_tpch_q2_prefilters_fact_and_prunes_lineitem(spark, sf_dir):
    """Q2: the part/supplier prefilters must broadcast onto lineitem BEFORE
    the (part, supplier) aggregate (the scan feeding the agg reads only the
    3 needed lineitem columns), and the argmin-per-part resolves as a
    broadcast back -- no window re-shuffle of the fact, no sort-merge."""
    df = REG["x_tpch_q2_min_cost_supplier"].fn(spark, sf_dir)
    plans.assert_reads_only(
        df, "l_extendedprice", {"l_partkey", "l_suppkey", "l_extendedprice"}
    )
    # the part/supplier sides are un-hinted (SF-scaling), so the broadcast
    # resolution is AQE's at runtime: pin the FINAL plan
    assert plans.final_sortmerge_joins(df) == 0
    assert plans.final_broadcast_joins(df) >= 4


def test_tpch_q11_single_fact_shuffle_scalar_broadcast(spark, sf_dir):
    """Q11: one exchange for the per-part aggregate; the grand total joins
    back as a 1-row broadcast (nested-loop on a scalar is fine), never a
    shuffled join."""
    df = REG["x_tpch_q11_important_parts"].fn(spark, sf_dir)
    assert plans.num_sortmerge_joins(df) == 0
    # the formatted plan lists the per-part agg exchange twice (once under
    # the scalar total, once under the probe side -- ReuseExchange dedupes
    # it at runtime), plus the scalar's single-partition gather and the
    # output sort: 4 Exchange nodes, only 2 distinct fact-bearing shuffles
    assert plans.num_shuffles(df) <= 4


def test_tpch_q16_anti_join_broadcast(spark, sf_dir):
    """Q16: the NOT-IN exclusion must run as a broadcast anti join on the
    fact scan -- an order-dependent shuffled anti join would move all of
    lineitem once more at 100 TB."""
    plan = plans.formatted_plan(REG["x_tpch_q16_supplier_part_counts"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q20_pushed_shipyear_and_window_over_own_agg(spark, sf_dir):
    """Q20: the ship-year slice must reach the parquet reader, and the
    half-share test must be a window over the (supplier, part) aggregate's
    output -- not a second aggregate self-joined back."""
    df = REG["x_tpch_q20_dominant_suppliers"].fn(spark, sf_dir)
    plans.assert_pushed_filter(df, "l_shipdate")
    assert "Window" in plans.formatted_plan(df)
    assert plans.num_sortmerge_joins(df) == 0


def test_tpch_q13_preaggregates_before_outer_join(spark, sf_dir):
    """Q13: orders must collapse to per-customer counts BEFORE the outer
    join -- the aggregate has to appear under the join in the plan, so the
    join moves one row per customer, not one per order."""
    import re

    plan = plans.formatted_plan(REG["x_tpch_q13_customer_distribution"].fn(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    agg_lines = [i for i, ln in enumerate(tree.splitlines()) if "HashAggregate" in ln]
    join_lines = [i for i, ln in enumerate(tree.splitlines()) if re.search(r"Join", ln)]
    assert join_lines and agg_lines
    # at least one aggregate sits below (after, in formatted tree order) the
    # outer join node: the per-customer count feeding the join's right side
    assert max(agg_lines) > min(join_lines)


def test_unpivot_is_mapside_expand(spark, sf_dir):
    """UNPIVOT must be a pure map-side Expand over the scan: rows fan out
    4x inside the input partition with ZERO exchanges."""
    df = REG["x_sql_unpivot"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Expand" in plan
    assert plans.num_shuffles(df) == 0


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """Decontamination must probe the eval-gram set via broadcast -- a
    shuffled join here would move every train-side gram (the whole corpus
    re-keyed) at 100 TB."""
    df = REG["x_pipeline_decontaminate"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert plans.num_broadcast_joins(df) >= 1
    assert "CartesianProduct" not in plan


def test_shuffle_shards_window_is_partitioned(spark, sf_dir):
    """The epoch shuffle must never gather to one partition: the position
    window is partitioned by shard (64 independent sorts), so the plan has
    no SinglePartition exchange."""
    df = REG["x_pipeline_shuffle_shards"].fn(spark, sf_dir)
    assert "SinglePartition" not in plans.formatted_plan(df)


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    """Sequence packing cumsums per source -- the window exchange must hash
    on the partition key, not collapse to a single partition."""
    df = REG["x_pipeline_pack_sequences"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_string_datetime_surfaces_shuffle_free(spark, sf_dir):
    """Per-row function surfaces must stay inside one codegen stage: no
    exchange, no UDF nodes (everything is a JVM expression)."""
    for name in ("x_sql_strings", "x_sql_datetime"):
        df = REG[name].fn(spark, sf_dir)
        assert plans.num_shuffles(df) == 0, name
        assert "BatchEvalPython" not in plans.formatted_plan(df), name


def test_repetition_is_single_scan_no_shuffle(spark, sf_dir):
    """x_text_repetition is pure row-level array math: its plan must be one
    pruned scan (doc_id, text) with ZERO exchanges -- the shape that scales
    linearly with input splits."""
    df = REG["x_text_repetition"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) == 0
    plans.assert_reads_only(df, "doc_id", {"doc_id", "text"})


def test_canonical_docs_window_is_key_partitioned(spark, sf_dir):
    """Canonical selection's ranking window must partition by cluster_id --
    never collapse to a single partition (the all-data-to-one-task shape
    that dies at scale)."""
    df = REG["x_pipeline_canonical_docs"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, plan[:1500]


def test_pii_redact_single_scan_no_shuffle(spark, sf_dir):
    """PII redaction is a pure map (regexp chain in one codegen stage):
    zero exchanges, no Python UDF nodes, scan pruned to (doc_id, text)."""
    df = REG["x_text_pii_redact"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) == 0
    assert "BatchEvalPython" not in plans.formatted_plan(df)
    plans.assert_reads_only(df, "doc_id", {"doc_id", "text"})


def test_gap_fill_broadcasts_spine_no_sortmerge(spark, sf_dir):
    """Gap fill's grid construction must stay broadcast-shaped (the spine
    and type dimensions are tiny by construction) and the raw events scan
    must run exactly once: every branch reads the lazily-checkpointed
    hourly aggregate (ExistingRDD), never events parquet directly -- the
    |events|-sized work is the single hourly aggregate, nothing else."""
    df = REG["x_events_gap_fill"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert plans.num_sortmerge_joins(df) == 0
    assert plans.num_broadcast_joins(df) + p.count("BroadcastNestedLoopJoin") >= 2
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p


def test_semantic_dedup_pairs_stay_cluster_keyed(spark, sf_dir):
    """SemDeDup's pairwise comparison must form only WITHIN clusters: the
    self-join is keyed on cluster id (per-cluster parallel at scale), never
    a cartesian/nested-loop over the corpus, and never a single-partition
    gather."""
    df = REG["x_sim_semantic_dedup"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_kmeans_centroids_broadcast_never_shuffled(spark, sf_dir):
    """The K-row centroid relation must reach the vector scan as a
    broadcast (nested-loop cross join); a shuffled/sort-merge centroid
    join would shuffle the full vector set once per iteration."""
    df = REG["x_sim_kmeans"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in p
    assert plans.num_sortmerge_joins(df) == 0
    assert "BatchEvalPython" not in p
    # argmin is a map-side-combining MIN(struct), never a ranking window
    # sorting the K-expanded rows
    assert "Window" not in p


def test_bucketed_join_eliminates_input_shuffles(spark, sf_dir):
    """Co-located bucketed layout: the fact-fact merge join over tables
    bucketed (and sorted) on the join key must contain ZERO shuffle
    exchanges on its inputs -- the write-time shuffle is amortized across
    every subsequent join -- while the identical unbucketed join shuffles
    both sides."""
    import tempfile
    import uuid

    t = catalog.load(spark, sf_dir)
    tag = uuid.uuid4().hex[:8]
    loc = tempfile.mkdtemp(prefix="pdwx-bkt-plan-")
    lt, ot = f"pdwx_pbl_{tag}", f"pdwx_pbo_{tag}"
    try:
        from postgresql_datawarehouse_excercise_spark.sources import files

        files.write_bucketed(
            t.lineitem.select("l_orderkey", "l_extendedprice"),
            lt, f"{loc}/{lt}", "l_orderkey",
        )
        files.write_bucketed(
            t.orders.select("o_orderkey", "o_orderpriority"),
            ot, f"{loc}/{ot}", "o_orderkey",
        )
        bucketed = spark.table(lt).hint("merge").join(
            spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert plans.num_shuffles(bucketed) == 0
        assert plans.num_sortmerge_joins(bucketed) == 1
        plain = t.lineitem.select("l_orderkey", "l_extendedprice").hint("merge").join(
            t.orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert plans.num_shuffles(plain) == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        import shutil

        shutil.rmtree(loc, ignore_errors=True)


def test_q18_bucketed_layout_agg_and_join_shuffle_free(spark, sf_dir):
    """x_tpch_q18_bucketed's claim, pinned on the un-checkpointed shape:
    with lineitem and orders bucketed on the order key, the HAVING
    aggregate AND the big-orders join contain ZERO shuffle exchanges --
    the bucketed scan satisfies the aggregate's distribution, and the
    aggregate's output partitioning co-locates with the orders buckets.
    (The plain Q18 pays a full lineitem exchange for the same aggregate.)"""
    import tempfile
    import uuid

    t = catalog.load(spark, sf_dir)
    tag = uuid.uuid4().hex[:8]
    loc = tempfile.mkdtemp(prefix="pdwx-q18bkt-plan-")
    lt, ot = f"pdwx_pq18l_{tag}", f"pdwx_pq18o_{tag}"
    try:
        from postgresql_datawarehouse_excercise_spark.sources import files

        files.write_bucketed(
            t.lineitem.select("l_orderkey", "l_quantity"),
            lt, f"{loc}/{lt}", "l_orderkey",
        )
        files.write_bucketed(
            t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            ot, f"{loc}/{ot}", "o_orderkey",
        )
        big = (
            spark.table(lt)
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
            .filter(F.col("q") > 250)
        )
        assert plans.num_shuffles(big) == 0  # bucketing IS the distribution
        joined = big.hint("merge").join(
            spark.table(ot), big.l_orderkey == F.col("o_orderkey")
        )
        assert plans.num_shuffles(joined) == 0
        assert plans.num_sortmerge_joins(joined) == 1
        # the plain layout pays the lineitem exchange for the same aggregate
        plain = (
            t.lineitem.select("l_orderkey", "l_quantity")
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
            .filter(F.col("q") > 250)
        )
        assert plans.num_shuffles(plain) == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        import shutil

        shutil.rmtree(loc, ignore_errors=True)


def test_pca_projection_pass_is_shuffle_free(spark, sf_dir):
    """The PCA entry's RETURNED plan is the final projection pass only
    (covariance/power iteration resolve to literal constants at plan
    time): one vector scan, the eigenvector inlined as a literal array,
    no Exchange and no join -- the map-only shape that scales to any
    corpus size."""
    df = REG["x_sim_pca_power"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "Exchange" not in p
    assert "Join" not in p


def test_incremental_dedup_probe_stays_bucket_keyed(spark, sf_dir):
    """Ingest-time dedup must probe the corpus through the (band, bucket)
    index join -- never a cartesian pairing of batch x corpus and never a
    single-partition gather."""
    df = REG["x_dedup_incremental"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "CartesianProduct" not in p
    assert "Exchange SinglePartition" not in p


def test_scd2_pointintime_rides_the_equi_join(spark, sf_dir):
    """The point-in-time join's interval predicate must ride the EQUI hash
    join on the dimension key as a residual filter; a
    BroadcastNestedLoopJoin/CartesianProduct would mean Catalyst saw only
    the range condition and the shape dies at scale."""
    df = REG["x_pipeline_scd2_pointintime"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """The OTHER half of the skew story (x_pipeline_salted_hot_keys covers
    aggregation): a hot JOIN key must be handled by AQE's runtime skew-join
    split -- the executed plan carries SortMergeJoin(skew=true) over an
    AQEShuffleRead skewed, proving the engine's session confs leave AQE
    free to re-plan skew instead of a static hint pinning the strategy.
    Thresholds are lowered test-locally (and restored) so the sf-free
    synthetic hot key trips detection at test scale."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 4 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k")
        j._jdf.queryExecution().toRdd().count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_udf_scalar_inlines_no_python_boundary(spark, sf_dir):
    """The SQL UDF entry must show the EXPANDED expression in the plan --
    no BatchEvalPython, one aggregate exchange, and a 2-column pruned
    scan (the analysis-time inlining that makes CREATE FUNCTION free)."""
    df = REG["x_sql_udf_scalar"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "BatchEvalPython" not in p
    assert plans.num_shuffles(df) == 1
    assert "o_orderstatus" in p and "o_totalprice" in p


def test_substring_spans_all_jvm_partitioned_windows(spark, sf_dir):
    """Span dedup is pure DataFrame ops: no Python nodes anywhere, and the
    per-doc span-merge windows hash on doc_id -- never a single-partition
    global sort (the shape that would serialize 100 TB through one task)."""
    df = REG["x_dedup_substring_spans"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "BatchEvalPython" not in p
    assert "Window" in p
    assert "SinglePartition" not in p


def test_unigram_logprob_all_jvm(spark, sf_dir):
    """Corpus-LM scoring stays JVM-side end-to-end (the only float op is
    ln, quantized to integer micro-nats before any aggregation)."""
    df = REG["x_text_unigram_logprob"].fn(spark, sf_dir)
    assert "BatchEvalPython" not in plans.formatted_plan(df)


def test_winnowing_all_jvm_partitioned_window(spark, sf_dir):
    """Winnowing is pure DataFrame ops: no Python nodes, and the selection
    window hashes on doc_id -- never a single-partition global sort."""
    df = REG["x_dedup_winnowing"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "BatchEvalPython" not in p
    assert "Window" in p
    assert "SinglePartition" not in p


def test_triangles_no_cartesian_or_nested_loop(spark, sf_dir):
    """The oriented wedge joins stay hash equi joins -- a nested-loop or
    cartesian node here means the orientation filter fell out of the
    join condition."""
    df = REG["x_dedup_triangles"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "BatchEvalPython" not in p


def test_interval_overlap_is_equi_join_on_bucket(spark, sf_dir):
    """The interval x interval join must ride the bucket EQUI join with the
    overlap predicate as a residual filter -- the whole point of the
    decomposition is keeping theta semantics off the nested-loop path."""
    df = REG["x_range_interval_overlap"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "_bk" in p


def test_prefix_join_and_lsh_recall_all_jvm(spark, sf_dir):
    """Exact similarity join + its recall evaluator: hash joins and JVM
    expressions only."""
    for name in ("x_dedup_prefix_join", "x_dedup_lsh_recall"):
        p = plans.formatted_plan(REG[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, name
        assert "CartesianProduct" not in p, name


def test_selection_and_sketch_entries_all_jvm(spark, sf_dir):
    """PMI / Moore-Lewis / count-min / Zipf / balanced sample / media
    dedup: vocabulary- or sketch-bound aggregates, zero Python boundary."""
    for name in (
        "x_text_pmi_bigrams",
        "x_text_moore_lewis",
        "x_text_countmin_hh",
        "x_text_zipf_fit",
        "x_pipeline_cluster_balanced",
        "x_media_binary_dedup",
        "x_dedup_kcore",
    ):
        p = plans.formatted_plan(REG[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, name


def test_markov_rfm_rake_streamcms_all_jvm(spark, sf_dir):
    """The newest analytics entries stay JVM-side with partitioned windows
    (markov) or broadcast one-row boundary relations (rfm)."""
    for name in ("x_events_markov_transitions", "x_events_rfm",
                 "x_text_rake_phrases"):
        p = plans.formatted_plan(REG[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, name
        assert "CartesianProduct" not in p, name
    p = plans.formatted_plan(REG["x_events_markov_transitions"].fn(spark, sf_dir))
    assert "SinglePartition" not in p


def test_runtime_bloom_filter_injects_in_conf_window(spark, sf_dir):
    """x_sql_runtime_bloom_join's claim, pinned on the un-checkpointed
    shape: with broadcast off and the application-side threshold lifted,
    InjectRuntimeFilter must add the bloom build aggregate over the
    filtered orders keys AND the might_contain probe on the lineitem side;
    with default confs the same join broadcasts and no filter injects
    (the runtime filter only guards shuffle joins)."""
    t = catalog.load(spark, sf_dir)

    def shape():
        return (
            t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"))
        )

    # default regime: broadcast, no injection
    p0 = plans.formatted_plan(shape())
    assert "might_contain" not in p0
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        p1 = plans.formatted_plan(shape())
        assert "bloom_filter_agg" in p1  # build side: filtered orders keys
        assert "might_contain" in p1    # probe side: lineitem pre-shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_market_basket_keyed_self_join_no_cartesian(spark, sf_dir):
    """The pair generator must stay a hash equi join keyed by the order key
    (fanout bounded by basket size squared) and the top-k must compile to
    TakeOrderedAndProject -- a cartesian or global sort here would not
    survive a 100x basket corpus."""
    df = REG["x_sql_market_basket"].fn(spark, sf_dir)
    p = plans.formatted_plan(df)
    assert "CartesianProduct" not in p
    # exactly ONE nested-loop node: the accepted broadcast 1-row scalar
    # (order total) cross join -- the pair self-join must not be another
    assert plans._count_nodes(df, "BroadcastNestedLoopJoin") == 1
    assert "TakeOrderedAndProject" in p




def test_salted_join_shuffle_hash_no_fact_broadcast(spark, sf_dir):
    """x_pipeline_salted_join's physical shape: the (key, _salt) join is a
    ShuffledHashJoin (the replicated dim must NOT broadcast -- at salting
    scale it no longer fits, and the hint models that), while the tiny
    hot-key marker joins stay broadcast.  The fact side is never the
    build side of any broadcast."""
    q = load_all()["x_pipeline_salted_join"]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin [event_type" in plan and "_salt" in plan
    # the salted join itself must not be a broadcast join: every
    # BroadcastHashJoin in the plan is a LeftOuter hot-key marker probe
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "LeftOuter" in line, line


def test_sequence_packing_no_global_window(spark, sf_dir):
    """x_pipeline_sequence_packing's point: a GLOBAL cumulative sum with
    NO single-partition exchange anywhere -- the running sums are
    bucket-partitioned windows plus a broadcast of the <=32-row bucket
    offsets (one hash exchange on the bucket key, one broadcast
    exchange, zero `Exchange SinglePartition` nodes)."""
    df = REG["x_pipeline_sequence_packing"].fn(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan
    assert "Window" in plan
