"""Property-based invariants (hypothesis) for the semantics the oracle gate
can't sweep: decimal-sum partition independence, session-window formation
against a pure-Python model, salted aggregation equivalence, and the
weighted-average reconstruction identity on arbitrary groupings."""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from postgresql_datawarehouse_excercise_spark.functions import dec
from postgresql_datawarehouse_excercise_spark.operators.skew import salted_sum

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

amounts = st.lists(
    st.decimals(min_value="-9999.99", max_value="9999.99", places=2),
    min_size=1,
    max_size=60,
)


@SLOW
@given(values=amounts, parts=st.integers(min_value=1, max_value=7))
def test_decimal_sum_is_partition_independent(spark, values, parts):
    """The money discipline's core claim: DECIMAL sums give the same result
    under any partitioning (double sums would not be bit-stable)."""
    schema = StructType([StructField("v", DecimalType(10, 2))])
    df = spark.createDataFrame([(v,) for v in values], schema).repartition(parts)
    got = df.agg(F.sum(dec("v")).alias("s")).first().s
    assert got == sum(values)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user
        st.integers(min_value=0, max_value=7200),     # seconds offset
    ),
    min_size=1,
    max_size=50,
)


@SLOW
@given(evs=events_strategy)
def test_session_window_matches_python_model(spark, evs):
    """Spark's session_window (gap 300s) against a direct sessionizer:
    same session count and same per-session event counts."""
    base = datetime(2020, 1, 1)
    rows = [(u, base + timedelta(seconds=s)) for u, s in evs]
    schema = StructType(
        [StructField("u", IntegerType()), StructField("ts", TimestampType())]
    )
    df = spark.createDataFrame(rows, schema)
    got = sorted(
        (r.u, r.n)
        for r in df.groupBy(F.session_window("ts", "300 seconds"), "u")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    model: list[tuple[int, int]] = []
    by_user: dict[int, list[datetime]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        count = 0
        prev = None
        for ts in tss:
            # STRICTLY greater: Spark merges an event landing exactly at
            # prev + gap into the running session (boundary pinned by the
            # falsifying example evs=[(1, 0), (1, 300)], round 13)
            if prev is not None and (ts - prev).total_seconds() > 300:
                model.append((u, count))
                count = 0
            count += 1
            prev = ts
        model.append((u, count))
    assert got == sorted(model)


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.decimals(min_value="0.01", max_value="999.99", places=2),
        ),
        min_size=1,
        max_size=40,
    ),
    buckets=st.integers(min_value=1, max_value=8),
)
def test_salted_sum_equals_plain_sum(spark, rows, buckets):
    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", DecimalType(10, 2))]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r.k: r.s for r in salted_sum(df, ["k"], dec("v"), "s", buckets).collect()
    }
    want: dict[int, Decimal] = {}
    for k, v in rows:
        want[k] = want.get(k, Decimal(0)) + v
    assert got == want


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.decimals(min_value="0.01", max_value="99.99", places=2),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_average_reconstruction(spark, rows):
    """sum(group_avg * group_count) / sum(group_count) == global average:
    the reference's Q2 lesson, on arbitrary data.

    Unlike Postgres's arbitrary-precision numeric, Spark's avg(decimal(10,2))
    quantizes to 6 decimal places (decimal(14,6)), so reconstruction and
    direct average can each be off by half an ulp, plus the final division's
    own rounding: the bound is ~1.5e-6, NOT exact equality (SURVEY.md §7.3
    D4 -- hypothesis found the 1.0e-6 counterexample to a 1e-9 bound)."""
    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", DecimalType(10, 2))]
    )
    df = spark.createDataFrame(rows, schema)
    per_group = df.groupBy("k").agg(
        F.avg("v").alias("a"), F.count(F.lit(1)).alias("n")
    )
    got = per_group.agg(
        (F.sum(F.col("a") * F.col("n")) / F.sum("n")).alias("w")
    ).first().w
    want = df.agg(F.avg("v").alias("a")).first().a
    assert abs(float(got) - float(want)) < 2e-6


join_events = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3), st.integers(min_value=0, max_value=1000)),
    min_size=1, max_size=30,
)


@SLOW
@given(left=join_events, right=join_events)
def test_asof_join_matches_python_model(spark, left, right):
    """The union+window as-of composition against a brute-force model:
    for each left row, the greatest right time <= left time on the key."""
    from datetime import datetime, timedelta

    from postgresql_datawarehouse_excercise_spark.operators.asof import asof_join

    base = datetime(2020, 1, 1)
    t = lambda s: base + timedelta(seconds=s)  # noqa: E731
    # unique right (key, time): keep max payload per the determinism contract
    rmap: dict[tuple[int, int], int] = {}
    for i, (k, s) in enumerate(right):
        rmap[(k, s)] = max(rmap.get((k, s), -1), i)
    ldf = spark.createDataFrame(
        [(i, k, t(s)) for i, (k, s) in enumerate(left)], "lid long, k long, lt timestamp"
    )
    rdf = spark.createDataFrame(
        [(k, t(s), p) for (k, s), p in rmap.items()], "k long, rt timestamp, payload long"
    )
    got = {
        r.lid: r.asof_payload
        for r in asof_join(ldf, rdf, on="k", left_time="lt", right_time="rt",
                           payload=["payload"]).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [(rs, p) for (rk, rs), p in rmap.items() if rk == k and rs <= s]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, s)


@SLOW
@given(left=join_events, right=join_events, win=st.integers(min_value=1, max_value=300))
def test_range_join_matches_python_model(spark, left, right, win):
    from datetime import datetime, timedelta

    from postgresql_datawarehouse_excercise_spark.operators.asof import range_join_buckets

    base = datetime(2020, 1, 1)
    t = lambda s: base + timedelta(seconds=s)  # noqa: E731
    ldf = spark.createDataFrame(
        [(i, k, t(s)) for i, (k, s) in enumerate(left)], "lid long, k long, lt timestamp"
    )
    rdf = spark.createDataFrame(
        [(j, k, t(s)) for j, (k, s) in enumerate(right)], "rid long, k long, rt timestamp"
    )
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_buckets(ldf, rdf, on="k", left_time="lt",
                                    right_time="rt", window_seconds=win).collect()
    )
    want = sorted(
        (i, j)
        for i, (lk, ls) in enumerate(left)
        for j, (rk, rs) in enumerate(right)
        if lk == rk and ls <= rs < ls + win
    )
    assert got == want


def test_semantic_dedup_matches_python_model(spark):
    """Independent semantics check (NOT the identical-arithmetic oracle):
    on synthetic embeddings built from well-separated duplicates --
    exact copies (cosine 1.0) of lower-id vectors plus near-orthogonal
    singletons (cosine far below threshold) -- semantic_dedup must drop
    exactly the copies whose original shares their cluster, and keep
    every cluster-lowest original.  Verified against a brute-force pure
    Python evaluation of the keep-lowest-id rule over the operator's own
    cluster assignment."""
    import math

    from postgresql_datawarehouse_excercise_spark.operators import similarity

    # 10 base directions (near-orthogonal one-hot-ish, 64-dim), each with
    # 0-3 exact copies at higher ids
    rows = []
    vid = 0
    originals = {}
    for b in range(10):
        vec = [0.0] * 64
        vec[b * 6] = 1.0
        vec[b * 6 + 1] = 0.1 * (b % 3)
        rows.append((vid, vec))
        originals[vid] = vec
        vid += 1
    base_n = vid
    for b in range(10):
        for _ in range(b % 4):
            rows.append((vid, list(originals[b])))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in similarity.semantic_dedup(emb).collect()
    }
    assert set(got) == {r[0] for r in rows}

    # brute force: within each cluster (as assigned by the operator), a
    # vector is kept iff no lower-id member has cosine >= threshold
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    vecs = dict(rows)
    for v, (cl, kept) in got.items():
        dup_exists = any(
            u < v and got[u][0] == cl
            and cos(vecs[u], vecs[v]) >= similarity.SEMDEDUP_THRESHOLD + 0.01
            for u in got
        )
        safe_clear = all(
            not (u < v and got[u][0] == cl)
            or cos(vecs[u], vecs[v]) < similarity.SEMDEDUP_THRESHOLD - 0.01
            or cos(vecs[u], vecs[v]) >= similarity.SEMDEDUP_THRESHOLD + 0.01
            for u in got
        )
        assert safe_clear, "synthetic data landed near the threshold; rebuild it"
        assert kept == (not dup_exists), (v, cl, kept)


def test_substring_spans_matches_python_model(spark):
    """Independent semantics check for x_dedup_substring_spans: on
    constructed documents -- one shared 12-token run embedded at DIFFERENT
    offsets in two docs (the alignment-shifted case disjoint block dedup
    misses), plus overlapping-but-not-consecutive hits and a unique doc --
    the operator's maximal-span merge must equal a brute-force pure-Python
    interval union of duplicated K-windows."""
    from postgresql_datawarehouse_excercise_spark.queries.x_dedup import (
        substring_spans,
    )

    K = 4
    shared = [f"s{i}" for i in range(12)]

    def words(doc, n):
        return [f"d{doc}w{i}" for i in range(n)]

    texts = {
        0: words(0, 5) + shared + words(0, 5),          # run at offset 5
        1: shared + [f"d1w{i}" for i in range(9)],      # same run at offset 0
        2: words(2, 16),                                # unique
        # doc 3 repeats the FIRST half of the run later -> second, separate
        # span within the same doc after the merge
        3: words(3, 4) + shared[:6] + words(3, 4)[::-1] + shared[:6],
    }
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in texts.items()], "doc_id long, text string"
    )

    # pure-Python model: window -> docs holding it; merge hit intervals
    windows = {}
    for d, t in texts.items():
        for p in range(len(t) - K + 1):
            windows.setdefault(tuple(t[p : p + K]), set()).add(d)
    expect = {}
    for d, t in texts.items():
        hits = [
            p
            for p in range(len(t) - K + 1)
            if len(windows[tuple(t[p : p + K])]) >= 2
        ]
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1] - K + 1 + K - 1:  # p <= prev_end
                spans[-1][1] = max(spans[-1][1], p + K - 1)
            else:
                spans.append([p, p + K - 1])
        expect[d] = (
            len(t),
            len(spans),
            sum(e - s + 1 for s, e in spans),
        )

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["n_dup_tokens"])
        for r in substring_spans(docs, K=K).collect()
    }
    assert got == expect, (got, expect)
    # the shifted copy is SEEN (nonzero coverage in both carriers) -- the
    # property disjoint 16-token blocks cannot deliver
    assert got[0][2] >= 12 and got[1][2] >= 12


def test_semantic_decontaminate_gemm_matches_fold(spark, sf_dir):
    """The gated x_pipeline_decontaminate_semantic rides the blocked-GEMM
    kernel (cosine_max_vs_set_blocked); the engine-portable exact-fold form
    (semantic_decontaminate) is the oracle's twin.  Pin row-for-row equality
    of the two kernels on the driver data so a BLAS/rounding change that
    erodes the 6-dp agreement fails loudly (the cosine_neardup precedent)."""
    from pyspark.sql import functions as F

    from postgresql_datawarehouse_excercise_spark import catalog
    from postgresql_datawarehouse_excercise_spark.operators.similarity import (
        _norms,
        cosine_max_vs_set_blocked,
    )
    from postgresql_datawarehouse_excercise_spark.queries.x_pipeline import (
        TRAIN_PCT,
        _bucket,
        semantic_decontaminate,
    )

    t = catalog.load(spark, sf_dir)
    base = _norms(t.embeddings).withColumn("bucket", _bucket(F.col("vec_id")))
    ev = base.filter(F.col("bucket") >= TRAIN_PCT).select(
        F.col("e").alias("ev_e"), F.col("n").alias("ev_n")
    )
    train = base.filter(F.col("bucket") < TRAIN_PCT)
    fold = {
        r["vec_id"]: r["max_cos_eval"]
        for r in semantic_decontaminate(train, ev).collect()
    }
    gemm = {
        r["vec_id"]: r["max_cos_eval"]
        for r in cosine_max_vs_set_blocked(train, ev).collect()
    }
    assert fold == gemm


def test_bpe_merge_greedy_leftmost_and_no_cross_symbol_match(spark):
    """BPE merge semantics pins: (1) greedy LEFTMOST non-overlapping merge
    -- 'aaa' under pair (a,a) becomes ['aa','a'], never ['a','aa']; (2) no
    cross-symbol false match -- after 'th' exists, pair (h,e) must NOT
    merge across the 'th'|'e' boundary.  Verified against hand-computed
    rounds on a constructed corpus."""
    from postgresql_datawarehouse_excercise_spark.queries.x_text import (
        bpe_merge_rounds,
    )

    # corpus: 'aaa' x3, 'baa' x1 -> pair (a,a) count = 2*3 + 1 = 7 (adjacent
    # overlapping count), (b,a) = 1.  Round 1 merges (a,a):
    #   'aaa' -> aa,a (leftmost greedy; 2 symbols), 'baa' -> b,aa
    #   symbols_after = 2*3 + 2 = 8... wait words table is DISTINCT words:
    #   freq(aaa)=3, freq(baa)=1 -> counts (a,a) = 2*3+1 = 7
    docs = spark.createDataFrame(
        [(0, "aaa aaa aaa baa")], "doc_id long, text string"
    )
    rows = {r["round"]: r for r in bpe_merge_rounds(docs, rounds=2).collect()}
    r1 = rows[1]
    assert (r1["pair"], r1["merged"], r1["cnt"]) == ("a a", "aa", 7)
    # after round 1: aaa = [aa, a] (freq 3), baa = [b, aa] (freq 1)
    assert r1["symbols_after"] == 2 * 3 + 2 * 1
    # round 2 pairs: (aa,a) = 3, (b,aa) = 1 -> merge (aa,a) -> aaa 1 symbol
    r2 = rows[2]
    assert (r2["pair"], r2["merged"], r2["cnt"]) == ("aa a", "aaa", 3)
    assert r2["symbols_after"] == 1 * 3 + 2 * 1

    # cross-symbol safety: corpus of 'the' x5 + 'he' x1 ('t h' wins round 1
    # with 5 vs (h,e) 6? (h,e): the=1*5 + he=1 -> 6; (t,h): 5 -> round 1
    # merges (h,e).  Round 2: the = [t, he] -> (t,he)=5; he = [he].  If the
    # encoding false-matched, 't he' could wrongly contain pair matches.
    docs2 = spark.createDataFrame(
        [(0, " ".join(["the"] * 5 + ["he"]))], "doc_id long, text string"
    )
    rows2 = {r["round"]: r for r in bpe_merge_rounds(docs2, rounds=2).collect()}
    assert (rows2[1]["pair"], rows2[1]["cnt"]) == ("h e", 6)
    assert (rows2[2]["pair"], rows2[2]["merged"], rows2[2]["cnt"]) == ("t he", "the", 5)
