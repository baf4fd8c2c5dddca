"""Winnowing fingerprints + dup-graph triangle counting: independent
semantics checks against pure-Python models / constructed graphs (the
DuckDB oracle parity for these entries lives in test_oracle_parity.py)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from postgresql_datawarehouse_excercise_spark.operators import dedup
from postgresql_datawarehouse_excercise_spark.queries.x_dedup import dedup_triangles


def _model_selected(tokens: list[str]) -> set[int]:
    """Pure-Python winnowing: pack = h36 * 2^24 + pos, min per W-window
    (window starts at every gram, frames clip at the tail — the operator's
    documented semantics)."""
    K, W = dedup.WINNOW_K, dedup.WINNOW_W
    grams = [" ".join(tokens[i : i + K]) for i in range(len(tokens) - K + 1)]
    packs = [
        int(hashlib.md5(g.encode()).hexdigest()[:9], 16) * (1 << dedup.WINNOW_POS_BITS) + i
        for i, g in enumerate(grams)
    ]
    return {min(packs[s : s + W]) for s in range(len(packs))}


def _docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnowing_matches_python_model(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(dedup.WINNOW_K, 60)))
        for _ in range(12)
    ]
    got = {
        (r.doc_id, r.pack)
        for r in dedup._winnow_selected(_docs_df(spark, texts)).collect()
    }
    want = {
        (i, p)
        for i, t in enumerate(texts)
        if len(t.split()) >= dedup.WINNOW_K
        for p in _model_selected(t.split())
    }
    assert got == want


def test_winnowing_detection_guarantee(spark):
    """The winnowing theorem: a shared token run of length >= W + K - 1
    yields at least one COMMON fingerprint hash, whatever surrounds it."""
    rng = random.Random(11)
    shared = [f"s{i}" for i in range(dedup.WINNOW_W + dedup.WINNOW_K - 1)]
    va, vb = [f"a{i}" for i in range(30)], [f"b{i}" for i in range(30)]
    doc_a = " ".join([rng.choice(va) for _ in range(25)] + shared + [rng.choice(va) for _ in range(25)])
    doc_b = " ".join([rng.choice(vb) for _ in range(17)] + shared + [rng.choice(vb) for _ in range(33)])
    sel = dedup._winnow_selected(_docs_df(spark, [doc_a, doc_b]))
    hashes = sel.select(
        "doc_id",
        (F.col("pack") / F.lit(1 << dedup.WINNOW_POS_BITS)).cast("long").alias("h"),
    )
    common = (
        hashes.filter(F.col("doc_id") == 0)
        .select("h")
        .intersect(hashes.filter(F.col("doc_id") == 1).select("h"))
        .count()
    )
    assert common >= 1


def test_winnowing_every_window_covered(spark):
    """Sketch density property: every window of W consecutive grams
    contains at least one selected position (what makes the sketch a
    coverage guarantee, not a sample)."""
    rng = random.Random(3)
    vocab = [f"v{i}" for i in range(25)]
    toks = [rng.choice(vocab) for _ in range(80)]
    sel_pos = {
        p % (1 << dedup.WINNOW_POS_BITS) for p in _model_selected(toks)
    }
    n_grams = len(toks) - dedup.WINNOW_K + 1
    for s in range(n_grams - dedup.WINNOW_W + 1):
        assert any(s <= p < s + dedup.WINNOW_W for p in sel_pos)


def test_triangles_on_constructed_cliques(spark):
    """4 identical docs -> K4 (each node: degree 3, 3 triangles, cc 1.0);
    a 2-doc pair -> degree-1 nodes excluded; an isolated doc -> absent."""
    clique = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    pair = "one two three four five six seven eight nine ten " * 3
    lone = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 3
    docs = spark.createDataFrame(
        [(i, clique) for i in range(4)] + [(10, pair), (11, pair), (20, lone)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup_triangles(docs).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r.degree == 3
        assert r.n_triangles == 3
        assert r.clustering_coeff == 1.0


def test_prefix_join_complete_vs_bruteforce(spark):
    """Prefix filtering is EXACT: on a corpus with duplicated + mutated +
    unrelated docs (including a deliberately hot shared phrase), the pair
    set equals the brute-force all-pairs Jaccard >= 0.5."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    hot = "common boiler plate phrase shared across documents every time"
    base = [" ".join(rng.choice(vocab) for _ in range(24)) for _ in range(8)]
    texts = []
    for b in base:
        texts.append(b + " " + hot)                       # original
        texts.append(b + " " + hot)                       # exact dup
        toks = (b + " " + hot).split()
        toks[rng.randrange(len(toks))] = "mutated"
        texts.append(" ".join(toks))                      # near dup
    # a >= CONTRACT_MIN_COHORT exact-copy cohort so the COLLAPSE path runs
    # (small cohorts take the direct path)
    texts.extend([base[0] + " " + hot] * dedup.CONTRACT_MIN_COHORT)
    docs = _docs_df(spark, texts)

    def shingles(t):
        tk = t.lower().split()
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)} or {" ".join(tk)}

    # fround is floor(x*1e4+0.5)/1e4 — apply the same rounding before the
    # threshold so the model matches the operator's boundary behavior
    import math

    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = shingles(texts[i]), shingles(texts[j])
            jac = math.floor(len(a & b) / len(a | b) * 10000 + 0.5) / 10000
            if jac >= 0.5:
                want.add((i, j))
    got = {
        (r.doc_a, r.doc_b) for r in dedup.prefix_join_pairs(docs).collect()
    }
    assert got == want


def test_kcore_peeling_reaches_fixpoint_and_excludes_tails(spark):
    """A 4-clique with a pendant chain: the 2-core is exactly the clique
    (chain nodes peel off), and 3 rounds reach the fixpoint (a 4th changes
    nothing)."""
    from postgresql_datawarehouse_excercise_spark.queries.x_dedup import dedup_kcore

    clique = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    chain = "one two three four five six seven eight nine ten " * 3
    docs = spark.createDataFrame(
        [(i, clique) for i in range(4)] + [(10, chain), (11, chain)],
        "doc_id long, text string",
    )
    r3 = {r.doc_id: r for r in dedup_kcore(docs).collect()}
    assert set(r3) == {0, 1, 2, 3}
    for r in r3.values():
        assert r.degree_full == 3 and r.degree_core == 3
    r4 = {r.doc_id: (r.degree_full, r.degree_core)
          for r in dedup_kcore(docs, rounds=4).collect()}
    assert r4 == {k: (v.degree_full, v.degree_core) for k, v in r3.items()}


def test_lsh_recall_evaluator_detects_scurve_misses(spark):
    """Pairs engineered just above Jaccard 0.5 sit under the 8x4 banding
    s-curve threshold (~0.59), so LSH must miss SOME of them -- the
    evaluator's miss count and avg_missed_jaccard must reflect that
    (i.e. the metric is not vacuously 1.0)."""
    import math

    from postgresql_datawarehouse_excercise_spark.queries import load_all

    rng = random.Random(17)
    texts = []
    for p in range(12):
        vocab = [f"p{p}w{i}" for i in range(60)]
        base = [rng.choice(vocab) for _ in range(60)]
        mut = list(base)
        # replace a 15-token block: kills ~17 of ~58 shingles per side ->
        # Jaccard ~ (58-17)/(58+17) ~ 0.55 -- above policy, below s-curve
        for i in range(18, 33):
            mut[i] = f"p{p}x{i}"
        texts.append(" ".join(base))
        texts.append(" ".join(mut))
    docs = _docs_df(spark, texts)

    exact = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.prefix_join_pairs(docs).collect()}
    assert exact, "constructed pairs must qualify at >= 0.5"
    assert all(v < 0.59 for v in exact.values()), exact
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs).filter(F.col("jaccard") >= 0.5).collect()
    }
    missed = set(exact) - lsh
    assert missed, "at least one sub-s-curve pair must be missed by banding"

    # the evaluator entry reports exactly these numbers
    ev = spark.createDataFrame(
        [(k[0], k[1], v, k in lsh) for k, v in exact.items()],
        "doc_a long, doc_b long, jaccard double, found boolean",
    )
    n_exact, n_found = len(exact), len(exact) - len(missed)
    want_recall = math.floor(n_found / n_exact * 10000 + 0.5) / 10000
    got = ev.agg(
        F.sum(F.when(F.col("found"), 1).otherwise(0)).alias("f"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (got.f, got.n) == (n_found, n_exact) and 0 < want_recall < 1
