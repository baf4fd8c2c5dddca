"""Unigram-LM (SentencePiece-style) tokenizer trainer: Viterbi-DP optimality
vs a Python brute force, hard-EM monotonicity, and encode consistency."""

from __future__ import annotations

import math

import pytest

from postgresql_datawarehouse_excercise_spark.queries.x_unigram import (
    UNI_L,
    UNI_ROUNDS,
    _uni_seed_model,
    _uni_segment,
    _uni_words,
    unigram_train_rounds,
    x_text_unigram_encode,
    x_text_unigram_lm,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_docs(spark):
    # repeated substrings + a singleton word + a word of repeated chars:
    # the shapes where greedy-vs-optimal segmentation and tie-breaks differ
    rows = [
        (0, "banana bandana ana ana nab"),
        (1, "banana banana band anda zzzz"),
        (2, "ban and b z q"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_best(word: str, cost: dict[str, int]) -> int:
    """Exact min-cost segmentation by exhaustive DP (independent of the
    packed-backpointer engine fold)."""
    big = 10**15
    dp = [0] + [big] * len(word)
    for i in range(1, len(word) + 1):
        for j in range(1, min(UNI_L, i) + 1):
            p = word[i - j : i]
            if p in cost:
                dp[i] = min(dp[i], dp[i - j] + cost[p])
    return dp[len(word)]


def test_viterbi_matches_bruteforce(spark, tiny_docs):
    words = _uni_words(tiny_docs)
    model = _uni_seed_model(words)
    cost = {r["p"]: r["cost"] for r in model.collect()}
    seg = _uni_segment(words, model).collect()
    assert len(seg) > 0
    for r in seg:
        assert r["wcost"] == _brute_best(r["w"], cost), r["w"]


def test_segmentation_reconstructs_word(spark, tiny_docs):
    """Pieces are emitted end-first by the backtrack fold: reversed
    concatenation must reproduce the word exactly."""
    words = _uni_words(tiny_docs)
    seg = _uni_segment(words, _uni_seed_model(words)).collect()
    for r in seg:
        assert "".join(reversed(r["pieces"])) == r["w"]
        assert all(1 <= len(p) <= UNI_L for p in r["pieces"])


def test_em_cost_monotone_with_quantization_slack(spark):
    """Hard-EM monotonicity: the corpus Viterbi cost under the new model is
    <= the old (module docstring's proof), up to the micro-nat quantization
    slack of <=1 per emitted token."""
    rows = sorted(x_text_unigram_lm(spark, SF).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == list(range(1, UNI_ROUNDS + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert (
            cur["total_cost_micro"] <= prev["total_cost_micro"] + prev["tokens_total"]
        ), (prev, cur)
    # and the first round must strictly improve on this corpus (the seed
    # model's occurrence double-counting is far from the MLE)
    assert rows[-1]["total_cost_micro"] < rows[0]["total_cost_micro"]


def test_char_floor_keeps_dp_feasible(spark, tiny_docs):
    """After pruning, every word still segments (the unused-char floor):
    no wcost may reach the UNI_BIG infeasible band."""
    stats, model = unigram_train_rounds(tiny_docs, rounds=2)
    stats.collect()  # force both rounds
    words = _uni_words(tiny_docs)
    seg = _uni_segment(words, model).collect()
    assert {r["w"] for r in seg} == {r["w"] for r in words.collect()}
    for r in seg:
        assert r["wcost"] < 10**9, r


def test_encode_consistency(spark):
    enc = {r["doc_id"]: r for r in x_text_unigram_encode(spark, SF).collect()}
    assert len(enc) > 0
    for r in enc.values():
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert 0.0 < r["compression"] <= 1.0
        assert abs(
            r["compression"]
            - math.floor(r["n_tokens"] / r["n_chars"] * 10000.0 + 0.5) / 10000.0
        ) < 1e-12
