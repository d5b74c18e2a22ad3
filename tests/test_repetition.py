"""Hand-checkable repetition-score semantics (operators/repetition.py);
the DuckDB oracle covers the synthetic corpus exhaustively."""

from __future__ import annotations

import pytest

from gush_spark.operators.repetition import repetition_scores


@pytest.fixture(scope="module")
def scores(spark):
    rows = [
        (1, "a a a b"),  # 4 tokens: top a=3/4; distinct 2/4; bigram 'a a'=2/3
        (2, "one"),  # single token: bigram frac 0
        (3, "spam spam spam spam"),  # fully degenerate: 1.0 / 0.25 / 1.0
        (4, "all words here are different ones"),  # no repetition
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in repetition_scores(df, "doc_id", "text").collect()}


def test_mixed_repetition(scores):
    r = scores[1]
    assert r["n_tokens"] == 4
    assert r["top_token_frac"] == pytest.approx(0.75)
    assert r["distinct_token_ratio"] == pytest.approx(0.5)
    assert r["top_bigram_frac"] == pytest.approx(2 / 3)


def test_single_token_doc(scores):
    r = scores[2]
    assert r["n_tokens"] == 1
    assert r["top_token_frac"] == 1.0
    assert r["top_bigram_frac"] == 0.0


def test_degenerate_spam_page(scores):
    r = scores[3]
    assert r["top_token_frac"] == 1.0
    assert r["distinct_token_ratio"] == 0.25
    assert r["top_bigram_frac"] == 1.0


def test_no_repetition(scores):
    r = scores[4]
    assert r["top_token_frac"] == pytest.approx(1 / 6)
    assert r["distinct_token_ratio"] == 1.0
    assert r["top_bigram_frac"] == pytest.approx(0.2)
