"""Incremental new-batch-vs-corpus dedup (operators/incremental.py):
semantics on hand-built fixtures, broadcast≡shuffle equality, and the
plan property that makes the daily-append pattern viable at 10^12
pages — the corpus side never shuffles when the new side broadcasts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.operators import incremental


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "completely different corpus content entirely unrelated words"),
        (102, "a third corpus document with its own unique wording here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def new_batch(spark):
    rows = [
        (1, "THE  Quick Brown fox jumps over the lazy dog"),  # exact dup of 100
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 100
        (3, "a genuinely novel page with fresh words nobody wrote before"),
        (4, "a genuinely novel page with fresh words nobody wrote before"),  # batch dup of 3
        (5, "xy"),  # too short for shingles; unique fingerprint
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_exact_dedup(new_batch, corpus):
    out = {
        r["doc_id"]: r
        for r in incremental.incremental_exact_dedup(
            new_batch, corpus, "doc_id", "text"
        ).collect()
    }
    assert out[1]["in_corpus"] and not out[1]["is_kept"]
    assert out[2]["is_kept"]  # near-dup is NOT an exact dup
    assert out[3]["is_kept"] and out[3]["batch_rank"] == 1
    assert not out[4]["is_kept"] and out[4]["batch_rank"] == 2
    assert out[5]["is_kept"]


def test_incremental_near_dup_pairs(new_batch, corpus):
    pairs = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental.incremental_near_dup_pairs(
            new_batch, corpus, "doc_id", "text", threshold=0.3
        ).collect()
    }
    assert (2, 100) in pairs and 0.3 <= pairs[(2, 100)] < 1.0
    # the exact dup collides too (jaccard 1.0); novel pages don't
    assert (1, 100) in pairs and pairs[(1, 100)] == 1.0
    assert all(nid not in (3, 4, 5) for nid, _ in pairs)


def test_incremental_curate_audit_trail(new_batch, corpus):
    out = {
        r["doc_id"]: r
        for r in incremental.incremental_curate(
            new_batch, corpus, "doc_id", "text", threshold=0.6
        ).collect()
    }
    assert not out[1]["is_kept"] and out[1]["in_corpus"]
    assert not out[2]["is_kept"] and out[2]["near_corpus"]
    assert out[3]["is_kept"]
    assert not out[4]["is_kept"] and out[4]["batch_rank"] == 2
    # 4 is also a within-batch NEAR dup of 3 (identical text ⇒ jaccard 1)
    assert out[4]["near_batch"]
    assert out[5]["is_kept"]


def test_broadcast_and_shuffle_forms_agree(new_batch, corpus):
    a = incremental.incremental_curate(
        new_batch, corpus, "doc_id", "text", broadcast_new=True
    )
    b = incremental.incremental_curate(
        new_batch, corpus, "doc_id", "text", broadcast_new=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_corpus_side_never_shuffles_raw_text(new_batch, corpus):
    """The scale property: with broadcast_new=True the exact-dedup plan
    contains no shuffle exchange at all — the corpus index scan is
    map-only and the new side moves via broadcast (the window over the
    small new side is the only exchange, keyed by 16-byte fingerprint)."""
    out = incremental.incremental_exact_dedup(
        new_batch, corpus, "doc_id", "text", broadcast_new=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # every (non-broadcast) Exchange in the plan partitions by the
    # fingerprint hash — never by raw text, and none on the corpus scan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "fingerprint" in m.group(1) or "text" not in m.group(1)
    assert "Exchange hashpartitioning(text" not in plan


def test_incremental_estimate_matches_candidates_and_bounds(new_batch, corpus):
    """Signature-only variant: same candidate pairs as the exact form,
    exact dup estimates exactly 1.0, near-dup estimate within 3
    standard errors (k=16) of the exact jaccard."""
    exact = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental.incremental_near_dup_pairs(
            new_batch, corpus, "doc_id", "text", threshold=0.0
        ).collect()
    }
    est = {
        (r["new_id"], r["corpus_id"]): r["est_jaccard"]
        for r in incremental.incremental_near_dup_estimate(
            new_batch, corpus, "doc_id", "text", threshold=0.0
        ).collect()
    }
    assert set(est) == set(exact)
    assert est[(1, 100)] == 1.0
    for pair, j in exact.items():
        se = (j * (1 - j) / 16) ** 0.5
        assert abs(est[pair] - j) <= 3 * se + 1e-9, (pair, est[pair], j)


def test_incremental_curate_estimate_tier_agrees_here(new_batch, corpus):
    """use_estimate=True (the all-signature daily path) must produce
    the same keep/drop decisions as the exact tier when the threshold
    sits far from the pairs' Jaccard relative to the k=16 estimator
    noise (0.3 here vs J≈0.75 near-dups: >3 standard errors clear; at
    thresholds within the noise band — e.g. 0.6 vs J=0.75 — the tiers
    legitimately diverge, which is the documented trade)."""
    exact = {
        r["doc_id"]: tuple(r)
        for r in incremental.incremental_curate(
            new_batch, corpus, "doc_id", "text", threshold=0.3
        ).collect()
    }
    est = {
        r["doc_id"]: tuple(r)
        for r in incremental.incremental_curate(
            new_batch, corpus, "doc_id", "text", threshold=0.3,
            use_estimate=True,
        ).collect()
    }
    assert est == exact
    assert not est[2][-1], "near-dup of corpus must be dropped"
