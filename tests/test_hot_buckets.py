"""Hot-bucket cap for bucketed self-joins (operators/skew.py): a
manufactured boilerplate bucket must be excluded with eager accounting
while normal buckets keep producing pairs — bounded join fan-in, no
silent truncation."""

from __future__ import annotations

import pytest

from gush_spark.operators import dedup, similarity
from gush_spark.operators.skew import cap_hot_buckets, hot_buckets


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # 20 identical boilerplate docs (one hot LSH bucket per band) plus
    # one genuine near-dup pair with distinct content
    rows = [(i, "accept all cookies to continue to this parked domain page") for i in range(20)]
    rows += [
        (100, "completely original article about distributed stream processing engines"),
        (101, "completely original article about distributed stream processing systems"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lsh_cap_drops_hot_bucket_and_keeps_normal_pairs(boilerplate_docs):
    stats: dict = {}
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            boilerplate_docs, "doc_id", "text", max_bucket=5, capped_stats=stats
        ).collect()
    }
    assert (100, 101) in pairs  # normal bucket still joins
    assert not any(a < 20 and b < 20 for a, b in pairs)  # hot bucket capped
    assert stats["n_capped_buckets"] >= 1
    assert stats["n_capped_rows"] >= 20
    assert stats["max_bucket"] == 5


def test_lsh_cap_none_is_exact(boilerplate_docs):
    capped = dedup.lsh_candidate_pairs(boilerplate_docs, "doc_id", "text")
    assert capped.filter("id_a < 20 AND id_b < 20").count() == 20 * 19 // 2


def test_cosine_cap_drops_hot_bucket(spark):
    # 12 vectors in the all-positive sign bucket, 2 in another bucket
    rows = [(i, [1.0] * 8 + [float(i)]) for i in range(12)]
    rows += [(100, [-1.0] * 8 + [5.0]), (101, [-1.0] * 8 + [5.1])]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    stats: dict = {}
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_dup_pairs(
            vecs, threshold=0.5, max_bucket=5, capped_stats=stats
        ).collect()
    }
    assert (100, 101) in pairs
    assert not any(a < 12 and b < 12 for a, b in pairs)
    assert stats["n_capped_buckets"] == 1
    assert stats["n_capped_rows"] == 12


def test_hot_buckets_listing_and_noop(spark):
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], ["id", "bucket"]
    )
    hot = hot_buckets(df, ["bucket"], max_bucket=4).collect()
    assert {r["bucket"] for r in hot} == {0, 1}  # both buckets have 5 > 4
    assert cap_hot_buckets(df, ["bucket"], None) is df  # None → no-op


def test_lsh_param_tuning():
    """The banding knob: midpoints are monotone in rows, the selector
    recovers the module's own default (4x4 over 16 hashes sits near
    0.7), and out-of-range thresholds are rejected."""
    from gush_spark.operators.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_K,
        lsh_params_for_threshold,
        lsh_threshold,
    )

    # the committed default banding targets ~0.7 Jaccard
    assert abs(lsh_threshold(LSH_BANDS, LSH_ROWS) - 0.7) < 0.05
    assert lsh_params_for_threshold(0.7, MINHASH_K) == (LSH_BANDS, LSH_ROWS)
    # low threshold -> many bands / short rows (high recall)
    b_lo, r_lo = lsh_params_for_threshold(0.2, MINHASH_K)
    b_hi, r_hi = lsh_params_for_threshold(0.95, MINHASH_K)
    assert b_lo > b_hi and r_lo < r_hi
    assert b_lo * r_lo == MINHASH_K == b_hi * r_hi
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_params_for_threshold(1.5)


def test_threshold_derives_banding_at_call_sites(boilerplate_docs):
    """The selector is WIRED, not just defined: passing threshold= to
    lsh_candidate_pairs must produce exactly the pairs of the
    selector-chosen explicit banding, and the 0.6 near-dup default
    rides the committed 4x4 midpoint (so existing oracles are stable)."""
    from gush_spark.operators.dedup import (
        MINHASH_K,
        lsh_params_for_threshold,
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    b, r = lsh_params_for_threshold(0.35, MINHASH_K)
    assert (b, r) != (4, 4)  # a threshold that actually moves the banding
    via_threshold = sorted(
        map(tuple, lsh_candidate_pairs(
            boilerplate_docs, "doc_id", "text", threshold=0.35
        ).collect())
    )
    via_explicit = sorted(
        map(tuple, lsh_candidate_pairs(
            boilerplate_docs, "doc_id", "text", bands=b, rows=r
        ).collect())
    )
    assert via_threshold == via_explicit
    # the catalog default threshold selects the committed 4x4 banding
    assert lsh_params_for_threshold(0.6, MINHASH_K) == (4, 4)
    # verify-threshold derivation flows through the two-phase pipeline
    low = ngram_jaccard_pairs(
        boilerplate_docs, "doc_id", "text", threshold=0.35
    )
    assert {(x["id_a"], x["id_b"]) for x in low.collect()} >= {(100, 101)}
