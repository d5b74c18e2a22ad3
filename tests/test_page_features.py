"""Unit tests for the fused python featurizer (pure python — the
pandas-UDF body is importable and testable without Spark)."""

from __future__ import annotations

import pandas as pd

from gush_spark.functions.page_features import (
    _page_features_frame,
    featurize_text,
)
from gush_spark.functions.text_analysis import ROLL_MOD
from gush_spark.operators.dedup import MINHASH_K
from gush_spark.sources.fixtures import render_html


def test_featurize_text_basic():
    q, lang, fp60, roll, mh, sim, norm = featurize_text(
        "The quick brown fox jumps over the lazy dog"
    )
    assert 0.0 <= q <= 1.0
    assert lang in ("de", "en", "es", "fr", "pt")
    assert 0 <= roll < ROLL_MOD
    assert len(mh) == MINHASH_K
    assert 0 <= sim < (1 << 32)
    assert norm == "the quick brown fox jumps over the lazy dog"


def test_featurize_deterministic_and_case_invariant():
    a = featurize_text("Alpha Beta  Gamma delta epsilon")
    b = featurize_text("alpha beta gamma delta epsilon")
    assert a == b  # normalization folds case + whitespace
    assert a == featurize_text("Alpha Beta  Gamma delta epsilon")  # stable


def test_featurize_order_sensitivity():
    a = featurize_text("one two three four five six")
    b = featurize_text("six five four three two one")
    assert a[3] != b[3]  # rolling_fp is order-sensitive
    assert sorted(a[4]) == sorted(a[4])  # minhash well-formed
    # simhash is bag-of-words — identical under reordering
    assert a[5] == b[5]


def test_featurize_short_doc_no_minhash():
    q, lang, fp60, roll, mh, sim, _ = featurize_text("ab cd")
    assert mh is None  # < SHINGLE_K words
    assert q is not None and sim is not None


def test_featurize_empty_text():
    assert featurize_text("   ") == (None,) * 7


def test_frame_error_channel():
    htmls = pd.Series([
        render_html(["hello world one two three"]),
        b"\xff\xfe invalid",
        None,
    ])
    out = _page_features_frame(htmls)
    assert out.loc[0, "extract_error"] is None
    assert out.loc[0, "text"] == "hello world one two three"
    assert out.loc[0, "quality_score"] is not None
    assert out.loc[1, "extract_error"].startswith("decode_error")
    assert out.loc[2, "extract_error"] == "null blob" or out.loc[2, "extract_error"] == "null html"
    assert pd.isna(out.loc[1, "fp60"]) and pd.isna(out.loc[2, "fp60"])
    assert list(out.columns) == [
        "text", "n_segments", "extract_error", "quality_score", "pred_lang",
        "fp60", "rolling_fp", "minhash", "simhash",
    ]


def test_featurize_md5_arrow_backend_matches_jvm_md5(spark):
    """The Arrow md5 backend must be value-identical to the all-JVM md5
    expressions on every output column (incl. null-text error rows)."""
    from gush_spark.operators.featurize import featurize

    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again"),
        (2, "Short one"),
        (3, ""),
        (4, None),
        (5, "Unicode héllo wörld çafé text with accents répeated wörld"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id", "quality_score", "pred_lang", "fp60", "rolling_fp", "minhash"]
    jvm = {r["doc_id"]: r for r in featurize(docs, "text", hash_fn="md5").select(cols).collect()}
    arrow = {r["doc_id"]: r for r in featurize(docs, "text", hash_fn="md5_arrow").select(cols).collect()}
    assert set(jvm) == set(arrow)
    for k in jvm:
        assert jvm[k] == arrow[k], f"doc {k}: {jvm[k]} != {arrow[k]}"
