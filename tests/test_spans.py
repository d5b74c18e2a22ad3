"""Cross-document duplicated-span detection (operators/spans.py):
hand-built fixtures pin exactly which windows count as duplicated,
that short/empty/null docs degrade to zero rows (not errors), the
stride coverage guarantee, and parameter validation."""

from __future__ import annotations

import pytest

from gush_spark.operators.spans import (
    duplicate_spans,
    span_keys,
    winnowed_duplicate_spans,
    winnowed_span_keys,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_copied_paragraph_is_localized(spark):
    """Two mostly-distinct docs sharing one verbatim 4-token run: only
    the window covering the copied run is duplicated, so dup_fraction
    localizes the paste instead of flagging the whole page."""
    shared = "lorem ipsum dolor sit"
    docs = _docs(spark, [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"one two three four five {shared}"),
        (3, "entirely original words nothing shared here at all"),
    ])
    got = _by_id(duplicate_spans(docs, window_tokens=4, stride=1))
    # doc 1: 9 tokens -> 6 windows, exactly one of them == shared
    assert got[1]["n_windows"] == 6 and got[1]["n_dup_windows"] == 1
    assert got[2]["n_windows"] == 6 and got[2]["n_dup_windows"] == 1
    assert got[3]["n_dup_windows"] == 0
    assert got[1]["dup_fraction"] == pytest.approx(1 / 6)


def test_identical_docs_score_one(spark):
    docs = _docs(spark, [
        (1, "the same text in every copy of this page"),
        (2, "the same text in every copy of this page"),
    ])
    got = _by_id(duplicate_spans(docs, window_tokens=4, stride=1))
    assert got[1]["dup_fraction"] == 1.0 and got[2]["dup_fraction"] == 1.0


def test_intra_doc_repeats_do_not_count_as_cross_doc(spark):
    """A window repeated INSIDE one doc is repetition (its own
    operator), not cross-document duplication: n_docs counts distinct
    docs, so a solo doc chanting one phrase scores zero."""
    docs = _docs(spark, [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "completely different and unrelated words over here now"),
    ])
    got = _by_id(duplicate_spans(docs, window_tokens=4, stride=1))
    assert got[1]["n_windows"] == 5 and got[1]["n_dup_windows"] == 0


def test_short_empty_null_docs_keep_a_zero_row(spark):
    docs = _docs(spark, [(1, "too short"), (2, ""), (3, None)])
    got = _by_id(duplicate_spans(docs, window_tokens=4, stride=1))
    assert set(got) == {1, 2, 3}
    for r in got.values():
        assert r["n_windows"] == 0 and r["dup_fraction"] == 0.0


def test_grid_stride_is_a_sampler_not_a_guarantee(spark):
    """The documented stride>1 recall caveat, pinned: copies whose
    offsets are congruent mod stride share windows; a copy shifted by
    one token against stride=2 deterministically shares NONE — the
    failure mode that motivates the winnowed variant."""
    run = "q w e r t y u i"  # 8 tokens
    aligned = _docs(spark, [
        (1, f"{run} tail1 tail2"),
        (2, f"pre pad {run} tail3"),  # offset 2 ≡ 0 (mod 2): aligned
    ])
    got = _by_id(duplicate_spans(aligned, window_tokens=4, stride=2))
    assert got[1]["n_dup_windows"] >= 1 and got[2]["n_dup_windows"] >= 1
    misaligned = _docs(spark, [
        (1, f"{run} tail1 tail2"),
        (2, f"off {run} tail3"),  # offset 1: never on the grid
    ])
    got = _by_id(duplicate_spans(misaligned, window_tokens=4, stride=2))
    assert got[1]["n_dup_windows"] == 0 and got[2]["n_dup_windows"] == 0
    # and the window count actually thinned vs stride=1
    full = _by_id(duplicate_spans(misaligned, window_tokens=4, stride=1))
    assert got[1]["n_windows"] < full[1]["n_windows"]


def test_winnowing_catches_misaligned_copies(spark):
    """The winnowing guarantee: a shared run of window_tokens+winnow-1
    tokens yields a shared fingerprint at ANY offset — including the
    exact case the grid sampler deterministically misses."""
    run = "q w e r t y u i"  # 8 tokens >= 4 + 5 - 1
    for pad in ["off", "a b", "x y z", ""]:
        docs = _docs(spark, [
            (1, f"{run} tail1 tail2"),
            (2, f"{pad} {run} tail3".strip()),
        ])
        got = _by_id(winnowed_duplicate_spans(docs, window_tokens=4, winnow=5))
        assert got[1]["n_dup_fingerprints"] >= 1, f"missed at pad={pad!r}"
        assert got[2]["n_dup_fingerprints"] >= 1, f"missed at pad={pad!r}"


def test_winnowing_thins_density_and_scores_identical_docs(spark):
    text = " ".join(f"tok{i}" for i in range(60))
    docs = _docs(spark, [(1, text), (2, text)])
    win = _by_id(winnowed_duplicate_spans(docs, window_tokens=8, winnow=4))
    grid = _by_id(duplicate_spans(docs, window_tokens=8, stride=1))
    assert win[1]["dup_fraction"] == 1.0
    assert 0 < win[1]["n_fingerprints"] < grid[1]["n_windows"]


def test_winnowed_short_docs_keep_zero_rows(spark):
    docs = _docs(spark, [(1, "too short for any fingerprint"), (2, None)])
    got = _by_id(winnowed_duplicate_spans(docs, window_tokens=8, winnow=4))
    assert set(got) == {1, 2}
    assert all(r["n_fingerprints"] == 0 and r["dup_fraction"] == 0.0
               for r in got.values())


def test_min_docs_threshold(spark):
    """min_docs=3: a span in only two docs is below the bar."""
    docs = _docs(spark, [
        (1, "a b c d xx"), (2, "a b c d yy"), (3, "p q r s zz"),
    ])
    got2 = _by_id(duplicate_spans(docs, window_tokens=4, stride=1))
    got3 = _by_id(duplicate_spans(docs, window_tokens=4, stride=1, min_docs=3))
    assert got2[1]["n_dup_windows"] == 1
    assert got3[1]["n_dup_windows"] == 0


def test_parameter_validation(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        span_keys(docs, window_tokens=0)
    with pytest.raises(ValueError):
        span_keys(docs, stride=0)
    with pytest.raises(ValueError):
        winnowed_span_keys(docs, winnow=0)


def _removal(spark, rows, **kw):
    from gush_spark.operators.spans import remove_duplicate_spans
    docs = _docs(spark, rows)
    return _by_id(remove_duplicate_spans(docs, **kw))


def test_removal_cuts_exactly_the_shared_run(spark):
    """The copied 4-token run (and only it) is cut from both docs;
    the fully-original doc comes back byte-identical."""
    shared = "lorem ipsum dolor sit"
    original = "entirely original words nothing shared here at all"
    got = _removal(spark, [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"one two three four five {shared}"),
        (3, original),
    ], window_tokens=4)
    assert got[1]["clean_text"] == "alpha beta gamma delta epsilon"
    assert got[1]["n_removed"] == 4 and got[1]["n_tokens"] == 9
    assert got[2]["clean_text"] == "one two three four five"
    assert got[3]["clean_text"] == original and got[3]["n_removed"] == 0


def test_removal_overlapping_windows_cover_the_whole_run(spark):
    """A shared run longer than one window: overlapping dup windows
    union into one covered range — no token of the run survives, and
    no token outside it is touched."""
    run = " ".join(f"s{i}" for i in range(7))  # 7 shared tokens, W=4
    got = _removal(spark, [
        (1, f"keep1 {run} keep2"),
        (2, f"other head {run}"),
    ], window_tokens=4)
    assert got[1]["clean_text"] == "keep1 keep2"
    assert got[1]["n_removed"] == 7


def test_removal_identical_docs_empty_out(spark):
    text = "the same text in every copy of this page"
    got = _removal(spark, [(1, text), (2, text)], window_tokens=4)
    assert got[1]["clean_text"] == "" and got[1]["n_removed"] == 9


def test_removal_short_and_null_docs_pass_through(spark):
    got = _removal(spark, [(1, "too short"), (2, None)], window_tokens=4)
    assert got[1]["clean_text"] == "too short" and got[1]["n_removed"] == 0
    assert got[2]["clean_text"] is None and got[2]["n_removed"] is None
