"""Property-based tests for the extraction spec (pure Python, no Spark).

The reference pins its parser with golden examples only
(FoundationParserTest.scala); we add the stronger guarantee the
byte-identical bar needs: for ANY segment list the fixture renderer can
produce, extraction inverts it exactly — generator and extractor are
round-trip inverses by construction, over the whole input space, not
just the committed goldens."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from gush_spark.functions.extract import NULL_TOKEN, extract_segments, extract_text
from gush_spark.sources.fixtures import render_html

# characters whose canonical (P8-normalized) form survives the renderer's
# escape→extract round trip: printable, with whitespace runs collapsing
_seg_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc"),
    ),
    max_size=80,
)


def _canon(s: str) -> str:
    """What P8 whitespace-canonicalization makes of a raw segment."""
    return re.sub(r"[ \t\r\n]+", " ", s).strip()


def _expected(seg: str | None) -> str:
    if seg is None:
        return NULL_TOKEN
    # P8 collapses whitespace runs; other unicode whitespace is content.
    # The renderer escapes all markup chars, and P1 rewrites \' to ",
    # which the renderer never emits unescaped — so text passes through.
    return _canon(seg)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(st.none(), _seg_text), min_size=0, max_size=6))
def test_render_extract_roundtrip(segments):
    html = render_html(segments)
    got, err = extract_segments(html)
    assert err is None
    assert got == [_expected(s) for s in segments]


@settings(max_examples=200, deadline=None)
@given(st.lists(_seg_text, min_size=0, max_size=4), _seg_text)
def test_comments_never_leak(segments, comment_text):
    comment = _canon(comment_text).replace("--", "==") or None  # '--' ends a comment
    html = render_html(segments, comment=comment)
    got, err = extract_text(html)
    assert err is None
    if comment:
        assert comment_text not in (got or "") or any(
            comment_text in _canon(s) for s in segments
        )


@settings(max_examples=200, deadline=None)
@given(st.lists(_seg_text, min_size=1, max_size=4))
def test_malformed_is_error_not_crash(segments):
    html = render_html(segments, malformed=True)  # no <body>
    got, err = extract_text(html)
    assert got is None
    assert err is not None and err.startswith("malformed")


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=200))
def test_arbitrary_bytes_never_raise(blob):
    """The error channel is total: any byte blob yields (text, None) or
    (None, error) — never an exception (gush supervision-Resume analog,
    gush_example/gush.scala:13-18)."""
    text, err = extract_text(blob)
    assert (text is None) != (err is None)


@settings(max_examples=200, deadline=None)
@given(st.lists(_seg_text, min_size=0, max_size=5))
def test_multisegment_join_is_newline(segments):
    html = render_html(segments)
    text, err = extract_text(html)
    assert err is None
    assert text == "\n".join(_expected(s) for s in segments)
