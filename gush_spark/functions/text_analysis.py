"""Text-analysis operators for the web-scale training-data pipeline.

The reference's per-record computation is SQL-string parsing
(`/root/reference/src/main/scala/io/simao/gush/parser/FoundationParser.scala:27-36`);
a Common-Crawl-scale pipeline needs the text-side equivalents: token
counting, quality scoring, language-ID and document fingerprinting.

Everything here is **pure JVM-side column expressions** — no Python UDF
anywhere. At 100 TB these run inside whole-stage codegen on the scan
output with zero serialization cost; the pandas-UDF hot path stays
reserved for html extraction only (gush_spark.functions.extract).

Oracle-exactness conventions (the driver hashes values against DuckDB):
- hashing is md5 (identical hex in Spark and DuckDB);
- hex→int is the first 15 hex digits (60 bits, fits signed int64);
- folds are sequential left-to-right so both engines agree bit-for-bit;
- modular rolling-hash arithmetic stays under 2^36 so neither engine
  overflows int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum glyph
# (the shape GPT-2-style byte-pair pre-tokenization produces on ASCII).
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Minimal per-language stopword profiles (public, classic lists).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "pt": ["de", "que", "e", "o", "a", "do", "da", "em", "um", "para"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "une", "du", "que"],
    "es": ["el", "la", "y", "que", "de", "en", "un", "los", "se", "no"],
}

ROLL_MOD = 2147483647  # 2^31-1: keeps acc*31 + 28-bit hash < 2^36
ROLL_MUL = 31


def norm_text(col: Column) -> Column:
    """Canonical text form shared by every fingerprint/dedup operator:
    lowercase, whitespace runs collapsed to one space, trimmed. (The P8
    analog of the extraction spec, applied to already-extracted text.)"""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words_of(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def token_stats(text: Column) -> dict[str, Column]:
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    character stats. All codegen-able expressions."""
    w = words_of(text)
    norm = norm_text(text)
    return {
        "n_ws_tokens": F.size(w),
        "n_bpe_tokens": F.size(F.regexp_extract_all(norm, F.lit(BPE_TOKEN_RE), 0)),
        "n_chars": F.length(norm),
        "n_distinct_tokens": F.size(F.array_distinct(w)),
    }


def quality_features(
    text: Column, norm: Column | None = None, ws: Column | None = None
) -> dict[str, Column]:
    """Quality-scoring features: length, mean token length, punctuation
    ratio, stopword ratio, distinct-token ratio. The composite score is a
    fixed linear blend clamped to [0, 1] — deterministic, unit-tested,
    and cheap enough to run on every page of a 10^12-page crawl.

    Pass pre-materialized ``norm``/``ws`` columns when calling from a
    wide projection (featurize) so the lower/regex/split chain isn't
    re-evaluated per output column."""
    w = ws if ws is not None else words_of(text)
    norm = norm if norm is not None else norm_text(text)
    n_tokens = F.size(w)
    n_chars = F.length(norm)
    # single-space joined => chars excluding separators
    mean_token_len = (n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens
    # ANSI mode (Spark 4 default) makes x/0 an error, not NULL: empty
    # text (n_chars=0, a legal extractor output — P10) must short-circuit
    punct_ratio = F.when(
        n_chars > 0,
        F.size(F.regexp_extract_all(norm, F.lit(r"[^a-z0-9 ]"), 0)).cast("double")
        / n_chars,
    )
    stop_en = F.array([F.lit(s) for s in STOPWORDS["en"]])
    stopword_ratio = (
        F.size(F.array_intersect(F.array_distinct(w), stop_en)).cast("double")
        / F.size(F.array_distinct(w))
    )
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_tokens
    score = (
        F.lit(0.25) * F.least(mean_token_len / F.lit(8.0), F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0)))
        + F.lit(0.25) * F.least(stopword_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.25) * distinct_ratio
    )
    return {
        "n_tokens": n_tokens,
        "mean_token_len": F.round(mean_token_len, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stopword_ratio, 6),
        "distinct_ratio": F.round(distinct_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def lang_scores(text: Column, ws: Column | None = None) -> dict[str, Column]:
    """Language-ID by stopword-profile hit ratio; prediction is the
    argmax with lexicographic tie-break (deterministic). An n-gram model
    would be the production upgrade; the operator shape — per-doc scores
    + argmax, all JVM-side — is identical."""
    distinct = F.array_distinct(ws if ws is not None else words_of(text))
    out: dict[str, Column] = {}
    for lang, stops in sorted(STOPWORDS.items()):
        arr = F.array([F.lit(s) for s in stops])
        out[f"score_{lang}"] = F.round(
            F.size(F.array_intersect(distinct, arr)).cast("double") / F.size(distinct), 6
        )
    out["pred_lang"] = argmax_lang(out)
    return out


def argmax_lang(scores: dict[str, Column]) -> Column:
    """Deterministic argmax with lang-ascending tie-break: greatest() +
    one linear CASE chain. Hot paths should pass *bound* score columns
    (featurize materializes them first) — Catalyst inlines expression
    arguments without CSE, and a when/otherwise fold that re-nests the
    running max duplicates every score subtree exponentially."""
    langs = sorted(STOPWORDS)
    mx = F.greatest(*[scores[f"score_{lang}"] for lang in langs])
    pred = F.when(scores[f"score_{langs[0]}"] == mx, F.lit(langs[0]))
    for lang in langs[1:]:
        pred = pred.when(scores[f"score_{lang}"] == mx, F.lit(lang))
    return pred


# Gopher rule-set constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1 —
# the MassiveText quality heuristics, the published baseline every
# web-text curation stack starts from). The stopword list is the
# paper's own 8-word English list, distinct from the per-language
# profiles above.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_rules(text: Column) -> dict[str, Column]:
    """The seven Gopher/MassiveText document-quality rules as pure JVM
    column expressions, plus the conjunction ``keep``.

    Every ratio threshold is evaluated as a multiplied-out BIGINT
    comparison (``10*n_symbols <= n_words`` instead of
    ``n_symbols/n_words <= 0.1``) so the verdicts are integer-exact —
    no float division can make the two engines disagree at the
    boundary. Counters ride along in the output so a curation report
    can show WHY a document failed, not just that it did:

    - r_word_count:    50 <= words <= 100,000
    - r_mean_word_len: mean word length in [3, 10]
    - r_symbol_ratio:  (# of '#' + '...') <= 0.1 * words
    - r_ellipsis_lines: < 30% of lines end with '...'
    - r_bullet_lines:  >= 90% of lines do NOT start with a bullet
    - r_alpha_words:   >= 80% of words contain an alphabetic char
    - r_stopwords:     >= 2 distinct hits on the paper's stopword list

    Scale shape: one codegen projection over the scan — zero shuffles,
    zero Python; at 10^12 pages this is a map-only gate fused into
    whatever scan feeds it (same discipline as quality_features)."""
    norm = norm_text(text)
    ws = F.split(norm, " ")
    n_words = F.size(ws).cast("long")
    # single-space joined => word chars = chars minus the separators
    word_chars = (F.length(norm) - (n_words - F.lit(1))).cast("long")
    n_alpha_words = F.size(
        F.filter(ws, lambda x: x.rlike("[a-z]"))
    ).cast("long")
    n_hash = (
        F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit("")))
    ).cast("long")
    n_ellipsis = (
        (F.length(norm) - F.length(F.replace(norm, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ).cast("long")
    n_symbols = n_hash + n_ellipsis
    # raw text keeps its line structure (norm collapses whitespace)
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ")
            | ln.startswith("* ")
            | ln.startswith("•"),
        )
    ).cast("long")
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.endswith("..."))
    ).cast("long")
    stop_arr = F.array([F.lit(s) for s in GOPHER_STOPWORDS])
    n_stopword_hits = F.size(
        F.array_intersect(F.array_distinct(ws), stop_arr)
    ).cast("long")
    rules = {
        "r_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "r_mean_word_len": (F.lit(3) * n_words <= word_chars)
        & (word_chars <= F.lit(10) * n_words),
        "r_symbol_ratio": F.lit(10) * n_symbols <= n_words,
        "r_ellipsis_lines": F.lit(10) * n_ellipsis_lines < F.lit(3) * n_lines,
        "r_bullet_lines": F.lit(10) * n_bullet_lines <= n_lines,
        "r_alpha_words": F.lit(10) * n_alpha_words >= F.lit(8) * n_words,
        "r_stopwords": n_stopword_hits >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return {
        "n_words": n_words,
        "word_chars": word_chars,
        "n_symbols": n_symbols,
        "n_lines": n_lines,
        "n_alpha_words": n_alpha_words,
        "n_stopword_hits": n_stopword_hits,
        **rules,
        "keep": keep,
    }


C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def c4_rules(text: Column) -> dict[str, Column]:
    """The C4 cleaning heuristics (Raffel et al., *Exploring the Limits
    of Transfer Learning* — JMLR 2020, §2.2) as pure JVM column
    expressions: the line-level keep predicate plus the page-level drop
    rules, with the cleaned text and the counters behind every verdict.

    Line KEPT iff (all three):
    - it ends in a terminal punctuation mark (``.`` ``!`` ``?`` ``\"``),
    - it has at least ``C4_MIN_LINE_WORDS`` words,
    - it does not mention "javascript" (case-insensitive).

    Page DROPPED if any of:
    - the cleaned text has fewer than ``C4_MIN_SENTENCES`` sentences
      (terminal-punctuation occurrences in the kept lines — the
      deterministic stand-in for the paper's sentence splitter),
    - the raw text contains "lorem ipsum" (case-insensitive),
    - the raw text contains a curly brace (the paper's
      code-page signal).

    The paper's fourth page rule (its external profanity wordlist) is a
    caller-supplied concern: gate on ``decontaminate``-style broadcast
    membership over that list; no list ships here.

    Scale shape: one codegen projection over the scan — zero shuffles,
    zero Python, same discipline as gopher_rules. The cleaned text is
    produced in the same map, so the downstream pipeline (fingerprint,
    dedup, tokenize) fuses onto it without re-reading the raw page."""
    lines = F.split(text, "\n")

    def _kept(ln: Column) -> Column:
        t = F.trim(ln)
        words = F.split(F.regexp_replace(F.lower(t), r"\s+", " "), " ")
        return (
            t.rlike('[.!?"]$')
            & (F.size(words) >= C4_MIN_LINE_WORDS)
            & ~F.lower(ln).contains("javascript")
        )

    kept = F.filter(lines, _kept)
    cleaned = F.array_join(kept, "\n")
    n_lines = F.size(lines).cast("long")
    n_kept_lines = F.size(kept).cast("long")
    n_sentences = F.regexp_count(cleaned, F.lit("[.!?]")).cast("long")
    d_lorem = F.lower(text).contains("lorem ipsum")
    d_brace = text.contains("{")
    r_min_sentences = n_sentences >= C4_MIN_SENTENCES
    return {
        "n_lines": n_lines,
        "n_kept_lines": n_kept_lines,
        "n_sentences": n_sentences,
        "d_lorem": d_lorem,
        "d_brace": d_brace,
        "r_min_sentences": r_min_sentences,
        "keep": ~d_lorem & ~d_brace & r_min_sentences,
        "cleaned_text": cleaned,
    }


def md5_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (hex)."""
    return F.md5(norm_text(text))


def md5_fingerprint60(text: Column) -> Column:
    """60-bit integer form (first 15 hex digits) — join/bucket key."""
    return F.conv(F.substring(md5_fingerprint(text), 1, 15), 16, 10).cast("long")


def word_hash28(word: Column) -> Column:
    """28-bit word hash (first 7 md5 hex digits) — small enough that the
    rolling-hash fold below cannot overflow int64 in either engine."""
    return F.conv(F.substring(F.md5(word), 1, 7), 16, 10).cast("long")


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: sequential polynomial
    rolling hash over word hashes, ``acc = (acc*31 + h(w)) mod 2^31-1``.

    Unlike the md5 fingerprint this changes under word reordering —
    the pair (md5_fp, rolling_fp) distinguishes "same bag of words" from
    "same sequence". Sequential left fold => byte-identical in DuckDB's
    list_reduce."""
    return F.aggregate(
        words_of(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * F.lit(ROLL_MUL) + word_hash28(w)) % F.lit(ROLL_MOD),
    )


def compression_ratio_udf():
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    Gopher-style quality signal the column-expression features can't
    express: highly repetitive or templated text compresses far below
    natural prose (~0.3-0.5), random/encrypted junk sits near 1.0.

    A vectorized Arrow pandas UDF (zlib level 6, deterministic output
    for a given input — DEFLATE with fixed settings is reproducible
    across platforms); this is one of the sanctioned Python hot paths
    because no JVM column expression computes DEFLATE. There is NO
    DuckDB oracle for it (no SQL compression function) — the catalog
    entry uses the driver's rows-only check and pytest pins exact
    values on fixed strings.

    Returns the UDF; apply as ``compression_ratio_udf()(col)``. Null or
    empty text → ratio null (no information, callers treat as pass).
    """
    import zlib

    import pandas as pd

    def _ratio(texts):
        out = []
        for t in texts:
            if t is None or len(t) == 0:
                out.append(None)
                continue
            raw = t.encode("utf-8")
            out.append(len(zlib.compress(raw, 6)) / len(raw))
        return pd.Series(out, dtype="float64")

    _ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf("double")(_ratio)
