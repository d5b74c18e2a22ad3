"""Cross-document duplicated-span detection (exact substring dedup).

The signal behind "Deduplicating Training Data Makes Language Models
Better" (Lee et al., ACL 2022): long token spans that recur VERBATIM
across documents — licence blurbs, templated boilerplate, syndicated
paragraphs, memorization bait — are the highest-value removal target
in a web-text corpus, and they are invisible to document-level
near-dup (two mostly-distinct pages sharing one copied paragraph score
a low Jaccard). Lee et al. find them with a suffix array; that is a
single-machine construction. The distributed re-expression here is
windowed hashing with two anchoring strategies:

- **grid** (``span_keys``): every ``window_tokens``-wide window at
  stride ``stride``. stride=1 is exhaustive and exact. stride>1 thins
  cost linearly but the grid is POSITIONAL, so two copies of a run
  only share a window when their offsets are congruent mod ``stride``
  — a 1/stride recall on randomly-placed copies (pinned by test).
  Use it as a cheap sampler, not a guarantee.
- **winnowing** (``winnowed_span_keys``): the content-defined fix
  (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
  Document Fingerprinting", SIGMOD 2003 — the MOSS algorithm). Hash
  every ``window_tokens``-gram, then in each run of ``winnow``
  consecutive hashes select the minimum. Selection depends on content,
  not position, so ANY common run of ``window_tokens + winnow - 1``
  tokens shares a fingerprint regardless of alignment, at ~2/(winnow+1)
  the density of exhaustive windows.

Shared scale shape (100 TB / ~10^11 docs): windows/fingerprints hash
to 16-byte digests BEFORE any exchange — no window text ever shuffles;
the raw explosion reduces to (digest, doc, n_occ) under ONE exchange
(partial+final agg, so the map side combines); per-digest doc counts
come from an unordered window over the reduced pairs — the
duplicated-key set is corpus-sized in the worst case, so it is never
collected, broadcast, or joined. The per-token hashing cost is the
map stage and runs exactly once (plan-audit pinned: single Generate).

Beyond-reference operator: the reference engine (see SURVEY.md §2)
has no corpus-level text analytics; this extends the training-data
curation surface next to dedup.py / decontaminate.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(words: Column, window_tokens: int, stride: int = 1) -> Column:
    """Array of md5 digests of the token windows starting at 1, 1+S,
    … (1-based); empty for docs shorter than one window."""
    return F.when(
        F.size(words) >= window_tokens,
        F.transform(
            F.sequence(
                F.lit(1),
                F.size(words) - F.lit(window_tokens - 1),
                F.lit(stride),
            ),
            lambda i: F.md5(
                F.array_join(F.slice(words, i, window_tokens), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def span_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    stride: int = 1,
) -> DataFrame:
    """(id, wkey) — one row per grid-anchored sliding token window,
    keyed by the md5 of the window text. Documents shorter than
    ``window_tokens`` produce no rows. The digest is computed in the
    SAME stage as the explode, so no window text ever reaches an
    exchange. See the module docstring for the stride>1 recall
    caveat."""
    if window_tokens < 1 or stride < 1:
        raise ValueError("window_tokens and stride must be >= 1")
    # bind the words array once (CollapseProject keeps multi-referenced
    # non-cheap columns materialized) so split() runs once per row
    bound = df.withColumn("_w", F.split(F.col(text_col), " "))
    return bound.select(
        F.col(id_col),
        F.explode(_grams(F.col("_w"), window_tokens, stride)).alias("wkey"),
    )


def winnowed_span_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    winnow: int = 4,
) -> DataFrame:
    """(id, wkey) — one row per DISTINCT winnowing fingerprint per
    document. In every run of ``winnow`` consecutive window digests
    the minimum is selected; adjacent runs mostly re-select the same
    digest, so per-doc distinctness is applied inside the row (an
    array op, before the explode) and density lands near the
    theoretical 2/(winnow+1).

    Guarantee (the reason this exists): any verbatim run of
    ``window_tokens + winnow - 1`` tokens shared by two documents
    yields at least one shared fingerprint, whatever the copies'
    offsets — the full window of ``winnow`` consecutive digests is
    common, and lexicographic min over md5 digests depends only on
    content."""
    if window_tokens < 1 or winnow < 1:
        raise ValueError("window_tokens and winnow must be >= 1")
    bound = df.withColumn("_w", F.split(F.col(text_col), " "))
    # bind the gram-digest array: the winnow lambda slices it winnow
    # times per position, so it must be materialized, not re-derived
    bound = bound.withColumn("_hs", _grams(F.col("_w"), window_tokens))
    fps = F.when(
        F.size(F.col("_hs")) >= winnow,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col("_hs")) - F.lit(winnow - 1)),
                lambda j: F.array_min(F.slice(F.col("_hs"), j, winnow)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return bound.select(F.col(id_col), F.explode(fps).alias("wkey"))


def _dup_report(
    df: DataFrame, keys: DataFrame, id_col: str, min_docs: int
) -> DataFrame:
    """Fold (id, wkey) rows into a per-doc duplication profile; every
    input row keeps a row (zeros for docs that produced no keys).

    Plan: the raw key stream reduces to (digest, doc, n_occ) FIRST —
    one partial+final agg whose exchange is the ONLY place the full
    explosion travels. The per-digest doc count is an unordered window
    count over the reduced pairs — no join, no second scan — and the
    per-doc fold sums occurrence counts. The single float division
    happens once per doc AFTER both counts are final — deterministic
    under any partitioning, so the DuckDB oracle hashes value-equal.

    Skew note: the window buffers one group per digest (its distinct
    docs); a boilerplate span shared by millions of pages spills
    rather than explodes, and such ubiquitous digests are exactly what
    the report exists to surface."""
    from pyspark.sql import Window

    per_key_doc = keys.groupBy("wkey", id_col).agg(
        F.count(F.lit(1)).alias("_n_occ")
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("wkey"))
    per_doc = (
        per_key_doc.withColumn("_n_docs", n_docs)
        .groupBy(id_col)
        .agg(
            F.sum("_n_occ").alias("n_windows"),
            F.sum(
                F.when(F.col("_n_docs") >= min_docs, F.col("_n_occ"))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_dup_windows"),
        )
    )
    out = df.select(id_col).join(per_doc, id_col, "left")
    n_win = F.coalesce(F.col("n_windows"), F.lit(0).cast("long"))
    n_dup = F.coalesce(F.col("n_dup_windows"), F.lit(0).cast("long"))
    return out.select(
        id_col,
        n_win.alias("n_windows"),
        n_dup.alias("n_dup_windows"),
        F.when(n_win > 0, n_dup.cast("double") / n_win)
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    stride: int = 1,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span profile over grid-anchored
    windows: ``n_windows`` (token windows the doc contributes),
    ``n_dup_windows`` (those shared verbatim with ≥ ``min_docs``
    documents, itself included) and ``dup_fraction`` (their ratio; 0.0
    for docs too short to window). ``dup_fraction`` is the
    removal/trim signal: ~1.0 means the whole page is boilerplate, a
    mid-range value localizes a copied paragraph inside original
    text. stride=1 (default) is exact; see module docstring before
    raising it."""
    keys = span_keys(df, id_col, text_col, window_tokens, stride)
    return _dup_report(df, keys, id_col, min_docs)


def winnowed_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    winnow: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplication profile over winnowing fingerprints —
    the crawl-scale tier: ~2/(winnow+1) the explosion of exhaustive
    windows with an alignment-independent catch guarantee for runs of
    ``window_tokens + winnow - 1`` tokens. Columns ``n_fingerprints``
    / ``n_dup_fingerprints`` / ``dup_fraction`` (fingerprints are
    per-doc distinct, so the fraction reads as "share of this doc's
    fingerprinted content seen elsewhere")."""
    keys = winnowed_span_keys(df, id_col, text_col, window_tokens, winnow)
    rep = _dup_report(df, keys, id_col, min_docs)
    return rep.select(
        id_col,
        F.col("n_windows").alias("n_fingerprints"),
        F.col("n_dup_windows").alias("n_dup_fingerprints"),
        "dup_fraction",
    )


def positional_span_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
) -> DataFrame:
    """(id, pos, wkey) — like ``span_keys`` (stride 1) but keeping the
    window's 1-based start token position, for operators that act ON
    the text (removal) rather than just scoring it."""
    if window_tokens < 1:
        raise ValueError("window_tokens must be >= 1")
    bound = df.withColumn("_w", F.split(F.col(text_col), " "))
    grams = F.when(
        F.size(F.col("_w")) >= window_tokens,
        F.transform(
            F.sequence(
                F.lit(1), F.size(F.col("_w")) - F.lit(window_tokens - 1)
            ),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(
                    F.array_join(F.slice(F.col("_w"), i, window_tokens), " ")
                ).alias("wkey"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,wkey:string>>"))
    ex = bound.select(F.col(id_col), F.explode(grams).alias("_g"))
    return ex.select(
        id_col, F.col("_g.pos").alias("pos"), F.col("_g.wkey").alias("wkey")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The ACTION to the report's signal (Lee et al. remove, not just
    measure): delete every token covered by at least one window shared
    verbatim with ≥ ``min_docs`` documents, and return each input row
    with ``clean_text`` (surviving tokens re-joined), ``n_tokens``
    and ``n_removed``. Original-order, whitespace-normalized; docs
    with nothing duplicated (or too short to window) come back intact;
    null text stays null.

    Plan: positional keys reduce per (digest, doc, pos) exactly like
    the report (one exchange for the explosion, window count per
    digest, never a corpus-sized broadcast); the duplicated starts
    fold to ONE array per doc (bounded by the doc's own token count),
    expand to a covered-position set with array ops, and a single
    indexed filter drops covered tokens. Everything after the fold is
    per-row array work — no shuffle touches text except the final
    (id → clean_text) join keyed by id."""
    keys = positional_span_keys(df, id_col, text_col, window_tokens)
    from pyspark.sql import Window

    n_docs = F.count(F.lit(1)).over(Window.partitionBy("wkey"))
    # reduce to one row per (digest, doc) carrying all its start
    # positions, so the per-digest window sees distinct docs only
    per_key_doc = keys.groupBy("wkey", id_col).agg(
        F.collect_list("pos").alias("_starts")
    )
    dup_starts = (
        per_key_doc.withColumn("_n_docs", n_docs)
        .where(F.col("_n_docs") >= min_docs)
        .groupBy(id_col)
        .agg(F.flatten(F.collect_list("_starts")).alias("_dup_starts"))
    )
    joined = df.join(dup_starts, id_col, "left").withColumn(
        "_w", F.split(F.col(text_col), " ")
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce("_dup_starts", F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + F.lit(window_tokens - 1)),
            )
        )
    )
    bound = joined.withColumn("_covered", covered)
    kept = F.filter(
        F.col("_w"),
        lambda x, i: ~F.array_contains(F.col("_covered"), i + F.lit(1)),
    )
    return bound.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("long"))
        .otherwise(F.size("_w").cast("long")).alias("n_tokens"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("long"))
        .otherwise(F.size("_covered").cast("long")).alias("n_removed"),
    )
