"""Per-source vocabulary-divergence report — how far each source's
WORD distribution sits from the corpus-wide distribution, as a
fixed-point L1 (total-variation ×2) distance over hashed vocabulary
buckets.

The curation decision this powers: a source whose vocabulary
distribution diverges hard from the corpus is either a different
register worth keeping for diversity or boilerplate/spam worth
gating — either way it is the first column a data-mixing review sorts
by (the practical stand-in for the KL term in importance-sampling
selection schemes; see operators/importance.py for the DSIR form that
scores individual DOCUMENTS — this scores SOURCES). Distinct from
snapshot.drift_report, which compares two snapshots of the SAME corpus
on a length histogram; this compares each slice against the whole on
vocabulary.

No reference analog (gush has no corpus-statistics surface; driver
brief's text-analysis mandate).

Exactness: words are the shared ``words_of`` split; each word maps to
one of ``n_buckets`` hash buckets via the repo's md5-prefix integer
(identical hex in both engines, non-negative, so ``% n_buckets``
agrees); per-slice and corpus distributions are integer ppb
(``count·10^9 DIV total`` — non-negative, truncating DIV ≡ floor
``//``); the L1 sum is an order-free BIGINT sum. Hash-exact by
construction.

Why hashed buckets and not raw words: the corpus vocabulary at
10^12 pages is billions of terms; a fixed bucket table makes the
distribution a BOUNDED vector (n_buckets rows per source) while
preserving L1 distance in expectation (each bucket aggregates a
random vocabulary slice — the same sketching argument as SimHash's
random projections). Raising ``n_buckets`` sharpens the estimate at
linear cost.

Scale shape: one map-side-combinable (source, bucket) count, one
source total, one bucket-level corpus rollup of the SAME counts (no
second corpus pass), one broadcast-able join of the n_buckets-sized
corpus vector, and a source-keyed final sum. Raw text never crosses
an exchange — only (source, bucket, count) triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of

PPB = 1_000_000_000


def source_vocab_divergence(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """``(source, n_tokens, l1_x1e9)`` per source: the L1 distance
    between the source's and the corpus's hashed-vocabulary
    distributions, both in integer parts-per-billion. 0 = identical
    mix, 2·10^9 = disjoint vocabularies.

    Buckets the source never uses still contribute the corpus mass
    ``|0 − q_b|`` — materialized by aggregating over the corpus
    bucket vector LEFT-joined with the source's counts, so absent
    buckets are zeros, not dropped rows.
    """
    words = docs.select(
        F.col(source_col).alias("source"),
        F.explode(words_of(F.col(text_col))).alias("_w"),
    ).filter(F.col("_w") != "")
    bucketed = words.select(
        "source",
        (
            F.conv(F.substring(F.md5(F.col("_w")), 1, 8), 16, 10).cast("long")
            % int(n_buckets)
        ).alias("bucket"),
    )
    per_src = bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_sb")
    )
    src_tot = per_src.groupBy("source").agg(
        F.sum("c_sb").cast("long").alias("n_s")
    )
    # corpus vector: a rollup of the SAME per-source counts (one scan)
    corpus = per_src.groupBy("bucket").agg(
        F.sum("c_sb").cast("long").alias("c_b")
    )
    corpus_tot = corpus.agg(F.sum("c_b").cast("long").alias("n_tot"))
    corpus_vec = corpus.join(F.broadcast(corpus_tot), how="cross").select(
        "bucket", F.expr(f"c_b * {PPB}L DIV n_tot").alias("q_ppb")
    )
    # every (source, bucket) cell, including source-absent buckets
    grid = src_tot.crossJoin(F.broadcast(corpus_vec))
    cells = grid.join(per_src, on=["source", "bucket"], how="left").select(
        "source",
        "n_s",
        "q_ppb",
        F.coalesce(F.col("c_sb"), F.lit(0)).cast("long").alias("c_sb"),
    )
    return (
        cells.select(
            "source",
            "n_s",
            F.abs(
                F.expr(f"c_sb * {PPB}L DIV n_s") - F.col("q_ppb")
            ).alias("_d"),
        )
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.sum("_d").cast("long").alias("l1_x1e9"),
        )
    )


def hapax_report(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source hapax-legomenon profile — the OCR-noise / gibberish
    screen classical corpus linguistics runs first: tokens whose
    CORPUS-WIDE count is exactly 1 ("hapax legomena"). A healthy text
    source shows a stable hapax share (Zipf's tail); a source full of
    broken encodings, random ids, or OCR shrapnel spikes it, and a
    boilerplate mill collapses it.

        (source, n_tokens, n_types, n_hapax,
         hapax_token_ppm, hapax_type_ppm)

    ``n_types`` counts distinct words in the source; a corpus-hapax
    word necessarily belongs to exactly one source (count 1), so the
    per-source hapax counts partition the global hapax set. Both
    shares are truncating BIGINT ppm — hash-exact.

    Scale shape: one (source, word-hash) count (md5 keys on the wire,
    never raw words beyond the agg buffer), a word-level corpus rollup
    of the SAME counts (no second scan), and the hapax flag rides a
    join keyed by the word hash. The divergence-report discipline with
    the full vocabulary instead of 64 buckets — this one needs exact
    count-1 identification, so it pays the vocabulary-sized (but
    heavily combinable) shuffle that source_vocab_divergence's sketch
    avoids."""
    from gush_spark.functions.text_analysis import words_of

    words = docs.select(
        F.col(source_col).alias("source"),
        F.explode(words_of(F.col(text_col))).alias("_w"),
    ).filter(F.col("_w") != "")
    keyed = words.select("source", F.md5(F.col("_w")).alias("wk"))
    per_src = keyed.groupBy("source", "wk").agg(
        F.count(F.lit(1)).cast("long").alias("c_sw")
    )
    corpus = per_src.groupBy("wk").agg(
        F.sum("c_sw").cast("long").alias("c_w")
    )
    flagged = per_src.join(corpus, on="wk").select(
        "source",
        "c_sw",
        (F.col("c_w") == 1).cast("long").alias("_hx"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("c_sw").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("_hx").cast("long").alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("n_hapax * 1000000L DIV n_tokens").alias("hapax_token_ppm"),
            F.expr("n_hapax * 1000000L DIV n_types").alias("hapax_type_ppm"),
        )
    )
