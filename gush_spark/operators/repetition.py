"""Repetition-based quality scores — the Gopher/C4-style filters that
catch machine-generated or boilerplate-looped pages that length/
punctuation ratios (functions/text_analysis.quality_features) miss:
a page that repeats one phrase thousands of times has fine length and
punctuation stats but a degenerate n-gram distribution.

Per document:
- ``top_token_frac``      — occurrences of the most frequent token / n_tokens
- ``distinct_token_ratio`` — distinct tokens / n_tokens
- ``top_bigram_frac``     — occurrences of the most frequent word 2-gram
                            / (n_tokens - 1) (the number of bigram slots)

Scale design: one explode over (unigrams ∪ bigrams) tagged by n, then
two map-side-combinable hash aggregations — first (doc, n, md5(gram))
counts, then per-doc maxima. The shuffle key carries the gram's
16-byte md5, never the gram text (same discipline as
queries_pipeline.frequent_phrases_hashed); a per-row higher-order-
function mode computation would avoid the shuffle but runs interpreted
(no codegen for lambda bodies) and is O(n·distinct) per doc — at
10k-token web pages the exploded agg wins and scales out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of


def repetition_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc repetition scores; docs with ≥1 token appear in the
    output. ``top_bigram_frac`` is 0.0 for single-token docs."""
    ws = words_of(F.col(text_col))
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(
        F.transform(ws, lambda w: F.struct(F.lit(1).alias("n"), w.alias("g"))),
        F.transform(bigrams, lambda b: F.struct(F.lit(2).alias("n"), b.alias("g"))),
    )
    exploded = df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_tokens"),
        F.explode(grams).alias("gram"),
    ).select(
        id_col, "n_tokens", F.col("gram.n").alias("n"), F.md5("gram.g").alias("gk")
    )
    counts = exploded.groupBy(id_col, "n_tokens", "n", "gk").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy(id_col, "n_tokens").agg(
        F.max(F.when(F.col("n") == 1, F.col("c"))).alias("_umax"),
        F.sum(F.when(F.col("n") == 1, F.lit(1))).alias("_udistinct"),
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("_bmax"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        (F.col("_umax").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
        (F.col("_udistinct").cast("double") / F.col("n_tokens")).alias(
            "distinct_token_ratio"
        ),
        (
            F.coalesce(F.col("_bmax"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens") - 1, F.lit(1))
        ).alias("top_bigram_frac"),
    )
