"""Trending terms per event-time window — the canonical streaming
analytics composite (trending hashtags/queries): token counts per
tumbling window, then the top-k per window.

Works identically on a batch or a watermarked streaming input: the
count is ONE windowed aggregation (streaming: append-mode emit when
the watermark passes; state is one counter per (window, term-key)
inside the horizon). The top-k stage is batch-side (read time /
foreachBatch) because cascaded streaming aggregations are not a thing —
same layering as streaming/sketches (emit additive state, finalize at
read).

Scale design: ``hash_terms=True`` (default) shuffles (window,
16-byte md5) and recovers the term text as ``min(term)`` inside the
SAME aggregation — the text rides the partial-agg buffer (one value
per key per partition), never a wide exchange; identical discipline to
queries_pipeline.frequent_phrases_hashed. The top-k rank filter
compiles to a Partial WindowGroupLimit below the exchange (see
top_docs_per_source), so the second shuffle carries ≤ k·windows·
partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of


def windowed_term_counts(
    df: DataFrame,
    *,
    ts_col: str,
    text_col: str,
    window_duration: str,
    watermark_delay: str | None = None,
    hash_terms: bool = True,
) -> DataFrame:
    """(window_start, term, n) token counts per tumbling window."""
    if df.isStreaming and watermark_delay:
        df = df.withWatermark(ts_col, watermark_delay)
    toks = df.select(
        F.col(ts_col).alias("_ts"),
        F.explode(words_of(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    win = F.window(F.col("_ts"), window_duration)
    if hash_terms:
        counted = (
            toks.withColumn("tk", F.md5("term"))
            .groupBy(win.alias("w"), "tk")
            .agg(F.count(F.lit(1)).alias("n"), F.min("term").alias("term"))
        )
    else:
        counted = toks.groupBy(win.alias("w"), "term").agg(
            F.count(F.lit(1)).alias("n")
        )
    return counted.select(
        F.col("w.start").alias("window_start"), "term", "n"
    )


def top_terms_per_window(counts: DataFrame, k: int) -> DataFrame:
    """Top-k terms per window by count, term-ascending tie-break
    (deterministic, engine-stable). Batch-side stage."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("term")
    )
    return (
        counts.select(
            "window_start",
            "term",
            "n",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= k)
    )
