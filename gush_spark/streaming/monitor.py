"""Streaming data-quality monitor — the per-window twin of the batch
expectations audit (operators/validate.py): while the corpus stream
runs, emit per-event-time-window counters (rows, null text, empty
text, length stats) and HLL distinct-fingerprint registers, and fold
them into a windowed quality report (null/empty/dup rates) at read
time.

Why not reuse the batch operator directly: exact COUNT(DISTINCT) is a
streaming non-starter (state = the key set, unbounded), and Spark
refuses the cascaded aggregation a distinct-then-count needs. The
monitor therefore splits along the same line as streaming/sketches:

- counters: ONE watermarked additive aggregation — every metric is a
  sum/min/max, so state per open (window, group) is a handful of longs
  and append mode emits each window exactly once when the watermark
  passes (reference analog: gush's windowed insert counters,
  src/main/scala/io/simao/gush/cep/Cep.scala:29-35);
- distinct fingerprints: the deterministic HLL register aggregation
  (streaming/sketches.windowed_hll_registers over the content
  fingerprint) — ≤ m small rows per window, max-mergeable across
  resumes/backfills;
- report: a read-time join of the two sinks on the window key — rates
  are single divisions; the dup rate is an ESTIMATE (HLL ±~1.04/√m),
  explicitly suffixed ``_est``, unlike the batch audit's exact form.

Both stages run identically on a batch frame (no watermark), which is
what the stream≡batch equivalence test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import md5_fingerprint, norm_text
from gush_spark.operators.sketches import finalize_registers
from gush_spark.streaming.sketches import windowed_hll_registers


def windowed_quality_counters(
    df: DataFrame,
    *,
    ts_col: str,
    text_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Additive per-window counters: ``(window_start, group…, n_rows,
    n_null_text, n_empty, n_nonnull, sum_chars, min_chars, max_chars)``.
    One watermarked aggregation; all metrics merge associatively, so a
    resumed run or batch backfill sums/extremes into the same window
    without special handling."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    t = F.col(text_col)
    proj = df.select(
        F.col(ts_col).alias("_ts"),
        *group_cols,
        t.isNull().cast("int").alias("_null"),
        (t.isNotNull() & (norm_text(t) == "")).cast("int").alias("_empty"),
        F.length(t).alias("_len"),
    )
    return (
        proj.groupBy(
            F.window(F.col("_ts"), window_duration).alias("w"), *group_cols
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_null").alias("n_null_text"),
            F.sum("_empty").alias("n_empty"),
            F.count("_len").alias("n_nonnull"),
            F.sum("_len").cast("long").alias("sum_chars"),
            F.min("_len").cast("long").alias("min_chars"),
            F.max("_len").cast("long").alias("max_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_rows",
            "n_null_text",
            "n_empty",
            "n_nonnull",
            "sum_chars",
            "min_chars",
            "max_chars",
        )
    )


def windowed_fingerprint_registers(
    df: DataFrame,
    *,
    ts_col: str,
    text_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: tuple[str, ...] = (),
    m_bits: int = 8,
) -> DataFrame:
    """HLL registers over the content fingerprint per window — the
    bounded-state stand-in for exact distinct-content counting."""
    return windowed_hll_registers(
        df,
        ts_col=ts_col,
        key=md5_fingerprint(F.col(text_col)),
        window_duration=window_duration,
        watermark_delay=watermark_delay,
        group_cols=group_cols,
        m_bits=m_bits,
    )


def quality_monitor_report(
    counters: DataFrame,
    registers: DataFrame,
    *,
    group_cols: tuple[str, ...] = (),
    m_bits: int = 8,
) -> DataFrame:
    """Read-time fold of the two monitor sinks into one report row per
    (window, group): exact null/empty rates + estimated distinct
    contents and dup rate. Duplicate (window, bucket) register rows
    max-merge inside the finalizer, so resumed runs never double-count.
    The estimate can exceed ``n_nonnull`` slightly at tiny cardinality;
    ``dup_rate_est`` clamps at 0 rather than reporting a negative
    rate."""
    keys = ["window_start", *group_cols]
    est = finalize_registers(
        registers, keys, m_bits=m_bits, out="approx_distinct_contents"
    )
    j = counters.join(est, keys, "left")
    dup_est = (
        F.col("n_nonnull") - F.col("approx_distinct_contents")
    ).cast("double") / F.col("n_rows")
    return j.select(
        *keys,
        "n_rows",
        "n_null_text",
        "n_empty",
        (F.col("n_null_text").cast("double") / F.col("n_rows")).alias(
            "null_rate"
        ),
        (F.col("n_empty").cast("double") / F.col("n_rows")).alias(
            "empty_rate"
        ),
        (F.col("sum_chars").cast("double") / F.col("n_nonnull")).alias(
            "avg_chars"
        ),
        "min_chars",
        "max_chars",
        F.coalesce(F.col("approx_distinct_contents"), F.lit(0)).alias(
            "approx_distinct_contents"
        ),
        F.greatest(dup_est, F.lit(0.0)).alias("dup_rate_est"),
    )
