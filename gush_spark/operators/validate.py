"""Data-expectation validation — the per-source quality audit a
pipeline runs before (and after) every curation wave: null/empty text
rates, exact-duplicate rates, and length stats, plus a thresholded
violation gate that turns the report into a pass/fail signal per
source.

No reference analog (the reference trusts its binlog rows,
`src/main/scala/io/simao/gush/binlog/BinlogEvent.scala`); this is the
Great-Expectations-shaped guardrail a 10^12-page corpus needs because
a single broken source (a crawler emitting empty bodies, a feed
duplicating itself) silently poisons a mixture.

Scale shape:
- ONE pass over the corpus: every metric is a partial-combinable
  aggregate keyed by source, map-side combined before the exchange;
- the duplicate count rides ``count(DISTINCT fingerprint)`` — exact,
  which Spark plans as an expand + two-stage agg shuffling 16-byte
  fingerprints. At 10^12 rows swap in the mergeable HLL sketch
  (operators/sketches.py) for a one-pass approximate distinct; this
  report keeps the exact form because release gates want exact dup
  counts at audit time;
- rates are single long/long divisions — one correctly-rounded IEEE
  op on identical inputs, hash-exact across engines;
- the violation gate is a map-only projection over the ≤ |sources|
  row report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import md5_fingerprint, norm_text


def expectations_report(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-``group_col`` audit row: counts, null/empty/dup rates and
    character-length stats. ``n_empty`` counts rows whose NORMALIZED
    text is empty (whitespace-only bodies count as empty); ``n_dups``
    is rows minus distinct content fingerprints over non-null text."""
    t = F.col(text_col)
    # materialize the derived columns once, map-only, so the
    # count-distinct expand exchanges the 16-byte digest column — the
    # raw text stays behind the scan
    proj = docs.select(
        group_col,
        t.isNull().alias("_null"),
        (t.isNotNull() & (norm_text(t) == "")).alias("_empty"),
        md5_fingerprint(t).alias("_fp"),
        F.length(t).alias("_len"),
    )
    agg = proj.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_null").cast("int")).alias("n_null_text"),
        F.sum(F.col("_empty").cast("int")).alias("n_empty"),
        F.count_distinct("_fp").alias("n_distinct"),
        F.count("_len").alias("_n_nonnull"),
        F.min("_len").cast("long").alias("min_chars"),
        F.max("_len").cast("long").alias("max_chars"),
        F.sum("_len").cast("long").alias("_sum_chars"),
    )
    return agg.select(
        group_col,
        "n_rows",
        "n_null_text",
        "n_empty",
        "n_distinct",
        (F.col("_n_nonnull") - F.col("n_distinct")).alias("n_dups"),
        (F.col("n_null_text").cast("double") / F.col("n_rows")).alias(
            "null_rate"
        ),
        (
            (F.col("_n_nonnull") - F.col("n_distinct")).cast("double")
            / F.col("n_rows")
        ).alias("dup_rate"),
        "min_chars",
        "max_chars",
        (F.col("_sum_chars").cast("double") / F.col("_n_nonnull")).alias(
            "avg_chars"
        ),
    )


def expectation_violations(
    report: DataFrame,
    *,
    min_rows: int = 1,
    max_null_rate: float = 0.01,
    max_dup_rate: float = 0.2,
    min_avg_chars: float = 0.0,
) -> DataFrame:
    """Thresholded gate over the report: per-source boolean flags plus
    an overall ``ok``. Map-only over the tiny report frame — thresholds
    are plan literals, identical on both engines (no float arithmetic
    beyond the report's own single divisions)."""
    too_few = F.col("n_rows") < min_rows
    nulls = F.col("null_rate") > max_null_rate
    dups = F.col("dup_rate") > max_dup_rate
    short = F.col("avg_chars") < min_avg_chars
    return report.select(
        "*",
        too_few.alias("viol_min_rows"),
        nulls.alias("viol_null_rate"),
        dups.alias("viol_dup_rate"),
        short.alias("viol_avg_chars"),
        (~(too_few | nulls | dups | short)).alias("ok"),
    )
