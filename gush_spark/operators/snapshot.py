"""Corpus snapshot diff — the audit step between two versions of a
crawled corpus (yesterday's curated set vs today's): which documents
were added, removed, changed in content, or carried unchanged.

No reference analog (the reference streams a live binlog and never
compares table versions, `src/main/scala/io/simao/gush/binlog/`);
this is the batch complement to the incremental batch-vs-corpus dedup
family (operators/incremental.py): incremental decides what to APPEND,
the diff reports what actually CHANGED between published versions —
the dataset-card delta a release manager signs off on.

Scale shape (the whole point at 10^12 docs):
- each side is projected map-only to ``(id, 16-byte md5 content
  fingerprint)`` before anything joins — raw text NEVER crosses an
  exchange, the wire carries ~48 bytes/doc;
- the diff is ONE full-outer equi-join keyed by document id. On a
  real lakehouse both snapshot versions of the same table share a
  layout (same bucketing/partitioning), so the join co-locates and
  the exchange is only the fingerprint projection;
- the summary is a partial-combinable count over the 4-value status
  column — map-side combine reduces it to ≤ 4 rows per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import md5_fingerprint

ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def snapshot_fingerprints(
    snap: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Map-only ``(id, fp)`` projection — the only thing the diff ever
    shuffles. Null text fingerprints to NULL and is treated as its own
    content value (null → non-null counts as changed)."""
    return snap.select(
        F.col(id_col).alias("_id"), md5_fingerprint(F.col(text_col)).alias("fp")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per document id present in either snapshot:
    ``(id, old_fp, new_fp, status)`` with status ∈ {added, removed,
    changed, unchanged}. ``changed`` compares content fingerprints
    null-safely (null text on one side only ⇒ changed)."""
    o = snapshot_fingerprints(old, id_col, text_col).withColumnRenamed("fp", "old_fp")
    n = snapshot_fingerprints(new, id_col, text_col).withColumnRenamed("fp", "new_fp")
    oin = F.lit(True).alias("_o")
    nin = F.lit(True).alias("_n")
    j = o.select("*", oin).join(n.select("*", nin), "_id", "full_outer")
    status = (
        F.when(F.col("_o").isNull(), F.lit(ADDED))
        .when(F.col("_n").isNull(), F.lit(REMOVED))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return j.select(
        F.col("_id").alias(id_col), "old_fp", "new_fp", status.alias("status")
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """≤ 4-row rollup of the diff: ``(status, n)`` — the dataset-card
    delta. Partial-combinable count; the only exchange is the diff's
    own id-keyed join."""
    return (
        snapshot_diff(old, new, id_col, text_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
