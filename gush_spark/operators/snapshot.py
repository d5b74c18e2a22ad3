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


DRIFT_SCALE = 1_000_000_000


def drift_report(
    old: DataFrame,
    new: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    *,
    buckets: int = 16,
    width: int = 32,
) -> DataFrame:
    """Per-source distribution drift between two snapshot versions: the
    L1 (total-variation x2) distance between the old and new histograms
    of normalized text length, in fixed point — the monitoring
    complement of :func:`snapshot_diff` (the diff says WHICH documents
    changed; the drift report says whether a source's SHAPE changed —
    a crawler that suddenly returns truncated pages or boilerplate
    shifts the length histogram long before anyone reads a document).

    Returns ``(source, n_old, n_new, drift_x1e9)`` where

        p_b   = count_old(b)·1e9 DIV n_old     (0 when the side is empty)
        q_b   = count_new(b)·1e9 DIV n_new
        drift_x1e9 = Σ_b |p_b − q_b|           ∈ [0, ~2e9]

    over ``buckets`` histogram bins of ``length(norm_text) DIV width``
    (clamped to the last bin). All-BIGINT: exact counts, truncating
    division, integer abs — the DuckDB oracle is hash-exact. Overflow
    budget: ``count·1e9`` must fit int64, so a single SOURCE may hold
    up to ~9.2·10^9 docs; beyond that lower ``DRIFT_SCALE`` (drift is
    scale-invariant in ranking) or split sources.

    Scale shape: each side is ONE map-only projection to a (source,
    bucket) pair + a partial-combinable count — at 10^12 docs the wire
    carries histograms (sources x buckets rows), never documents; the
    full-outer bucket alignment and the per-source rollup operate on
    that reduced frame. Totals ride a source-keyed broadcast-size join.
    """
    def hist(snap: DataFrame, cname: str):
        b = F.least(
            (F.length(
                F.trim(
                    F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
                )
            ) / F.lit(width)).cast("long"),
            F.lit(buckets - 1),
        ).alias("b")
        rows = snap.select(F.col(source_col).alias("source"), b)
        counts = rows.groupBy("source", "b").agg(
            F.count(F.lit(1)).alias(cname)
        )
        totals = rows.groupBy("source").agg(
            F.count(F.lit(1)).alias(f"t_{cname}")
        )
        return counts, totals

    oc, ot = hist(old, "c_old")
    nc, nt = hist(new, "c_new")
    aligned = oc.join(nc, on=["source", "b"], how="full_outer").select(
        "source",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    tot = ot.join(nt, on="source", how="full_outer").select(
        "source",
        F.coalesce("t_c_old", F.lit(0)).alias("n_old"),
        F.coalesce("t_c_new", F.lit(0)).alias("n_new"),
    )
    scored = aligned.join(tot, on="source").select(
        "source",
        "n_old",
        "n_new",
        F.abs(
            F.when(
                F.col("n_old") > 0,
                F.expr(f"c_old * {DRIFT_SCALE}L DIV n_old"),
            ).otherwise(F.lit(0))
            - F.when(
                F.col("n_new") > 0,
                F.expr(f"c_new * {DRIFT_SCALE}L DIV n_new"),
            ).otherwise(F.lit(0))
        ).alias("_d"),
    )
    return scored.groupBy("source").agg(
        F.max("n_old").cast("long").alias("n_old"),
        F.max("n_new").cast("long").alias("n_new"),
        F.sum("_d").cast("long").alias("drift_x1e9"),
    )
