"""Corpus-frequent-line removal — the RefinedWeb/CCNet boilerplate
pass: a line that recurs across many *different* documents (cookie
banners, nav menus, "all rights reserved") is template chrome, not
content, and is stripped from every document while the document's
remaining lines keep their original order.

This is cross-document state (a single doc can't know its line is a
template), which distinguishes it from the per-doc repetition scores
(operators/repetition.py) and the n-gram phrase miner
(queries_pipeline.frequent_phrases).

Scale design (100 TB):
- one explode of (doc, pos, line) keyed by the line's 16-byte md5 —
  raw line text never enters a shuffle;
- doc-frequency per line key via a distinct-(key,doc) count — both
  stages map-side-combinable hash aggs;
- the frequent set is SMALL by construction (a line must clear
  ``min_docs`` distinct docs to qualify — template chrome is a tiny
  fraction of distinct lines), so it is **broadcast** and the removal
  join is a map-only left-anti per partition: the corpus is never
  shuffled for the removal itself;
- reconstruction groups by doc id carrying (pos, line) structs and
  sorts within the doc — bounded by lines-per-doc, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_line_keys(
    exploded: DataFrame, id_col: str, min_docs: int
) -> DataFrame:
    """md5 keys of lines appearing in >= ``min_docs`` distinct docs.

    ``exploded`` must carry ``id_col`` and ``lk`` (line md5).
    """
    return (
        exploded.select(id_col, "lk")
        .distinct()
        .groupBy("lk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("lk")
    )


def remove_frequent_lines(
    df: DataFrame,
    id_col: str,
    lines_col: str,
    *,
    min_docs: int = 2,
    joiner: str = "\n",
) -> DataFrame:
    """Strip corpus-frequent lines from each document.

    ``lines_col`` is an ``array<string>`` of the document's lines.
    Output: ``id_col``, ``clean_text`` (surviving lines joined by
    ``joiner`` in original order; empty string when every line was
    boilerplate), ``n_lines`` (original), ``n_removed``.
    """
    exploded = df.select(
        F.col(id_col), F.posexplode(F.col(lines_col)).alias("pos", "line")
    ).withColumn("lk", F.md5("line"))
    frequent = frequent_line_keys(exploded, id_col, min_docs)
    kept = exploded.join(F.broadcast(frequent), on="lk", how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    # docs whose every line was boilerplate drop out of the groupBy —
    # join back to the id spine so they surface with clean_text = ''
    spine = df.select(F.col(id_col), F.size(F.col(lines_col)).cast("long").alias("n_lines"))
    return (
        spine.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias(
                "n_removed"
            ),
        )
    )
