"""Freshness-driven recrawl prioritization — the crawl-scheduling
question gush's insert/crawl vs update/recrawl flows (operators/
events.py F4/F5, reference cep/Cep.scala) leave to the operator: given
the observed fetch history of every page, WHICH pages should the
crawler revisit first?

The estimator is the classic change-rate × staleness policy (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
TODS 2003, re-expressed in this repo's integer discipline): pages that
changed often when observed, and that haven't been fetched for a long
time, owe the most expected novelty.

    change_rate_ppm = (n_changes · 10^6) DIV n_obs        [parts/million]
    staleness_s     = (corpus_now_us − last_seen_us) DIV 10^6
    priority        = staleness_s · change_rate_ppm

All BIGINT, every operand non-negative — truncating DIV == floor in
both engines, sums order-free, oracle hash-exact. ``corpus_now`` is
the max event time over the corpus (a replay must not depend on
wall-clock — the bench/backfill convention used by the decayed-trending
finalize), carried to every row via a 1-row broadcast join (the DSIR
totals pattern), NOT a driver collect.

Scale shape: ONE key-keyed partial-combinable aggregation (count,
conditional count, max) + the 1-row scalar join; top-k rides
orderBy+limit (TakeOrderedAndProject). The observation log is the
events table at rest — the same additive facts a streaming counter
sink accumulates, so the priority table is a read-time finalize over
state a stream already keeps (the read_salted_rollup discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recrawl_priorities(
    observations: DataFrame,
    key_col: str,
    ts_col: str,
    changed_col: Column,
    *,
    k: int | None = None,
) -> DataFrame:
    """Per-key recrawl priority from an observation log: one row per
    key — ``(key, n_obs, n_changes, change_rate_ppm, staleness_s,
    priority)``, plus a ``rnk`` column (priority-descending, key
    tie-break) when ``k`` limits to the top-k.

    ``changed_col`` is a caller-supplied boolean column marking the
    observations where the fetched content differed from the previous
    fetch (e.g. a fingerprint mismatch from snapshot.diff or an
    update/recrawl event kind)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_key = observations.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(changed_col.cast("long")).alias("n_changes"),
        F.max(us).alias("_last_us"),
    )
    now = observations.agg(F.max(us).alias("_now_us"))
    scored = (
        # 1-row broadcast nested-loop join: the corpus scalar rides to
        # every key without a driver collect (the DSIR totals pattern)
        per_key.join(F.broadcast(now))
        .select(
            key_col,
            "n_obs",
            "n_changes",
            F.expr("n_changes * 1000000 DIV n_obs").alias("change_rate_ppm"),
            F.expr("(_now_us - _last_us) DIV 1000000").alias("staleness_s"),
        )
        .withColumn(
            "priority", F.expr("staleness_s * change_rate_ppm")
        )
    )
    if k is None:
        return scored
    top = scored.orderBy(F.desc("priority"), key_col).limit(k)
    w = Window.orderBy(F.desc("priority"), key_col)
    return top.select(
        "*", F.row_number().over(w).cast("long").alias("rnk")
    )
