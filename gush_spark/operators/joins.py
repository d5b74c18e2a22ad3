"""Join operators (SURVEY.md §2.4).

The reference has no explicit join: MySQL resolves "update vs prior row"
before gush sees the event (BinlogEvent.scala:39-41 carries whereFields +
updatedFields side by side). The north_star makes that join explicit:

J1  page-event vs prior-crawl state — "enrich each recrawl/drop with the
    previous event of the same key". Batch form: ``lag() OVER
    (PARTITION BY key ORDER BY ts)`` — one shuffle on key, no join at
    all (the window function is the cheapest possible plan; an actual
    self-join would shuffle twice). Streaming form lives in
    gush_spark.streaming.cep (keyed state).

J2  dimension enrichment — broadcast hash join against a small dim
    table; never a shuffle on the fact side.

Scale notes: J1's shuffle partitions on the state key (user/host); skew →
use salting upstream or AQE skew handling. J2 must stay a
BroadcastHashJoin — ``broadcast()`` hint is applied unconditionally so a
cold-statistics catalog can't demote it to sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_prior_event(
    df: DataFrame,
    key: str,
    ts_col: str,
    carry: list[str],
    order_tiebreak: str | None = None,
) -> DataFrame:
    """J1 batch form: append ``prior_<c>`` columns with the previous
    event's values per key, event-time ordered.

    ``order_tiebreak`` breaks equal-timestamp ties deterministically
    (required for oracle-exact output; pass the event id).
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    out = df
    for c in carry:
        out = out.withColumn(f"prior_{c}", F.lag(c).over(w))
    return out


def enrich_with_dim(fact: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """J2: broadcast hash join against a small dimension table."""
    return fact.join(F.broadcast(dim), on=on, how="left")
