"""Crawl-politeness gate, batch form — the read-side/replay twin of the
streaming CEP rule (``streaming/cep.py::make_politeness_rule``): at most
``quota`` events per (key, event-time window), every row emitted with
its within-window sequence number and an ``allowed`` flag
(errors-are-data — the scheduler re-queues the deferred rows, nothing
is silently dropped).

Reference analog: the per-host rate discipline gush's event consumers
assume of the upstream feed (SURVEY.md §2.9) — here made an explicit,
replayable operator.

Exactness/determinism:
- windows are fixed-width epoch bins; the bin index is computed with
  INTEGER division over epoch MICROSECONDS (``us DIV window_us``) —
  no float division whose rounding could flip a boundary event into
  the neighboring window, and µs precision matches the streaming
  rule's ``warc_ts_us // window_us`` exactly;
- within a window, rows order by (event-time µs, id) — a total order,
  so ``seq_in_window`` is stable across retries, partitionings and
  engines (the same (ts, id) convention as the streaming rule and the
  session-path miner).

Scale shape: ONE shuffle on (key, window) powering a single
row_number — no joins, no state, corpus rows pass through exactly
once. The streaming form exists because a crawler must gate NOW with
bounded state; this form exists because audits, backfills and
replay-verification want the same verdicts from the corpus at rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_gate(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    quota: int,
    window_s: int,
) -> DataFrame:
    """One row per input event: ``(key, id, window_start_s,
    seq_in_window, allowed)`` — ``seq_in_window`` is the 0-based
    event-time position within the (key, window) bin, ``allowed`` is
    ``seq_in_window < quota``."""
    window_us = window_s * 1_000_000
    # NTZ-safe µs epoch (parquet naive timestamps load as TIMESTAMP_NTZ
    # in Spark 4; session TZ pinned UTC)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    binned = events.select(
        key_col,
        id_col,
        us.alias("_us"),
    ).withColumn(
        # integer division — exact for any epoch; positive epochs make
        # Spark's truncating DIV and DuckDB's flooring // identical
        "window_start_s",
        (F.expr(f"_us DIV {window_us}") * F.lit(window_s)).cast("long"),
    )
    w = Window.partitionBy(key_col, "window_start_s").orderBy("_us", id_col)
    rn = F.row_number().over(w)
    return binned.select(
        key_col,
        id_col,
        "window_start_s",
        (rn - 1).cast("long").alias("seq_in_window"),
        (rn <= F.lit(quota)).alias("allowed"),
    )
