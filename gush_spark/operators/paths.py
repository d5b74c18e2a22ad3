"""Session path mining — per-session ordered event-type journeys and
their frequency table: the funnel/user-journey analysis that sits next
to CEP (CEP asks "did THIS pattern happen"; path mining asks "WHICH
patterns happen, how often") — the view a curator reads to discover
the crawl/recrawl/drop sequences worth turning into CEP rules.

Reference analog: the rule sequences gush matches one-at-a-time
(`src/main/scala/io/simao/gush/cep/Cep.scala`) — here inverted into a
corpus-wide inventory of ALL observed sequences.

Determinism/exactness:
- sessionization is the SAME lag-gap convention as the session-window
  oracles (strictly-greater gap starts a new session; the cumulative
  flag sum is order-safe on tied timestamps because tied rows
  contribute 0 either way);
- within a session, steps order by (ts, id) — a total order, so the
  concatenated path string is engine-exact;
- paths cap at ``max_steps`` BEFORE aggregation via a row_number
  filter (both engines run the identical filter), with a
  ``truncated`` flag — a 10^5-event bot session must not build a
  10^5-term string.

Scale shape:
- ONE user-keyed sort powers the session flag, the cumulative sum and
  the step numbers (three window functions over the same partitioning
  — one exchange, the CEP-replay-batch discipline);
- the per-session aggregation carries ≤ ``max_steps`` small event-type
  strings per session;
- the frequency table is vocabulary-sized (distinct paths), and top-k
  rides orderBy+limit (TakeOrderedAndProject — per-partition heads,
  never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    *,
    gap_s: int = 1800,
    max_steps: int = 8,
    sep: str = ">",
) -> DataFrame:
    """One row per (user, session): ``(user, sess_id, path, n_steps,
    truncated)`` — the session's first ``max_steps`` event types in
    event-time order joined by ``sep``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    # Gap test at MICROSECOND precision (unix_micros of the NTZ-safe
    # timestamp cast, session TZ pinned UTC): the oracle compares
    # full-precision intervals (ts - lag(ts) > INTERVAL), so a
    # whole-second truncation here would split/merge sessions whose true
    # gap straddles the boundary by a fraction of a second — parquet
    # timestamps carry µs, and µs == full precision for them.
    new_sess = (
        prev.isNull()
        | (
            (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
            )
            > F.lit(int(gap_s) * 1_000_000).cast("long")
        )
    ).cast("long")
    sessioned = events.select(
        user_col,
        ts_col,
        id_col,
        type_col,
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    w2 = Window.partitionBy(user_col, "sess_id").orderBy(ts_col, id_col)
    numbered = sessioned.select(
        user_col,
        "sess_id",
        type_col,
        F.row_number().over(w2).alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(user_col, "sess_id"))
        .alias("_total"),
    )
    kept = numbered.filter(F.col("_rn") <= max_steps)
    # array_sort on (step number, type) restores event-time order inside
    # the unordered collect_list buffer — the struct's first field is the
    # unique step number, so the sort is total
    step = F.struct(F.col("_rn").alias("r"), F.col(type_col).alias("t"))
    return kept.groupBy(user_col, "sess_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(step)), lambda x: x["t"]
            ),
            sep,
        ).alias("path"),
        F.count(F.lit(1)).alias("n_steps"),
        (F.max("_total") > F.lit(max_steps)).alias("truncated"),
    )


def path_counts(
    paths: DataFrame,
    *,
    k: int | None = None,
) -> DataFrame:
    """Frequency table over session paths: ``(path, n_sessions)``,
    count-descending with the path string as tie-break; with ``k``,
    the top-k rows plus a ``rnk`` column (TakeOrderedAndProject)."""
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    if k is None:
        return counts
    top = counts.orderBy(F.desc("n_sessions"), "path").limit(k)
    w = Window.orderBy(F.desc("n_sessions"), "path")
    return top.select(
        "path",
        "n_sessions",
        F.row_number().over(w).cast("long").alias("rnk"),
    )
