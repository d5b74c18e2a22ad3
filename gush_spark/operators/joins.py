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


def _parse_byte_size(s: str) -> int:
    """Parse a Spark size conf value ('10485760', '10MB', '1g', '-1')."""
    s = s.strip().lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if s.endswith("b"):
        s = s[:-1]
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def enrich_with_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """J2: hash join against a dimension table — broadcast ONLY when the
    dim's estimated size fits the broadcast budget.

    An unconditional ``broadcast()`` hint OOMs the driver when someone
    feeds a 10^9-row "dimension" (host metadata at web scale), so the
    hint is size-gated: the dim's Catalyst size estimate
    (``optimizedPlan().stats().sizeInBytes`` — plan-time, no job) is
    compared against ``broadcast_threshold`` (default: the session's
    ``spark.sql.autoBroadcastJoinThreshold``). Under it → explicit
    broadcast hint (a cold-statistics catalog can't demote the join to
    sort-merge); over it (or threshold -1 = broadcast disabled) →
    ``shuffle_hash`` hint, which co-partitions both sides without the
    driver collect AND without SMJ's per-partition sort of the fact
    side."""
    if broadcast_threshold is None:
        raw = fact.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        broadcast_threshold = _parse_byte_size(raw)
    est = int(
        str(dim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if broadcast_threshold >= 0 and est <= broadcast_threshold:
        return fact.join(F.broadcast(dim), on=on, how="left")
    return fact.join(dim.hint("shuffle_hash"), on=on, how="left")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """AS-OF join: each left row gets the ``carry`` columns of the right
    row with the greatest ``right_ts`` ≤ its ``left_ts`` (same key);
    NULLs when no right row precedes it. Ties (equal timestamps) match —
    the ASOF inequality is inclusive, same as DuckDB's ``ASOF LEFT JOIN
    … ON l.ts >= r.ts`` that the oracle uses.

    Spark has no ASOF join operator; the naive range-join + per-left-row
    "latest" window is quadratic in dense keys. This is the scale-safe
    union-merge form: tag both sides, union, and run ONE window over
    (key, ts) with a last-non-null carry-forward — a single shuffle on
    the key, linear work, no join at all (the same trick as J1's lag).
    Right rows sort BEFORE left rows at equal ts so ties are inclusive.

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not
    (otherwise "the" matching row is undefined in any engine).

    The carried columns travel as ONE struct: the matched right row's
    struct is non-null even when its fields are null, so the
    last-non-null carry-forward matches the right ROW, never skipping
    over legitimately-null carry values to an older row.
    """
    carry_type = (
        "struct<"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in carry)
        + ">"
    )
    row_type = (
        "struct<"
        + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields)
        + ">"
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_l"),
        F.struct(*left.columns).alias("_row"),
        F.lit(None).cast(carry_type).alias("_c"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_l"),
        F.lit(None).cast(row_type).alias("_row"),
        F.struct(*[F.col(c) for c in carry]).alias("_c"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_l")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "_is_l", "_row", F.last(F.col("_c"), ignorenulls=True).over(w).alias("_f")
    ).filter(F.col("_is_l") == 1)
    return filled.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_f.{c}").alias(f"{prefix}{c}") for c in carry],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
) -> DataFrame:
    """Range/interval join: each event row pairs with every interval
    row (same ``keys``) whose ``[start, end]`` contains its timestamp
    (inclusive both ends) — sessions-to-events, outage-windows-to-
    errors, promo-windows-to-purchases.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin —
    quadratic, dead at scale. This is the bin-bucketing form: each
    interval explodes to the epoch buckets it covers (``sequence``),
    each event maps to its single bucket, and the join is a plain
    EQUI-join on (keys…, bucket) with the exact range predicate as a
    post-filter. An event's one bucket meets each covering interval
    exactly once, so no dedup pass is needed. Pick ``bucket_s`` near
    the typical interval length: replication per interval is
    ~len/bucket_s + 1 rows (bounded, map-side), and the equi-join
    shuffles/broadcasts like any other — AQE handles skewed buckets.

    Inner-join semantics only: the exact range predicate is a
    post-join filter, which would silently drop never-matched rows
    under an outer join — anti/outer variants need the predicate
    folded into the join condition instead.

    Both timestamp columns may be timestamp or epoch-seconds longs.
    """
    ev_b = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / F.lit(bucket_s)
    )
    iv_b = F.explode(
        F.sequence(
            F.floor(
                F.col(start_col).cast("timestamp").cast("long") / F.lit(bucket_s)
            ),
            F.floor(
                F.col(end_col).cast("timestamp").cast("long") / F.lit(bucket_s)
            ),
        )
    )
    ev = events.withColumn("_b", ev_b)
    iv = intervals.withColumn("_b", iv_b)
    joined = ev.join(iv, on=[*keys, "_b"], how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_b")
