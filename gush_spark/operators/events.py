"""Event-layer operators: filters + classification (SURVEY.md §2.2).

The reference filters raw binlog statements before parsing
(SqlToBinlog.scala:12-14) and then type-filters events per flow
(cep/Cep.scala:11-27). All of these are plain Catalyst-pushable column
predicates here — they sit *before* any Python UDF in the plan so the
parquet/Iceberg scan prunes rows and columns (the Spark analog of gush's
prefilter-then-parse ordering).

Event-type vocabulary (north_star mapping):
    INSERT → ``crawl``    UPDATE → ``recrawl``    DELETE → ``drop``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gush_spark.config import DEFAULT_CONFIG, GushSparkConfig

CRAWL, RECRAWL, DROP = "crawl", "recrawl", "drop"
SUPPORTED_EVENT_TYPES = (CRAWL, RECRAWL, DROP)


def host_of(url: Column) -> Column:
    """Derive host from url — the CEP state key (SURVEY.md §1.3).

    Pure built-in expression (stays in whole-stage codegen).
    """
    return F.parse_url(url, F.lit("HOST"))


def supported_kinds_filter(df: DataFrame, event_col: str = "event_type") -> DataFrame:
    """F1 analog: keep only statement kinds the engine understands
    (reference keeps INSERT/UPDATE, SqlToBinlog.scala:12)."""
    return df.filter(F.col(event_col).isin(*SUPPORTED_EVENT_TYPES))


def unsupported_feature_filter(df: DataFrame, text_col: str, needle: str) -> DataFrame:
    """F2 analog: drop records containing an unsupported marker
    (reference drops ``ON DUPLICATE KEY UPDATE``, SqlToBinlog.scala:13)."""
    return df.filter(~F.col(text_col).contains(needle))


def blacklist_filter(
    df: DataFrame,
    config: GushSparkConfig = DEFAULT_CONFIG,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """F3 analog: config-driven ignore lists (SqlToBinlog.scala:14,24-27).

    Hosts are an IN-list (Catalyst folds small lists into the scan
    filter); prefixes compile to ORed ``startswith`` predicates. Both are
    driver-side constants — effectively broadcast, no shuffle.
    """
    out = df
    if config.ignored_hosts:
        out = out.filter(~F.col(host_col).isin(*config.ignored_hosts))
    if config.ignored_url_prefixes:
        pred = None
        for p in config.ignored_url_prefixes:
            c = F.col(url_col).startswith(p)
            pred = c if pred is None else (pred | c)
        out = out.filter(~pred)
    return out


def crawl_events(df: DataFrame, host: str | None = None) -> DataFrame:
    """F4 analog of InsertEventFlow (cep/Cep.scala:11-18): crawls,
    optionally for one host (gush filtered by tableName)."""
    out = df.filter(F.col("event_type") == CRAWL)
    if host is not None:
        out = out.filter(F.col("host") == host)
    return out


def recrawl_events(df: DataFrame, host: str | None = None) -> DataFrame:
    """F5 analog of UpdateEventFlow (cep/Cep.scala:20-27).

    The reference has a bug here (tests ``isInstanceOf[BinlogEvent]`` —
    always true — then casts, so a stray insert crashes the flow). We
    implement the *intended* semantics: a real event-type predicate.
    """
    out = df.filter(F.col("event_type") == RECRAWL)
    if host is not None:
        out = out.filter(F.col("host") == host)
    return out


def get_field(df: DataFrame, key: str, alias: str | None = None) -> Column:
    """F6 analog of BinlogEvent.getField (BinlogEvent.scala:34)."""
    return F.col("fields")[key].alias(alias or key)


def get_as_float(key: str, alias: str | None = None) -> Column:
    """F6 analog of getAsFloat (BinlogEvent.scala:36): string field →
    float at use-site. Spark cast of a non-numeric string yields NULL
    (the reference throws; our error channel is NULL + metrics)."""
    return F.col("fields")[key].cast("float").alias(alias or key)


def classify_change_events(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    """P3/P8 analog: map raw change kinds onto the crawl/recrawl/drop
    vocabulary; unknown kinds become error rows (P10 error channel:
    the stream never dies on bad data — gush_example/gush.scala:13-18).
    """
    mapping = mapping or {"insert": CRAWL, "update": RECRAWL, "delete": DROP}
    expr = None
    for src, dst in mapping.items():
        branch = F.when(F.col(type_col) == src, F.lit(dst))
        expr = branch if expr is None else expr.when(F.col(type_col) == src, F.lit(dst))
    expr = expr.otherwise(F.lit(None))
    return df.withColumn("page_event_type", expr).withColumn(
        "extract_error",
        F.when(F.col("page_event_type").isNull(),
               F.concat(F.lit("unsupported event kind: "), F.col(type_col))),
    )


def funnel_conversion(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    *,
    step_horizon_s: int = 7 * 86400,
) -> DataFrame:
    """Ordered multi-stage funnel over the event stream (the classic
    crawl/product analytics rollup the pairwise sequence_pattern_within
    generalizes to N stages): a user completes stage ``i`` at the
    EARLIEST event of ``stages[i]`` that happens strictly after their
    stage ``i-1`` completion and within ``step_horizon_s`` of it
    (µs-precision; stage 0 is simply the user's earliest ``stages[0]``
    event). Returns one row per stage:
    ``(stage, stage_name, n_users, conv_from_prev_ppm, conv_from_first_ppm)``
    with conversions in exact integer ppm (``n·10^6 DIV n_prev``).

    These are FIRST-TOUCH funnel semantics (the standard product-
    analytics variant): every stage anchors on the earliest admissible
    event given the previous anchor. It is deterministic and
    replay-stable, but it is NOT exists-any-chain — a user whose only
    completing chain starts at a LATER stage-0 event (possible with a
    bounded horizon: a later anchor admits events the earlier anchor's
    window excludes) counts as not converted, by definition.

    Scale shape: one map-side-combinable min-agg per stage over a frame
    that SHRINKS as the funnel narrows, chained by user-keyed
    equi-joins (stage i's survivors ⋈ stage-i+1 events); each stage
    frame is persisted so its count doubles as the materialization
    (never recomputing the chain), and the final report aggregates
    driver-side over ``len(stages)`` scalars — no window sort, no cross
    join, the event table is scanned once per stage with the stage
    filter pushed down.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    horizon_us = int(step_horizon_s) * 1_000_000
    cur = (
        df.filter(F.col(type_col) == stages[0])
        .select(F.col(user_col).alias("_u"), us.alias("_t"))
        .groupBy("_u")
        .agg(F.min("_t").alias("_done"))
        .persist()
    )
    counts = [cur.count()]
    pins = [cur]
    for stage in stages[1:]:
        ev = df.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("_u"), us.alias("_t")
        )
        cur = (
            cur.join(ev, on="_u")
            .filter(
                (F.col("_t") > F.col("_done"))
                & (F.col("_t") <= F.col("_done") + F.lit(horizon_us))
            )
            .groupBy("_u")
            .agg(F.min("_t").alias("_done"))
            .persist()
        )
        counts.append(cur.count())
        pins.append(cur)
    for p in pins:
        p.unpersist()
    spark = df.sparkSession
    rows = []
    for i, (stage, n) in enumerate(zip(stages, counts)):
        prev = counts[i - 1] if i > 0 else None
        rows.append(
            (
                i,
                stage,
                n,
                (n * 1_000_000) // prev if prev else None,
                (n * 1_000_000) // counts[0] if counts[0] else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "stage long, stage_name string, n_users long, "
        "conv_from_prev_ppm long, conv_from_first_ppm long",
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Cohort retention matrix over the event stream: users grouped by
    the time bucket of their FIRST activity (the cohort), counted in
    every later bucket they return in — ``(cohort_bucket, age, n_users)``
    with ``age`` in buckets since the cohort's start. The classic
    did-the-crawl-keep-them / recurring-visitor curve; on a crawl event
    log the "users" are whatever identity the stream carries and the
    falling diagonal is churn.

    Exactness: buckets are pure BIGINT —
    ``unix_micros(ts) div bucket_us`` (µs precision, the paths.py
    lesson: never truncate to seconds first) — and every count is a
    BIGINT, so the matrix is engine/order-exact.

    Scale shape: ONE (user, bucket) distinct reduces the stream to
    user-activity rows; the cohort (min bucket per user) is a
    map-side-combinable agg over that reduced frame; the join back is
    user-keyed — the distinct, the agg and the join all share the one
    user partitioning (a cluster co-partitions once); the final
    (cohort, age) agg is matrix-sized. Raw events cross exactly one
    exchange.
    """
    d = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {int(bucket_us)}"
    )
    act = events.select(
        F.col(user_col).alias("_u"), d.alias("_d")
    ).distinct()
    coh = act.groupBy("_u").agg(F.min("_d").alias("_c"))
    return (
        act.join(coh, "_u")
        .groupBy(
            F.col("_c").alias("cohort_bucket"),
            (F.col("_d") - F.col("_c")).alias("age"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
