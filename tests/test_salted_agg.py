"""Batch salted aggregation: two-stage skew-safe agg must equal the
plain groupBy, use a deterministic salt (stable under task retries),
and actually spread a hot key over multiple salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from gush_spark.operators.windows import salt_column, salted_agg


def _skewed(spark):
    # one hot key (90 rows) + a tail of singletons
    rows = [(7, i, float(i % 13)) for i in range(90)]
    rows += [(k, 1000 + k, float(k)) for k in range(20) if k != 7]
    return spark.createDataFrame(rows, ["user_id", "event_id", "value"])


def test_salted_agg_equals_plain_groupby(spark):
    df = _skewed(spark).withColumn("value_dec", F.col("value").cast("decimal(18,2)"))
    salted = salted_agg(
        df,
        keys=["user_id"],
        agg_exprs={
            "n": "count(*)",
            "s": "sum(value_dec)",
            "lo": "min(value_dec)",
            "hi": "max(value_dec)",
            "m": "avg(value_dec)",
        },
        salt_buckets=8,
    )
    plain = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_dec").alias("s"),
        F.min("value_dec").alias("lo"),
        F.max("value_dec").alias("hi"),
        F.avg("value_dec").alias("m"),
    )
    got = {r["user_id"]: r for r in salted.collect()}
    want = {r["user_id"]: r for r in plain.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["s"] == want[k]["s"]
        assert got[k]["lo"] == want[k]["lo"]
        assert got[k]["hi"] == want[k]["hi"]
        assert abs(float(got[k]["m"]) - float(want[k]["m"])) < 1e-9


def test_salt_is_deterministic_across_evaluations(spark):
    """Same rows → same salt on every evaluation (the retry-stability
    property monotonically_increasing_id lacks)."""
    df = _skewed(spark)
    sel = df.select("event_id", salt_column(df, ["user_id"], 8).alias("salt"))
    a = {r["event_id"]: r["salt"] for r in sel.collect()}
    b = {r["event_id"]: r["salt"] for r in sel.collect()}
    assert a == b


def test_salt_spreads_hot_key(spark):
    df = _skewed(spark)
    n_buckets = (
        df.filter(F.col("user_id") == 7)
        .select(salt_column(df, ["user_id"], 8).alias("salt"))
        .distinct()
        .count()
    )
    assert n_buckets > 1  # the hot key fans out over salt buckets


def test_salt_on_named_column(spark):
    df = _skewed(spark)
    n_buckets = (
        df.filter(F.col("user_id") == 7)
        .select(salt_column(df, ["user_id"], 8, salt_on="event_id").alias("salt"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_count_col_counts_non_nulls(spark):
    """count(col) must be the SQL non-null count, not a silent count(*)."""
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, None), (1, 12, 3.0), (2, 13, None)],
        "user_id long, event_id long, value double",
    )
    got = {
        r["user_id"]: r
        for r in salted_agg(
            df,
            keys=["user_id"],
            agg_exprs={"n_rows": "count(*)", "n_vals": "count(value)"},
            salt_buckets=4,
            salt_on="event_id",
        ).collect()
    }
    assert (got[1]["n_rows"], got[1]["n_vals"]) == (3, 2)
    assert (got[2]["n_rows"], got[2]["n_vals"]) == (1, 0)


def test_default_salt_warns_about_degenerate_duplicates(spark):
    """Omitting salt_on must warn: byte-identical duplicate rows of a
    hot key all hash to one bucket and the mitigation silently no-ops."""
    import warnings

    df = _skewed(spark)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        salt_column(df, ["user_id"], 8)
    assert any("salt_on" in str(x.message) for x in w)
