"""Bin-bucketed interval join (operators/joins.py::interval_join):
inclusive-bound semantics, cross-bucket intervals without duplicate
pairs, key isolation, and the no-nested-loop plan contract."""

from gush_spark.operators.joins import interval_join


def _frames(spark):
    events = spark.createDataFrame(
        [
            ("u1", 100, "e1"),
            ("u1", 150, "e2"),
            ("u1", 250, "e3"),   # inside iv1 only via second bucket
            ("u1", 300, "e4"),   # == end, inclusive
            ("u1", 301, "e5"),   # just past end
            ("u2", 150, "e6"),   # other key, same times
        ],
        "user string, ts long, event_id string",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", 100, 300, "iv1"),  # spans buckets 1..5 at bucket_s=60
            ("u1", 140, 160, "iv2"),
            ("u3", 0, 1000, "iv3"),   # no events for this key
        ],
        "user string, start long, stop long, iv_id string",
    )
    return events, intervals


def test_inclusive_bounds_and_key_isolation(spark):
    events, intervals = _frames(spark)
    pairs = {
        (r["iv_id"], r["event_id"])
        for r in interval_join(
            events, intervals, keys=["user"], ts_col="ts",
            start_col="start", end_col="stop", bucket_s=60,
        ).collect()
    }
    assert pairs == {
        ("iv1", "e1"),  # ts == start, inclusive
        ("iv1", "e2"),
        ("iv1", "e3"),
        ("iv1", "e4"),  # ts == end, inclusive
        ("iv2", "e2"),
        # e5 past end; u2's e6 never pairs with u1/u3 intervals
    }


def test_no_duplicate_pairs_across_buckets(spark):
    """An interval spanning many buckets meets each event exactly once
    (the event lives in one bucket), for any bucket width."""
    events, intervals = _frames(spark)
    for bucket_s in (7, 60, 1000):
        out = interval_join(
            events, intervals, keys=["user"], ts_col="ts",
            start_col="start", end_col="stop", bucket_s=bucket_s,
        )
        rows = [(r["iv_id"], r["event_id"]) for r in out.collect()]
        assert len(rows) == len(set(rows)) == 5, bucket_s


def test_plans_as_equi_join_not_nested_loop(spark):
    events, intervals = _frames(spark)
    out = interval_join(
        events, intervals, keys=["user"], ts_col="ts",
        start_col="start", end_col="stop", bucket_s=60,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_equals_naive_range_join_on_random_data(spark):
    """Seeded-random equivalence: the bucketed form must produce
    EXACTLY the naive inequality join's pairs for any bucket width."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    events = spark.createDataFrame(
        [
            (f"k{rng.randint(0, 3)}", rng.randint(0, 1000), i)
            for i in range(200)
        ],
        "user string, ts long, event_id long",
    )
    intervals = []
    for j in range(40):
        s = rng.randint(0, 1000)
        intervals.append((f"k{rng.randint(0, 3)}", s, s + rng.randint(0, 300), j))
    ivs = spark.createDataFrame(intervals, "user string, start long, stop long, iv_id long")

    naive = {
        (r["iv_id"], r["event_id"])
        for r in events.alias("e")
        .crossJoin(ivs.alias("i"))
        .filter(
            (F.col("e.user") == F.col("i.user"))
            & (F.col("e.ts") >= F.col("i.start"))
            & (F.col("e.ts") <= F.col("i.stop"))
        )
        .select("iv_id", "event_id")
        .collect()
    }
    assert naive, "fixture produced no matches"
    for bucket_s in (13, 100, 2000):
        got = [
            (r["iv_id"], r["event_id"])
            for r in interval_join(
                events, ivs, keys=["user"], ts_col="ts",
                start_col="start", end_col="stop", bucket_s=bucket_s,
            ).collect()
        ]
        assert len(got) == len(set(got)), bucket_s  # no duplicate pairs
        assert set(got) == naive, bucket_s
