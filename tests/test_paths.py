"""Session path mining: gap sessionization, event-time step order
(with id tie-break), max_steps truncation, and the path frequency
table's deterministic top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from gush_spark.operators.paths import path_counts, session_paths


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    ).withColumn("ts", F.timestamp_seconds("ts"))


def test_sessionization_and_step_order(spark):
    ev = _events(
        spark,
        [
            # user 1, session 1: a>b>c (10s apart)
            (1, 0, 1, "a"),
            (2, 10, 1, "b"),
            (3, 20, 1, "c"),
            # gap 4000s > 1800 starts session 2: d>e
            (4, 4020, 1, "d"),
            (5, 4030, 1, "e"),
            # user 2: same timestamps — order falls to event_id
            (7, 100, 2, "y"),
            (6, 100, 2, "x"),
        ],
    )
    out = {
        (r["user_id"], r["sess_id"]): r
        for r in session_paths(ev, gap_s=1800, max_steps=8).collect()
    }
    assert out[(1, 1)]["path"] == "a>b>c"
    assert out[(1, 2)]["path"] == "d>e"
    assert out[(1, 1)]["n_steps"] == 3
    assert not out[(1, 1)]["truncated"]
    # tied ts orders by event_id: 6 (x) before 7 (y)
    assert out[(2, 1)]["path"] == "x>y"


def test_exact_gap_does_not_split(spark):
    """The session convention is strictly-greater: a gap of exactly
    gap_s continues the session (same rule as the session-window
    oracles)."""
    ev = _events(spark, [(1, 0, 1, "a"), (2, 1800, 1, "b")])
    rows = session_paths(ev, gap_s=1800).collect()
    assert len(rows) == 1 and rows[0]["path"] == "a>b"


def test_truncation_cap(spark):
    ev = _events(
        spark, [(i, i * 10, 1, f"t{i}") for i in range(1, 11)]
    )
    rows = session_paths(ev, gap_s=1800, max_steps=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["path"] == "t1>t2>t3"
    assert r["n_steps"] == 3
    assert r["truncated"] is True


def test_path_counts_topk_deterministic(spark):
    ev = _events(
        spark,
        # three users with path a>b, one with b>a — plus count ties
        # broken by path string
        [
            (1, 0, 1, "a"), (2, 10, 1, "b"),
            (3, 0, 2, "a"), (4, 10, 2, "b"),
            (5, 0, 3, "b"), (6, 10, 3, "a"),
            (7, 0, 4, "c"),
        ],
    )
    paths = session_paths(ev, gap_s=1800)
    top = path_counts(paths, k=2).collect()
    assert [(r["path"], r["n_sessions"], r["rnk"]) for r in top] == [
        ("a>b", 2, 1),
        ("b>a", 1, 2),  # ties with c on count; 'b>a' < 'c'
    ]
