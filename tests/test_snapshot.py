"""Snapshot diff semantics (operators/snapshot.py): status assignment,
null-content handling, and the summary rollup."""

from pyspark.sql import functions as F

from gush_spark.operators import snapshot


def _snaps(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha beta"),     # unchanged
            (2, "gamma delta"),    # changed in new
            (3, "dropped doc"),    # removed
            (5, None),             # null -> text  => changed
            (6, None),             # null -> null  => unchanged
            (7, "Alpha  Beta "),   # normalization-equal to new => unchanged
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "gamma delta v2"),
            (4, "brand new doc"),  # added
            (5, "now has text"),
            (6, None),
            (7, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    return old, new


def test_status_assignment_and_null_safety(spark):
    old, new = _snaps(spark)
    rows = {
        r["doc_id"]: r["status"]
        for r in snapshot.snapshot_diff(old, new).collect()
    }
    assert rows == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "changed",
        6: "unchanged",
        7: "unchanged",  # md5 fingerprint is over normalized text
    }


def test_summary_counts_match_diff(spark):
    old, new = _snaps(spark)
    summary = {
        r["status"]: r["n"]
        for r in snapshot.snapshot_diff_summary(old, new).collect()
    }
    assert summary == {"unchanged": 3, "changed": 2, "removed": 1, "added": 1}


def test_fingerprint_projection_carries_no_text(spark):
    """The join input is (id, fp) only — raw text must not appear in
    the diff's post-projection schema (the 10^12-doc wire contract)."""
    old, new = _snaps(spark)
    proj = snapshot.snapshot_fingerprints(old)
    assert set(proj.columns) == {"_id", "fp"}
    diff = snapshot.snapshot_diff(old, new)
    assert set(diff.columns) == {"doc_id", "old_fp", "new_fp", "status"}
    # and no exchange in the physical plan carries the text column
    plan = diff._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line


def test_drift_report_identical_and_disjoint(spark):
    """Identical snapshots drift 0 for every source; a source whose
    length histogram moves entirely from one bucket to another drifts
    exactly 2e9 (the L1 maximum); a source present on one side only
    reports the empty side as 0 rows with the full 1e9 mass drift."""
    from gush_spark.operators.snapshot import drift_report

    short = "a b"                       # bucket 0 (norm length 3)
    long = "word " * 20                 # bucket >= 2
    old = spark.createDataFrame(
        [("s1", short), ("s1", short), ("s2", short), ("gone", short)],
        ["source", "text"],
    )
    same = drift_report(old, old, "source", "text").collect()
    assert all(r["drift_x1e9"] == 0 for r in same)

    new = spark.createDataFrame(
        [("s1", long), ("s1", long), ("s2", short)],
        ["source", "text"],
    )
    got = {r["source"]: r for r in drift_report(old, new, "source", "text").collect()}
    assert got["s1"]["drift_x1e9"] == 2_000_000_000  # full mass moved
    assert got["s2"]["drift_x1e9"] == 0
    assert got["gone"]["n_new"] == 0
    assert got["gone"]["drift_x1e9"] == 1_000_000_000
