"""Expectations report semantics (operators/validate.py): exact counts
on a crafted corpus, normalization-aware empties/dups, the violation
gate, and the single-exchange plan shape."""

from gush_spark.operators.validate import (
    expectation_violations,
    expectations_report,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            # source 'good': 3 clean distinct docs
            (1, "good", "alpha beta gamma"),
            (2, "good", "delta epsilon zeta"),
            (3, "good", "eta theta iota"),
            # source 'dupey': 4 rows, 2 distinct contents (one pair is
            # normalization-equal, not byte-equal)
            (4, "dupey", "same text here"),
            (5, "dupey", "  Same   TEXT here "),
            (6, "dupey", "other text"),
            (7, "dupey", "same text here"),
            # source 'broken': nulls and whitespace-only bodies
            (8, "broken", None),
            (9, "broken", "   "),
            (10, "broken", "one real doc"),
        ],
        "doc_id long, source string, text string",
    )


def test_report_counts(spark):
    rep = {r["source"]: r for r in expectations_report(_docs(spark)).collect()}
    g, d, b = rep["good"], rep["dupey"], rep["broken"]
    assert (g["n_rows"], g["n_null_text"], g["n_empty"], g["n_dups"]) == (3, 0, 0, 0)
    assert g["null_rate"] == 0.0 and g["dup_rate"] == 0.0
    # 4 rows, 2 distinct normalized contents -> 2 dups (incl. the
    # case/whitespace variant)
    assert (d["n_rows"], d["n_distinct"], d["n_dups"]) == (4, 2, 2)
    assert d["dup_rate"] == 0.5
    # null and whitespace-only each counted once, in separate columns
    assert (b["n_null_text"], b["n_empty"]) == (1, 1)
    assert b["null_rate"] == 1 / 3
    assert g["avg_chars"] == (16 + 18 + 14) / 3


def test_violation_gate(spark):
    rep = expectations_report(_docs(spark))
    out = {
        r["source"]: r
        for r in expectation_violations(
            rep, min_rows=3, max_null_rate=0.1, max_dup_rate=0.4
        ).collect()
    }
    assert out["good"]["ok"] is True
    assert out["dupey"]["ok"] is False and out["dupey"]["viol_dup_rate"] is True
    assert out["broken"]["ok"] is False and out["broken"]["viol_null_rate"] is True


def test_single_source_keyed_exchange(spark):
    """The report is one source-keyed aggregation: no exchange may
    carry the raw text column, and only source-keyed hashpartitioning
    appears (count-distinct adds its expand stage on the same key)."""
    plan = (
        expectations_report(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line
            assert "hashpartitioning(source" in line, line
