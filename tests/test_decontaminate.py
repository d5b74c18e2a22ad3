"""Hand-checkable decontamination semantics (operators/decontaminate.py)
plus a plan assertion that the benchmark side is broadcast — the whole
point of the operator at crawl scale. The DuckDB oracle covers the
synthetic corpus exhaustively."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.operators.decontaminate import ngram_overlap


@pytest.fixture(scope="module")
def frames(spark):
    # k=2 shingles for hand-checkable sets
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),  # shingles: {the quick, quick brown, brown fox}
            (2, "the quick red fox jumps"),  # {the quick, quick red, red fox, fox jumps}
            (3, "completely unrelated words here"),
            (4, "x"),  # shorter than k: no shingles
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox")], ["doc_id", "text"]
    )
    return docs, bench


def test_overlap_fractions(spark, frames):
    docs, bench = frames
    out = ngram_overlap(docs, bench, "doc_id", "text", k=2, threshold=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}

    # doc 1 IS the benchmark doc: full overlap, contaminated
    assert rows[1]["n_shingles"] == 3
    assert rows[1]["n_matched"] == 3
    assert rows[1]["overlap"] == pytest.approx(1.0)
    assert rows[1]["contaminated"] is True

    # doc 2 shares only "the quick": 1/4 < 0.5 threshold
    assert rows[2]["n_shingles"] == 4
    assert rows[2]["n_matched"] == 1
    assert rows[2]["overlap"] == pytest.approx(0.25)
    assert rows[2]["contaminated"] is False

    # doc 3 shares nothing
    assert rows[3]["n_matched"] == 0
    assert rows[3]["contaminated"] is False

    # doc 4 has no shingles at all but still appears, clean
    assert rows[4]["n_shingles"] == 0
    assert rows[4]["overlap"] == 0.0
    assert rows[4]["contaminated"] is False


def test_repeated_benchmark_shingle_counts_once(spark, frames):
    docs, _ = frames
    # the same shingle appears in TWO benchmark docs — a corpus doc
    # containing it must match it once, not twice (bench keys are
    # DISTINCT before the join, so no row multiplication)
    bench = spark.createDataFrame(
        [(100, "the quick brown"), (101, "the quick red")], ["doc_id", "text"]
    )
    out = ngram_overlap(docs, bench, "doc_id", "text", k=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_shingles"] == 3  # not inflated by the dup join
    assert rows[1]["n_matched"] == 2  # {the quick, quick brown}


def test_benchmark_side_is_broadcast(spark, frames):
    docs, bench = frames
    out = ngram_overlap(docs, bench, "doc_id", "text", k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus membership test must not shuffle the corpus side:
    # the only sort-merge join allowed is the final ids-report join
    assert plan.count("SortMergeJoin") <= 1
