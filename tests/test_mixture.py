"""Hand-checkable mixture-resampling semantics (operators/mixture.py);
the DuckDB oracle (mixture_resample) covers the synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.operators.mixture import mixture_resample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "a" if i < 4 else ("b" if i < 24 else "c")) for i in range(30)]
    # strata: a=4 docs, b=20 docs, c=6 docs
    return spark.createDataFrame(rows, ["doc_id", "stratum"])


def test_exact_targets_and_even_repeats(spark, corpus):
    # total=40: a -> 20 (5x upsample), b -> 10 (downsample half), c dropped
    out = mixture_resample(
        corpus, "doc_id", "stratum", {"a": 0.5, "b": 0.25}, total=40
    ).toPandas()
    by = out.groupby("stratum")
    assert by.size().to_dict() == {"a": 20, "b": 10}
    # a: 20 target / 4 docs = exactly 5 copies each, spread evenly
    a = out[out.stratum == "a"]
    assert a.groupby("doc_id")["copy"].count().eq(5).all()
    assert set(a["copy"]) == {1, 2, 3, 4, 5}
    # b: 10 target / 20 docs = rank-determined single copies, no repeats
    b = out[out.stratum == "b"]
    assert b["doc_id"].is_unique and (b["copy"] == 1).all()
    # c had no weight: fully dropped
    assert "c" not in set(out["stratum"])


def test_uneven_split_gives_extra_copy_to_lowest_ranks(spark, corpus):
    # a: 4 docs, target 10 -> floor 2 copies each + 2 docs get a 3rd
    out = mixture_resample(
        corpus, "doc_id", "stratum", {"a": 1.0}, total=10
    ).toPandas()
    counts = out.groupby("doc_id")["copy"].count()
    assert sorted(counts) == [2, 2, 3, 3]
    assert counts.sum() == 10


def test_deterministic_across_partitioning(spark, corpus):
    w = {"a": 0.5, "b": 0.5}
    x = mixture_resample(corpus, "doc_id", "stratum", w, total=30)
    y = mixture_resample(
        corpus.repartition(7), "doc_id", "stratum", w, total=30
    )
    assert sorted(map(tuple, x.collect())) == sorted(map(tuple, y.collect()))


def test_targets_join_is_broadcast(spark, corpus):
    plan = (
        mixture_resample(corpus, "doc_id", "stratum", {"a": 1.0}, total=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
