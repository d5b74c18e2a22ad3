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


def test_token_budget_plan_caps_and_redistributes(spark):
    """A scarce stratum hits the epoch cap; its surplus redistributes
    pro-rata (BIGINT integer division) across the uncapped strata."""
    from gush_spark.operators.mixture import token_budget_plan

    docs = spark.createDataFrame(
        [
            # 'rare': only 100 tokens available
            ("rare", 60), ("rare", 40),
            # 'big': 10_000 tokens
            *[("big", 1000)] * 10,
            # 'mid': 5_000 tokens
            *[("mid", 500)] * 10,
            # 'unlisted' stratum gets no weight -> excluded
            ("unlisted", 999),
        ],
        "src string, n_toks long",
    )
    plan = {
        r["src"]: r
        for r in token_budget_plan(
            docs, "src", "n_toks",
            {"rare": 0.5, "big": 0.3, "mid": 0.2},
            budget=10_000, max_epochs=2,
        ).collect()
    }
    assert set(plan) == {"rare", "big", "mid"}
    rare, big, mid = plan["rare"], plan["big"], plan["mid"]
    # rare wanted 5000 but holds 100 tokens at cap 2 -> 200, epochs 2.0
    assert rare["target_toks"] == 5000
    assert rare["plan_toks"] == 200 and rare["epochs"] == 2.0
    assert rare["over_cap"] is False
    # surplus 4800 redistributes 3000:2000 pro rata (integer div)
    assert big["plan_toks"] == 3000 + (4800 * 3000) // 5000
    assert mid["plan_toks"] == 2000 + (4800 * 2000) // 5000
    assert big["epochs"] == big["plan_toks"] / 10_000
    assert not big["over_cap"] and not mid["over_cap"]


def test_token_budget_plan_flags_second_order_overflow(spark):
    """Redistribution pushing an uncapped stratum past ITS cap is
    reported, never silently re-spread."""
    from gush_spark.operators.mixture import token_budget_plan

    docs = spark.createDataFrame(
        [("rare", 100), ("tight", 4000), ("big", 50_000)],
        "src string, n_toks long",
    )
    plan = {
        r["src"]: r
        for r in token_budget_plan(
            docs, "src", "n_toks",
            {"rare": 0.8, "tight": 0.1, "big": 0.1},
            budget=100_000, max_epochs=1,
        ).collect()
    }
    # rare wants 80k, holds 100 @cap1; tight wants 10k, holds 4000 @cap1
    # (first-pass capped). surplus 79_900 + 6_000 = 85_900 all lands on
    # big (the only uncapped stratum): 10k + 85_900 = 95_900 > its own
    # 50k cap -> flagged, not silently re-spread
    assert plan["rare"]["plan_toks"] == 100
    assert plan["tight"]["plan_toks"] == 4000
    assert plan["tight"]["over_cap"] is False  # sits exactly at cap
    assert plan["big"]["plan_toks"] == 95_900
    assert plan["big"]["over_cap"] is True


def test_curriculum_order_equals_global_sort(spark):
    """Bucketed two-phase ordinals == the single-sort row_number twin,
    including ties at bucket boundaries, under any partitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gush_spark.operators.curriculum import curriculum_order

    rows = [(i, (i * 37) % 1000) for i in range(400)]
    rows += [(1000 + i, 256) for i in range(5)]   # ties AT a boundary value
    rows += [(2000 + i, 255) for i in range(3)]   # and just below it
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    exp = {
        (r["doc_id"], r["rank"], r["phase"])
        for r in docs.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy("n_chars", "doc_id"))
            .cast("long")
            .alias("rank"),
        )
        .withColumn("phase", F.expr("(rank - 1) * 3 div 408"))
        .collect()
    }
    for parts in (1, 13):
        got = {
            (r["doc_id"], r["rank"], r["phase"])
            for r in curriculum_order(docs.repartition(parts)).collect()
        }
        assert got == exp
    # ranks are a permutation of 1..N (no gaps, no dups)
    ranks = sorted(r for _, r, _ in got)
    assert ranks == list(range(1, 409))


def test_curriculum_order_corpus_window_is_bucket_partitioned(spark):
    """The corpus-side row_number is partitioned by bucket — the
    unpartitioned windows run only on the reduced bucket-count frame."""
    from gush_spark.operators.curriculum import curriculum_order

    docs = spark.createDataFrame(
        [(i, i % 777) for i in range(50)], "doc_id long, n_chars long"
    )
    plan = (
        curriculum_order(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # the row_number window lists the bucket partition spec
    assert "row_number()" in plan and "[_b]" in plan.replace("#", "").replace(
        "L", ""
    ) or "partitionBy" not in plan
    import re

    win_specs = re.findall(r"Window \[row_number\(\).*?\], \[([^\]]*)\]", plan)
    assert any("_b" in s for s in win_specs), win_specs


def test_source_concentration_exact(spark, monkeypatch, tmp_path):
    """Hand-checked shares/cumulative/HHI on a 3-source corpus."""
    import gush_spark.queries_pipeline as qp

    docs = spark.createDataFrame(
        [(i, "s_a" if i < 5 else ("s_b" if i < 9 else "s_c")) for i in range(10)],
        "doc_id long, source string",
    )
    monkeypatch.setattr(qp, "load", lambda s, d, t: docs)
    rows = {r["source"]: r for r in qp.q_source_concentration_report(spark, "x").collect()}
    # shares: a=5/10=500000, b=4/10=400000, c=1/10=100000
    assert rows["s_a"]["share_ppm"] == 500_000 and rows["s_a"]["rank"] == 1
    assert rows["s_b"]["cum_share_ppm"] == 900_000
    assert rows["s_c"]["cum_share_ppm"] == 1_000_000
    # HHI = (0.5^2 + 0.4^2 + 0.1^2) = 0.42 -> 420000 ppm, same on every row
    assert {r["hhi_ppm"] for r in rows.values()} == {420_000}
