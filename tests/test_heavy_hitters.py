"""Two-pass exact heavy hitters (operators/heavy_hitters.py): the
Misra-Gries candidate pass must be invisible in the output — exact
counts, partition-invariant, equal to the plain groupBy/HAVING twin —
even when the per-partition decrement actually fires."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gush_spark.operators.heavy_hitters import (
    _mg_summary,
    heavy_hitter_ngrams,
    ngram_slots,
)


def _exact_twin(grams_df, inv_share):
    total = grams_df.count()
    rows = (
        grams_df.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * inv_share > total)
        .collect()
    )
    return {(r["gram"], r["n"]) for r in rows}, total


def test_mg_summary_decrement_keeps_heavy_drops_light():
    # 30 slots in one partition, m=2 counters: 'hot' (12) must survive
    # every decrement round; the 9 singletons cannot all be kept.
    data = ["hot"] * 12 + ["warm"] * 9 + [f"u{i}" for i in range(9)]
    batches = [pd.DataFrame({"gram": data[i : i + 5]}) for i in range(0, 30, 5)]
    out = pd.concat(list(_mg_summary(2)(iter(batches))), ignore_index=True)
    kept = set(out["gram"].dropna())
    assert "hot" in kept  # count 12 > 30/3 -> guaranteed survivor
    assert len(kept) <= 2  # bounded memory actually bounded
    assert out.loc[out["gram"].isna(), "slots"].sum() == 30  # sentinel total


def test_heavy_hitters_exact_and_partition_invariant(spark):
    # Zipf-ish unigram stream with enough distinct grams that m=4
    # summaries decrement constantly; output must still be exact.
    rows = []
    i = 0
    for r in range(40):
        rows.append((i, "alpha beta"))  # 'alpha beta' bigram x40
        i += 1
    for r in range(12):
        rows.append((i, "gamma delta"))
        i += 1
    for r in range(300):
        rows.append((i, f"noise{r} tail{r}"))  # 300 distinct singletons
        i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    results = {}
    for parts in (2, 16):
        df = heavy_hitter_ngrams(
            docs.repartition(parts), n=2, inv_share=20, counters=19
        )
        results[parts] = {(r["gram"], r["n"], r["share_scaled"]) for r in df.collect()}
    assert results[2] == results[16]  # partition-invariant
    grams = ngram_slots(docs, n=2)
    twin, total = _exact_twin(grams, 20)
    assert {(g, n) for g, n, _ in results[2]} == twin
    # total = 352 slots; alpha beta 40*20 > 352 passes, gamma delta
    # 12*20 = 240 <= 352 fails even though it is the 2nd-hottest gram
    assert ("alpha beta", 40) in twin and all(g != "gamma delta" for g, _ in twin)
    for g, n, share in results[2]:
        assert share == n * 1_000_000 // total


def test_heavy_hitters_counter_floor_enforced(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        heavy_hitter_ngrams(docs, n=2, inv_share=100, counters=10)


def test_ngram_slots_map_only_no_exchange(spark):
    docs = spark.createDataFrame(
        [(i, "web crawl page index rank") for i in range(20)],
        "doc_id long, text string",
    )
    plan = ngram_slots(docs, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # slot extraction is map-only
