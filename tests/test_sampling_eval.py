"""Weighted priority sampling, Jaccard threshold sweep, and the
language-ID confusion matrix: determinism, weight-bias, bucket math and
diagonal-dominance pins.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gush_spark.operators.dedup import jaccard_threshold_sweep


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _priority(doc_id: int, weight: int) -> int:
    u = int(hashlib.md5(f"ws|{doc_id}".encode()).hexdigest()[:15], 16)
    return u // max(weight, 1)


def test_weighted_sample_matches_reference_and_biases_heavy(spark):
    # 200 docs: even ids weight 1000, odd ids weight 10
    rows = [(i, "t", "en", "s", 1000 if i % 2 == 0 else 10) for i in range(200)]
    df = _docs(spark, rows)
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws|"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    picked = (
        df.select("doc_id", F.col("n_chars").alias("weight"), u.alias("_u"))
        .selectExpr("doc_id", "weight", "_u div greatest(weight, 1L) AS priority")
        .orderBy("priority", "doc_id")
        .limit(40)
        .collect()
    )
    # exact agreement with the pure-Python recurrence over ALL 200 docs:
    # same md5 tail, same integer division, same top-40 set
    expected = sorted(
        ((_priority(i, w), i) for i, w in ((r[0], r[4]) for r in rows))
    )[:40]
    got = sorted((r.priority, r.doc_id) for r in picked)
    assert got == expected
    # the full top-40 is dominated by the heavy class: P(pick) ∝ weight
    heavy = sum(1 for r in picked if r.weight == 1000)
    assert heavy >= 35


def test_jaccard_threshold_sweep_buckets_and_cumulative(spark):
    # two exact dups (jaccard 1.0 → bucket 9) + one partial overlap
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = a
    c = "alpha beta gamma delta epsilon zeta different tail words here"
    d = "completely unrelated text with many distinct words present"
    df = _docs(
        spark,
        [(1, a, "en", "s", 1), (2, b, "en", "s", 1), (3, c, "en", "s", 1),
         (4, d, "en", "s", 1)],
    )
    rows = {r.bucket: (r.n_pairs, r.pairs_at_or_above)
            for r in jaccard_threshold_sweep(df, "doc_id", "text").collect()}
    assert rows[9][0] == 1  # the exact pair
    # cumulative is monotone from the top bucket down
    buckets = sorted(rows, reverse=True)
    cum = 0
    for bkt in buckets:
        cum += rows[bkt][0]
        assert rows[bkt][1] == cum


def test_lang_confusion_diagonal_on_separable_corpus(spark, tmp_path):
    # write a tiny parquet corpus so the catalog query runs end-to-end
    rows = []
    texts = {
        "en": "the cat sat on the mat and the dog ran over the hill today",
        "fr": "le chat est sur le tapis et le chien court dans le jardin",
        "es": "el gato duerme en la casa y el perro corre por el campo",
    }
    i = 0
    for lang, t in texts.items():
        for _ in range(5):
            rows.append((i, t + f" {i}", lang, "s", len(t)))
            i += 1
    _docs(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from gush_spark.queries_pipeline import q_lang_confusion_matrix

    conf = {
        (r.true_lang, r.pred_lang): (r.n, r.share_ppm)
        for r in q_lang_confusion_matrix(spark, str(tmp_path)).collect()
    }
    # trivially separable corpus → pure diagonal at 100% share
    assert conf == {
        ("en", "en"): (5, 1000000),
        ("fr", "fr"): (5, 1000000),
        ("es", "es"): (5, 1000000),
    }
