"""Hashed n-gram importance scoring and resampling — the DSIR recipe
(Xie et al., *Data Selection for Language Models via Importance
Resampling*, NeurIPS 2023): featurize every page into ``B`` hashed
unigram+bigram buckets, fit target and raw bucket distributions, weight
each page by how target-like its feature counts are, keep the
high-importance slice. This is the "make 100 TB of crawl look like the
trusted corpus" selector that complements the absolute-quality gates
(quality_features, repetition, LM likelihood in operators/lm.py).

No reference analog (gush is a binlog CEP engine); part of the
training-data-curation surface the brief demands.

Scale design — this is the best-case 100 TB shape:
- features are the SAME hashed gram keys as operators/lm.py, built
  MAP-ONLY in one corpus scan (zipped token pairs + a 2-way stack —
  zero shuffle, zero interpreted lambdas), folded into ``B`` buckets
  map-side, so exchanges carry ``(doc, int bucket)``;
- fitting is ONE corpus pass when the target is a slice of the raw
  corpus (the DSIR setup): a per-feature target flag rides the explode
  and one bounded-key hash aggregation (≤ B groups, map-side combine)
  produces BOTH distributions; the counts table is persisted (≤ B
  rows) so the totals row and the scoring broadcast never re-run the
  corpus lineage;
- the fitted table and the 1-row totals are explicit broadcasts;
  scoring is ONE broadcast join + one per-doc aggregation, with ZERO
  corpus-sized shuffle beyond the per-doc agg itself.

Exactness: DSIR's importance weight is a sum of log-ratios —
transcendental, FP-order-hazardous under the driver's value-hash
oracle. The oracle-compared form is the cross-multiplied linear
affinity

    aff_num = Σ_g (c_t(b(g)) + 1) · S_r
    aff_den = Σ_g (c_r(b(g)) + 1) · S_t

(S_t, S_r = smoothed totals Σ_b (c+1) = T + B). ``aff_num/aff_den``
estimates the mean per-feature target/raw probability ratio with pure
BIGINT arithmetic — exact in both engines; the threshold selector
compares ``aff_num · 1000 ≥ aff_den · permille`` without ever leaving
integers. The true DSIR log-ratio weight is available as a double
column behind ``with_logweight=True`` for production pipelines and is
pytest-pinned against a NumPy reference instead of SQL.

BIGINT bound: each term is ≤ (T_t+B)·(T_r+B) ≈ feature-count², summed
over a doc's grams — overflows int64 only past ~10^9 total features
per distribution fit; shard the fit (counts are mergeable) before that.
Spark runs ANSI mode, so an overflow errors instead of wrapping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gush_spark.operators.lm import zipped_token_pairs

DEFAULT_BUCKETS = 1024


def feature_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """One row per hashed feature occurrence: ``(id, b)`` where ``b``
    folds the gram's 60-bit md5 prefix into ``[0, n_buckets)``.
    Features are all unigrams plus all bigrams of the normalized text
    (the DSIR featurization), keyed exactly like operators/lm.py so the
    two operators share one gram vocabulary. ``carry`` rides extra
    per-doc columns through unchanged.

    ONE corpus scan, ZERO shuffle: the zipped token-pair explode
    (operators/lm.zipped_token_pairs) yields every token row once; a
    2-way ``stack`` emits its unigram key always and its bigram key
    when a successor exists (md5(concat) of a null successor is null
    and is filtered)."""
    ex = zipped_token_pairs(df, id_col, text_col, carry=carry)
    hashed = ex.select(
        F.col(id_col),
        *carry,
        F.md5("pr._ws").alias("_h1"),
        F.md5("pr._nxt").alias("_h2"),  # null at the last token
    )
    keys = hashed.select(
        id_col,
        *carry,
        F.expr("stack(2, _h1, md5(concat(_h1, _h2)))").alias("k"),
    ).filter(F.col("k").isNotNull())
    b = F.pmod(
        F.conv(F.substring(F.col("k"), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    return keys.select(id_col, *carry, b.cast("long").alias("b"))


def fit_bucket_distributions(
    raw: DataFrame,
    target_cond: Column,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Fit both hashed-feature distributions in ONE corpus pass:
    ``target_cond`` is a row predicate over ``raw`` (e.g.
    ``F.col('lang') == 'en'``) marking the trusted slice. Returns
    ``(counts, totals)``:

    - ``counts``: ``(b, ct, cr)`` — target and raw occurrence counts
      per bucket, ≤ B rows, persisted (bounded — the legitimate cache:
      both the totals row and the scoring broadcast read it without
      re-running the corpus explode);
    - ``totals``: single row ``(st, sr)`` with
      ``st = Σ_b (ct+1) = T_t + n_buckets`` (add-one smoothing over all
      B buckets) and likewise ``sr``.
    """
    flagged = raw.withColumn("_is_target", target_cond)
    fb = feature_buckets(
        flagged, id_col, text_col, n_buckets=n_buckets, carry=("_is_target",)
    )
    counts = (
        fb.groupBy("b")
        .agg(
            F.sum(F.col("_is_target").cast("long")).alias("ct"),
            F.count(F.lit(1)).alias("cr"),
        )
        .persist()
    )
    totals = counts.agg(
        (F.sum("ct") + F.lit(n_buckets)).cast("long").alias("st"),
        (F.sum("cr") + F.lit(n_buckets)).cast("long").alias("sr"),
    )
    return counts, totals


def importance_scores(
    docs: DataFrame,
    counts: DataFrame,
    totals: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    with_logweight: bool = False,
) -> DataFrame:
    """Per-doc importance affinity. Output:

    - ``n_feats``  — hashed feature occurrences (0 for empty docs);
    - ``aff_num``  — Σ (c_t+1)·S_r  (BIGINT, exact);
    - ``aff_den``  — Σ (c_r+1)·S_t  (BIGINT, exact; 0 iff n_feats=0);
    - ``log_weight`` — (``with_logweight=True`` only) the true DSIR
      Σ log((c_t+1)/S_t) − log((c_r+1)/S_r), double, not oracle-compared.

    Zero-feature docs stay in the output (empties are data). One
    broadcast join (the ≤ B-row counts table) + one per-doc agg.
    """
    fb = feature_buckets(docs, id_col, text_col, n_buckets=n_buckets)
    j = (
        fb.join(F.broadcast(counts), "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).alias("_t1"),
            (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1)).alias("_r1"),
            "st",
            "sr",
        )
    )
    aggs = [
        F.count(F.lit(1)).alias("n_feats"),
        F.sum(F.col("_t1") * F.col("sr")).alias("aff_num"),
        F.sum(F.col("_r1") * F.col("st")).alias("aff_den"),
    ]
    if with_logweight:
        aggs.append(
            F.sum(
                F.ln(F.col("_t1").cast("double") / F.col("st").cast("double"))
                - F.ln(F.col("_r1").cast("double") / F.col("sr").cast("double"))
            ).alias("log_weight")
        )
    per = j.groupBy(id_col).agg(*aggs)
    out_cols = [
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("aff_num", F.lit(0)).cast("long").alias("aff_num"),
        F.coalesce("aff_den", F.lit(0)).cast("long").alias("aff_den"),
    ]
    if with_logweight:
        out_cols.append(F.col("log_weight"))
    return docs.select(id_col).join(per, id_col, "left").select(id_col, *out_cols)


def importance_resample(
    docs: DataFrame,
    counts: DataFrame,
    totals: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_ratio_permille: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Deterministic importance-threshold selection: keep docs whose
    mean target/raw feature ratio is ≥ min_ratio_permille/1000,
    compared in exact integers (``aff_num·1000 ≥ aff_den·permille``).
    Zero-feature docs are dropped (no evidence of target-likeness).

    This is the thresholded variant of DSIR's Gumbel-top-k sampling:
    the ranking quantity is the same importance weight; a production
    sampler would add deterministic per-doc hash noise before the
    cut. Returns the kept docs' full rows.
    """
    scored = importance_scores(
        docs,
        counts,
        totals,
        id_col,
        text_col,
        n_buckets=n_buckets,
    )
    keep = scored.filter(
        (F.col("n_feats") > 0)
        & (
            F.col("aff_num") * F.lit(1000)
            >= F.col("aff_den") * F.lit(min_ratio_permille)
        )
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")
