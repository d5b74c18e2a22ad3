"""Bigram language-model likelihood scoring — the CCNet-style
"in-domain LM" quality signal (Wenzek et al., *CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data*, 2020): train a
smoothed n-gram model on a trusted reference slice of the corpus,
score every page by how likely its text is under that model, and gate
on the score. Pages in the wrong language, machine-generated noise and
template soup all score low even when surface ratios
(functions/text_analysis.quality_features) look fine.

The reference engine has no analog (gush is a binlog CEP pipeline,
`/root/reference/src/main/scala/io/simao/gush` has no text scoring);
this belongs to the training-data-curation surface the 100 TB brief
demands alongside dedup/decontamination.

Scale design:
- gram identity is md5-of-md5s built MAP-ONLY: ``arrays_zip(ws,
  slice(ws, 2, n-1))`` + explode pairs every token with its successor
  with zero shuffle and zero interpreted lambda (one step beyond the
  operators/repetition.py lead()-window form, which still paid a
  corpus-wide (id, pos, hash) exchange); every exchange carries
  ``(doc, 16-byte key)``, never token text;
- the model is two hash aggregations with map-side partial combine —
  bigram counts keyed by the gram hash, context counts keyed by the
  unigram hash — so Zipf-hot grams collapse to one row per partition
  before the shuffle;
- scoring is two equi-joins on hashed keys plus one per-doc
  aggregation. At CI scale Catalyst broadcasts the model; at 100 TB
  the gram join shuffles 8/16-byte keys, or ``prune_min_count`` shrinks
  the model below the broadcast threshold (pruned grams fall back to
  the unseen-gram probability — the standard top-K-vocab LM trick);
- probabilities are add-one smoothed and reported in EXACT fixed point
  — ``floor((c+1)*1e9 / (ctx+V))`` is pure BIGINT arithmetic in both
  Spark and DuckDB, so the driver's value-hash oracle comparison has
  no transcendental / FP-summation-order hazard. The geometric-mean
  log form (true mean log-probability, what a production gate
  thresholds) rides the same joins as a double column behind
  ``with_logprob=True`` and is pinned by pytest against a pure-Python
  reference instead of SQL.

BIGINT bound: ``(c+1) * 1e9`` overflows int64 at ``c >= ~9.2e9``
occurrences of one bigram in the reference slice. Spark runs ANSI mode
(overflow errors, never wraps); a corpus that hot needs
``prune_min_count`` anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of

P9_SCALE = 1_000_000_000  # fixed-point probability scale (1e9)


def zipped_token_pairs(
    df: DataFrame, id_col: str, text_col: str, *, carry: tuple[str, ...] = ()
) -> DataFrame:
    """One row per TOKEN of the normalized text, paired with its
    successor: ``(id, pr)`` where ``pr._ws`` is token i and ``pr._nxt``
    is token i+1 (null at the last token). Built map-only:
    ``arrays_zip(ws, slice(ws, 2, n-1))`` — arrays_zip pads the shorter
    array with null, slice/zip/explode are all codegen expressions, so
    there is ZERO shuffle and zero interpreted lambda (the
    operators/repetition.py lesson, minus even its lead() window's
    corpus-wide (id, pos, hash) exchange). The ``_ws``/``_nxt`` arrays
    are bound via withColumn so CollapseProject materializes the
    split exactly once. ``carry`` rides extra per-doc columns through.
    """
    b = df.withColumn("_ws", words_of(F.col(text_col)))
    b = b.withColumn(
        "_nxt", F.slice("_ws", 2, F.greatest(F.size("_ws") - 1, F.lit(0)))
    )
    return b.select(
        F.col(id_col), *carry, F.explode(F.arrays_zip("_ws", "_nxt")).alias("pr")
    )


def bigram_keys(
    df: DataFrame, id_col: str, text_col: str, *, carry: tuple[str, ...] = ()
) -> DataFrame:
    """One row per bigram slot of the normalized text:
    ``(id, h1, gk)`` with ``h1 = md5(w_i)`` (the context key) and
    ``gk = md5(md5(w_i) || md5(w_{i+1}))`` (the gram key). Map-only —
    token text never leaves its scan stage; only 16-byte keys flow on.
    """
    ex = zipped_token_pairs(df, id_col, text_col, carry=carry).filter(
        F.col("pr._nxt").isNotNull()
    )
    hashed = ex.select(
        F.col(id_col),
        *carry,
        F.md5("pr._ws").alias("h1"),
        F.md5("pr._nxt").alias("_h2"),
    )
    return hashed.select(
        id_col, *carry, "h1", F.md5(F.concat("h1", "_h2")).alias("gk")
    )


def train_bigram_lm(
    ref: DataFrame,
    id_col: str,
    text_col: str,
    *,
    prune_min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train an add-one-smoothed bigram model on the reference slice.

    Returns ``(model, ctx, vocab)``:
    - ``model``: ``(gk, c)`` — bigram occurrence counts (grams with
      ``c < prune_min_count`` dropped; they score as unseen);
    - ``ctx``:   ``(h1, cc)`` — per-context bigram-slot counts (NEVER
      pruned: the denominator must stay exact or pruning would change
      seen-gram scores too);
    - ``vocab``: single row ``(V)`` — distinct unigram count over all
      reference tokens, the add-one denominator offset.
    """
    bg = bigram_keys(ref, id_col, text_col)
    model = bg.groupBy("gk").agg(F.count(F.lit(1)).alias("c"))
    if prune_min_count > 1:
        model = model.filter(F.col("c") >= prune_min_count)
    ctx = bg.groupBy("h1").agg(F.count(F.lit(1)).alias("cc"))
    vocab = (
        ref.select(F.explode(words_of(F.col(text_col))).alias("w"))
        .select(F.md5("w").alias("h"))
        .agg(F.count_distinct("h").cast("long").alias("V"))
    )
    return model, ctx, vocab


def score_with_bigram_lm(
    docs: DataFrame,
    model: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    *,
    broadcast_model: bool = False,
    with_logprob: bool = False,
) -> DataFrame:
    """Score every doc under the trained model. Output per doc:

    - ``n_bigrams``       — bigram slots (0 for empty/one-token docs);
    - ``matched_bigrams`` — slots whose gram exists in the model;
    - ``sum_p9``          — Σ floor((c+1)·1e9 / (cc+V)), the exact
      fixed-point sum of smoothed bigram probabilities (BIGINT; divide
      by ``n_bigrams`` downstream for the mean);
    - ``mean_logp``       — (only with ``with_logprob=True``) mean
      ln p(w_{i+1}|w_i), the production gate quantity (double — not
      oracle-compared; pytest pins it against a Python reference).

    Docs with no bigrams stay in the output with zero counts — empties
    are data, same convention as the extraction error channel.
    ``broadcast_model=True`` forces both model joins broadcast (use
    with ``prune_min_count``); default leaves the strategy to Catalyst
    (AQE picks broadcast when the model fits, shuffles 16-byte keys
    otherwise).
    """
    bg = bigram_keys(docs, id_col, text_col)
    m = F.broadcast(model) if broadcast_model else model
    cx = F.broadcast(ctx) if broadcast_model else ctx
    j = (
        bg.join(m, "gk", "left")
        .join(cx, "h1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.coalesce(F.col("c"), F.lit(0)).alias("_c"),
            F.coalesce(F.col("cc"), F.lit(0)).alias("_cc"),
            "V",
        )
    )
    p9 = F.expr(f"((_c + 1L) * {P9_SCALE}L) div (_cc + V)")
    aggs = [
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("_c") > 0).cast("long")).alias("matched_bigrams"),
        F.sum(p9).alias("sum_p9"),
    ]
    if with_logprob:
        aggs.append(
            F.avg(
                F.ln(
                    (F.col("_c") + F.lit(1)).cast("double")
                    / (F.col("_cc") + F.col("V")).cast("double")
                )
            ).alias("mean_logp")
        )
    per = j.groupBy(id_col).agg(*aggs)
    out_cols = [
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("matched_bigrams", F.lit(0)).cast("long").alias(
            "matched_bigrams"
        ),
        F.coalesce("sum_p9", F.lit(0)).cast("long").alias("sum_p9"),
    ]
    if with_logprob:
        out_cols.append(F.col("mean_logp"))  # null for 0-bigram docs
    return docs.select(id_col).join(per, id_col, "left").select(id_col, *out_cols)


def lm_gate(
    docs: DataFrame,
    model: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_mean_logp: float,
    broadcast_model: bool = True,
) -> DataFrame:
    """Keep docs whose mean bigram log-probability clears the bar —
    the CCNet-style likelihood gate (their head/middle/tail split is a
    perplexity threshold; this is the same quantity, natural log).
    Docs with no bigrams are dropped (no evidence ⇒ not trusted).
    Default broadcasts the model: a gate runs inside larger pipelines
    (batch or foreachBatch) where re-shuffling the corpus per gate is
    exactly what the zero-shuffle curation design forbids.
    """
    scored = score_with_bigram_lm(
        docs.select(id_col, text_col),
        model,
        ctx,
        vocab,
        id_col,
        text_col,
        broadcast_model=broadcast_model,
        with_logprob=True,
    )
    keep = scored.filter(
        F.col("mean_logp").isNotNull() & (F.col("mean_logp") >= F.lit(min_mean_logp))
    ).select(id_col)
    # keep is most-of-the-corpus — never broadcast it; the semi join
    # shuffles ids only and AQE coalesces it with the scoring agg's
    # existing hash partitioning on the same key.
    return docs.join(keep, id_col, "left_semi")
