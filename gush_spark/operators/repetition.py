"""Repetition-based quality scores — the Gopher/C4-style filters that
catch machine-generated or boilerplate-looped pages that length/
punctuation ratios (functions/text_analysis.quality_features) miss:
a page that repeats one phrase thousands of times has fine length and
punctuation stats but a degenerate n-gram distribution.

Per document:
- ``top_token_frac``      — occurrences of the most frequent token / n_tokens
- ``distinct_token_ratio`` — distinct tokens / n_tokens
- ``top_bigram_frac``     — occurrences of the most frequent word 2-gram
                            / (n_tokens - 1) (the number of bigram slots)

Scale design: one posexplode of the words array, tokens hashed to their
md5 MAP-SIDE so the exchange carries (doc, pos, 16-byte key) and never
token text; bigram keys are md5-of-adjacent-md5s built with ONE
``lead()`` window per doc (per-doc sort, codegen); then two map-side-
combinable hash aggregations — (doc, n, key) counts, then per-doc
maxima. The scores only ever use COUNTS, so hashing the keys cannot
change the result (md5 collisions at 2^-128).

Deliberately ZERO higher-order lambdas: an earlier form built the gram
array with ``transform``/``sequence`` lambdas, which Spark evaluates
interpreted (no codegen inside lambda bodies) — measured 16.7 s at
sf0.1 vs ~1s for this window form. Same lesson as
functions/page_features.py: hot per-row loops either stay in codegen
or go to a fused pandas UDF, never interpreted HOFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of


def repetition_scores(
    df: DataFrame, id_col: str, text_col: str, *, spread: int | None = 0
) -> DataFrame:
    """Per-doc repetition scores; docs with ≥1 token appear in the
    output. ``top_bigram_frac`` is 0.0 for single-token docs.

    ``spread`` follows the operators/dedup._spread convention: default
    0 is a no-op (at crawl scale the input is already split and a
    raw-text exchange is never worth it); LOCAL callers whose corpus
    arrives as one parquet split pass None (auto) or a count so the
    explode doesn't run serial.
    """
    from gush_spark.operators.dedup import _spread

    df = _spread(df, spread)
    ws = words_of(F.col(text_col))
    toks = df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_tokens"),
        F.posexplode(ws).alias("pos", "w"),
    ).select(id_col, "n_tokens", "pos", F.md5("w").alias("h"))
    nxt = F.lead("h").over(Window.partitionBy(id_col).orderBy("pos"))
    keyed = toks.select(
        id_col,
        "n_tokens",
        F.col("h").alias("uk"),
        F.md5(F.concat(F.col("h"), nxt)).alias("bk"),  # null when no next token
    )
    # one generator row per gram: (n=1, unigram key) + (n=2, bigram key)
    grams = keyed.select(
        id_col,
        "n_tokens",
        F.expr("stack(2, 1, uk, 2, bk)").alias("n", "gk"),
    ).filter(F.col("gk").isNotNull())
    counts = grams.groupBy(id_col, "n_tokens", "n", "gk").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy(id_col, "n_tokens").agg(
        F.max(F.when(F.col("n") == 1, F.col("c"))).alias("_umax"),
        F.sum(F.when(F.col("n") == 1, F.lit(1))).alias("_udistinct"),
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("_bmax"),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        (F.col("_umax").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
        (F.col("_udistinct").cast("double") / F.col("n_tokens")).alias(
            "distinct_token_ratio"
        ),
        (
            F.coalesce(F.col("_bmax"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens") - 1, F.lit(1))
        ).alias("top_bigram_frac"),
    )
