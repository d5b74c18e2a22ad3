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

Scale design: MAP-ONLY gram construction — ``arrays_zip(ws, slice(ws,
2, n-1))`` pairs every token with its successor in pure codegen
(operators/lm.zipped_token_pairs), tokens hashed to their md5 before
anything shuffles, so the one exchange before the final per-doc
aggregation carries (doc, n, 16-byte key) partial counts and never
token text or positions; bigram keys are md5-of-adjacent-md5s. Two
map-side-combinable hash aggregations total — (doc, n, key) counts,
then per-doc maxima (n_tokens is recovered as the sum of unigram
counts, so nothing needs to ride alongside the explode). The scores
only ever use COUNTS, so hashing the keys cannot change the result
(md5 collisions at 2^-128).

Deliberately ZERO higher-order lambdas: an earlier form built the gram
array with ``transform``/``sequence`` lambdas, which Spark evaluates
interpreted (no codegen inside lambda bodies) — measured 16.7 s at
sf0.1 vs ~1s. A second iteration used posexplode + a ``lead()`` window
per doc — correct, but it paid a corpus-wide (doc, pos, hash) exchange
just to pair adjacent tokens; the zip form deletes that exchange
outright. Same lesson as functions/page_features.py: hot per-row loops
either stay in codegen or go to a fused pandas UDF, never interpreted
HOFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    from gush_spark.operators.lm import zipped_token_pairs

    df = _spread(df, spread)
    hashed = zipped_token_pairs(df, id_col, text_col).select(
        F.col(id_col),
        F.md5("pr._ws").alias("_h1"),
        F.md5("pr._nxt").alias("_h2"),  # null at the last token
    )
    # one generator row per gram: (n=1, unigram key) + (n=2, bigram key;
    # md5(concat) of the null successor is null and is filtered)
    grams = hashed.select(
        id_col,
        F.expr("stack(2, 1, _h1, 2, md5(concat(_h1, _h2)))").alias("n", "gk"),
    ).filter(F.col("gk").isNotNull())
    counts = grams.groupBy(id_col, "n", "gk").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("n_tokens"),
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
