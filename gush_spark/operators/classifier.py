"""Linear text classifier scoring — the fastText-shaped quality/domain
model pass every modern curation pipeline runs (e.g. a CCNet-style
"looks like Wikipedia" filter): tokenize, look up a per-token weight,
average into a document score, threshold into a keep label.

No reference analog (the reference has no model surface); this is the
model-based filter stage of the LLM-pipeline surface, kept
deterministic here because the sandbox ships no model artifacts: the
default weight table is derived from a seeded md5 over the token text
(a fixed random projection — the same trick as SimHash's bit basis,
operators/dedup.py), and a REAL trained weight table plugs in through
``weights=`` without changing the plan shape.

Scale shape:
- tokenization is the shared map-only ``words_of`` split; raw text
  never crosses an exchange;
- hashed weights (default) are a pure-JVM column expression — the ONLY
  exchange is the doc-keyed partial+final sum of (doc_id, long) rows;
- an explicit ``weights`` table joins on the token — Catalyst
  broadcasts it when it is model-sized (|vocab| · 12 bytes; a 2M-row
  fastText vocab is ~25 MB) and shuffles if a user hands a
  pathological one — the decision stays with the optimizer;
- scoring is integer-exact end to end: weights are scaled integers in
  [-1000, 1000], the per-doc sum is a BIGINT, and the score is ONE
  final division by (1000 · n_tokens) — hash-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of

WEIGHT_SCALE = 1000


def hashed_token_weight(term: Column, seed: str = "q0") -> Column:
    """Deterministic integer weight in [-1000, 1000]: the first 8 md5
    hex digits of (seed ‖ term) mod 2001, centered. A fixed random
    projection — E[score] ≈ 0 for generic text, so any learned table
    swapped in later shifts scores, not the pipeline."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), term)), 1, 8), 16, 10
    ).cast("long")
    return (h % (2 * WEIGHT_SCALE + 1) - WEIGHT_SCALE).alias("wt")


def linear_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    seed: str = "q0",
    weights: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Per-document mean token weight and keep label:
    ``(id, n_tokens, score_scaled, score, keep)``.

    ``weights`` (optional): a ``(term, wt)`` table of scaled-integer
    weights replacing the hashed default; out-of-vocabulary tokens
    weigh 0 (left join + coalesce). Documents with no tokens (null or
    whitespace-only text) have no score and are omitted — gate them
    beforehand with validate.expectations_report / curation gates."""
    toks = docs.select(
        F.col(id_col), F.explode(words_of(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    if weights is None:
        weighted = toks.select(id_col, hashed_token_weight(F.col("term"), seed))
    else:
        weighted = toks.join(weights, "term", "left").select(
            id_col, F.coalesce(F.col("wt"), F.lit(0)).cast("long").alias("wt")
        )
    return (
        weighted.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("wt").alias("score_scaled"),
        )
        .select(
            id_col,
            "n_tokens",
            "score_scaled",
            (
                F.col("score_scaled").cast("double")
                / (F.lit(WEIGHT_SCALE) * F.col("n_tokens"))
            ).alias("score"),
            (
                F.col("score_scaled").cast("double")
                / (F.lit(WEIGHT_SCALE) * F.col("n_tokens"))
                >= F.lit(threshold)
            ).alias("keep"),
        )
    )


def calibration_bins(
    scores: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Score-calibration audit for the classifier gate: join the
    per-document scores from :func:`linear_scores` to a held-out
    binary target, cut the corpus into ``n_bins`` equal-count score
    bins (ntile over a TOTAL order — score desc, then id, so the
    binning is deterministic and engine-exact), and report per bin

        (bin, n_docs, n_pos, pos_rate_ppm, sum_score_scaled, sum_tokens)

    ``pos_rate_ppm = n_pos·10^6 DIV n_docs`` (both non-negative, so
    truncating DIV and floor ``//`` agree). A calibrated classifier
    shows pos_rate monotone in bin; a flat profile — which the
    default seeded-hash weights produce BY DESIGN, E[score] ≈ 0
    independent of the label — means the scores carry no signal and
    the threshold gate is arbitrary. This is the go/no-go audit
    between training a filter model and trusting it to delete
    petabytes.

    The float score is used ONLY as a sort key (exactly one IEEE
    division per row, identical in both engines); every OUTPUT column
    is BIGINT, so the oracle is hash-exact.

    Scale shape: one broadcast-able equi-join on the id (labels are
    an eval sample, orders of magnitude smaller than the corpus), one
    whole-relation ntile window — the sort frame is the LABELED
    sample, not the corpus — and one ``bin``-keyed map-side-combinable
    agg. Nothing corpus-sized crosses the wire."""
    from pyspark.sql import Window

    joined = scores.join(
        labels.select(
            F.col(id_col), F.col(label_col).cast("long").alias("_y")
        ),
        on=id_col,
    )
    w = Window.orderBy(
        (
            F.col("score_scaled").cast("double") / F.col("n_tokens")
        ).desc(),
        F.col(id_col),
    )
    binned = joined.withColumn(
        "bin", F.ntile(int(n_bins)).over(w).cast("long")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_y").cast("long").alias("n_pos"),
            F.sum("score_scaled").cast("long").alias("sum_score_scaled"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.expr("n_pos * 1000000L DIV n_docs").alias("pos_rate_ppm"),
            "sum_score_scaled",
            "sum_tokens",
        )
    )
