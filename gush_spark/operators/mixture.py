"""Training-mixture construction — resample a corpus to target stratum
weights (the "data mixing" step before pre-training: e.g. 40% en,
30% code, ...). Strata below their target are UPSAMPLED by repeating
documents; strata above it are DOWNSAMPLED by deterministic rank — and
both directions are a pure function of (id, stratum, weights), so the
mixture is reproducible across engines, retries and cluster sizes, and
a re-run adds/removes exactly the intended copies.

Semantics per stratum s with n_s docs and target t_s = round(w_s * N):
docs are ranked by md5(id) (content-independent, same rule as
queries_pipeline.dataset_split); doc at 1-based rank r materializes
``floor(t_s/n_s) + (1 if r <= t_s mod n_s else 0)`` copies — so the
output has EXACTLY t_s rows for the stratum, repeats are spread evenly,
and which docs get the extra copy is deterministic. Strata missing
from ``weights`` get weight 0 (dropped).

Scale design: stratum sizes and targets are one map-side-combinable
agg joined back **broadcast** (cardinality = number of strata); the
rank is one window per stratum (spill-safe sort; for mega-strata the
same salting trick as dataset splitting applies — rank within
(stratum, id-hash bucket) and scale targets per bucket); copies
materialize with explode(sequence(...)) — no driver loop, no rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mixture_resample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: dict[str, float],
    total: int,
) -> DataFrame:
    """One output row per materialized copy: ``id_col``,
    ``stratum_col``, ``copy`` (1..k), plus ``n_copies`` for the doc.

    ``total`` is the target output size; pick weights whose products
    with ``total`` are integral to avoid cross-engine rounding (targets
    use round()). Stratum keys must be strings (lang/source/domain).
    """
    if not weights:
        raise ValueError("mixture_resample needs at least one stratum weight")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{stratum_col} string, _w double",
    )
    # drop weightless strata BEFORE the rank window: ranking rows the
    # targets join would discard anyway wastes a shuffle+sort
    # proportional to the dropped share of the corpus
    df = df.join(F.broadcast(wdf.select(stratum_col)), on=stratum_col, how="left_semi")
    targets = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(F.broadcast(wdf), on=stratum_col, how="inner")
        .select(
            stratum_col,
            "_n",
            F.round(F.col("_w") * F.lit(total)).cast("long").alias("_t"),
        )
    )
    rank_w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(
        F.col(id_col), F.col(stratum_col), F.row_number().over(rank_w).alias("_r")
    )
    copies = (
        F.floor(F.col("_t") / F.col("_n"))
        + F.when(F.col("_r") <= F.col("_t") % F.col("_n"), 1).otherwise(0)
    ).cast("long")
    return (
        ranked.join(F.broadcast(targets), on=stratum_col, how="inner")
        .withColumn("n_copies", copies)
        .filter(F.col("n_copies") > 0)
        .select(
            id_col,
            stratum_col,
            "n_copies",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy"),
        )
        .select(id_col, stratum_col, F.col("copy").cast("long").alias("copy"), "n_copies")
    )


def token_budget_plan(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    weights: dict[str, float],
    budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """Epoch planning under a token budget — the step before
    ``mixture_resample`` when the unit is TOKENS, not documents: given
    target mixture weights and a total training-token budget, how many
    tokens (and therefore epochs) does each stratum contribute, with
    repetition capped at ``max_epochs`` (repeating data much past ~4
    epochs stops helping — Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models") and the capped strata's surplus
    redistributed pro-rata across the uncapped ones (ONE redistribution
    round; a second-order overflow past another stratum's cap is
    reported in ``over_cap``, not silently re-spread).

    Output per stratum: ``n_docs, toks_available, target_toks,
    plan_toks, epochs, over_cap``. All allocation arithmetic is BIGINT
    (pro-rata shares use integer division), so the plan is
    engine/partitioning/retry-invariant; ``epochs`` is the single
    final double division.

    Scale shape: ONE map-side-combinable agg over the corpus keyed by
    stratum; everything after operates on ≤ |strata| rows with 1-row
    broadcast totals — driver never loops."""
    if not weights:
        raise ValueError("token_budget_plan needs at least one stratum weight")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{stratum_col} string, _w double",
    )
    avail = (
        df.groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).cast("long").alias("toks_available"),
        )
        .join(F.broadcast(wdf), on=stratum_col, how="inner")
    )
    raw = avail.select(
        stratum_col,
        "n_docs",
        "toks_available",
        F.round(F.col("_w") * F.lit(budget)).cast("long").alias("target_toks"),
        (F.lit(max_epochs) * F.col("toks_available")).alias("_cap_toks"),
    ).select(
        "*",
        F.least(F.col("target_toks"), F.col("_cap_toks")).alias("_capped"),
        (F.col("target_toks") > F.col("_cap_toks")).alias("_is_capped"),
    )
    totals = raw.agg(
        F.sum(F.col("target_toks") - F.col("_capped")).alias("_surplus"),
        F.sum(F.when(~F.col("_is_capped"), F.col("target_toks")).otherwise(0))
        .alias("_uncapped_raw"),
    )
    planned = raw.crossJoin(F.broadcast(totals)).select(
        stratum_col,
        "n_docs",
        "toks_available",
        "target_toks",
        (
            F.col("_capped")
            + F.when(
                F.col("_is_capped") | (F.col("_uncapped_raw") == 0), F.lit(0)
            ).otherwise(
                # BIGINT pro-rata: true integer division, never a
                # double round-then-truncate
                F.expr("(_surplus * target_toks) div _uncapped_raw")
            ).cast("long")
        ).alias("plan_toks"),
        "_cap_toks",
    )
    return planned.select(
        stratum_col,
        "n_docs",
        "toks_available",
        "target_toks",
        "plan_toks",
        (
            F.col("plan_toks").cast("double") / F.col("toks_available")
        ).alias("epochs"),
        (F.col("plan_toks") > F.col("_cap_toks")).alias("over_cap"),
    )


def temperature_weights(
    df: DataFrame,
    stratum_col: str,
    *,
    temperature: float = 2.0,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled sampling weights per stratum — the
    multilingual rebalancing rule (mT5 / XLM-R style): sample stratum
    s with probability ∝ n_s^(1/T), which upweights low-resource
    strata relative to raw proportions as T grows (T=1 is natural
    frequency, T→∞ is uniform).

    This module's :func:`mixture_resample` takes target weights as a
    GIVEN; this derives them from corpus counts. Only T=2 is exposed:
    n^(1/2) is ``sqrt``, the one power IEEE-754 requires to be
    correctly rounded, so Spark and DuckDB produce the identical
    double and ``floor(sqrt(n)·scale)`` is engine-exact BIGINT —
    general T would ride on ``pow``, whose cross-engine last-ulp
    behavior this repo refuses to depend on (same reasoning as the
    fold-based cosine oracles).

    Returns ``(stratum, n_docs, weight)`` with
    ``weight = floor(sqrt(n_docs) · weight_scale)`` — integer
    "populations" ready for budget.apportion_budget, which converts
    them into an exact integer allocation (Σ alloc == budget, zero
    float drift). The composition — count, sqrt-scale, apportion — is
    the whole operator; each stage is one map-side-combinable agg or
    one stratum-frame window, nothing corpus-sized on the wire."""
    if temperature != 2.0:
        raise NotImplementedError(
            "only T=2 (exponent 1/2 == sqrt) is engine-exact; see docstring"
        )
    return df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).select(
        "stratum",
        "n_docs",
        F.floor(
            F.sqrt(F.col("n_docs").cast("double")) * F.lit(int(weight_scale))
        )
        .cast("long")
        .alias("weight"),
    )
