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
