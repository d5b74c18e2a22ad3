"""Domain-level reputation filtering — aggregate a per-doc quality
signal up to the source/host/domain, then gate documents by their
domain's reputation rather than (or in addition to) their own score.
Web-scale curation does this because spam is domain-correlated: a
borderline page from a consistently-good domain is worth more than the
same page from a content farm.

Scale design: the domain rollup is ONE map-side-combinable hash agg
(sum+count per domain — never a raw-doc shuffle of text), producing a
result whose cardinality is the number of distinct domains — millions
at web scale, i.e. broadcastable after the agg even at 10^12 docs. The
gate itself is then a **broadcast join back**: the corpus side is
map-only. Same two-pass shape as the salted skew agg
(operators/windows.salted_agg) but with the second pass inverted onto
the small side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domain_stats(
    df: DataFrame, domain_col: str, score_col: Column | str
) -> DataFrame:
    """Per-domain doc count and mean score (decimal-sum then one double
    divide, so the mean is addition-order independent — required for
    hash-stable oracles and exactly reproducible retries)."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    return df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(score.cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("domain_quality"),
    )


def domain_reputation_gate(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    score_col: Column | str,
    *,
    min_quality: float,
) -> DataFrame:
    """Tag every doc with its domain's reputation and a keep/drop flag.

    Output: ``id_col``, ``domain_col``, per-doc score as ``doc_quality``,
    ``domain_quality``, ``n_docs`` (domain size), ``domain_flagged``
    (domain mean below ``min_quality``). Callers filter
    ``NOT domain_flagged`` or keep the columns as features.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    stats = domain_stats(df, domain_col, score).withColumnRenamed(
        domain_col, "_stat_domain"
    )
    docs = df.select(F.col(id_col), F.col(domain_col), score.alias("doc_quality"))
    # null-safe equality: docs with a null domain (e.g. schemeless URLs
    # from urls.canonicalize_url) group together in domain_stats and
    # must come BACK out tagged, not silently vanish on null != null
    return (
        docs.join(
            F.broadcast(stats),
            docs[domain_col].eqNullSafe(stats["_stat_domain"]),
            "inner",
        )
        .select(
            id_col,
            domain_col,
            "doc_quality",
            "domain_quality",
            "n_docs",
            (F.col("domain_quality") < F.lit(min_quality)).alias("domain_flagged"),
        )
    )
