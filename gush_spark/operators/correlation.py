"""Rank correlation between per-document signals — the redundancy
audit for the gate stack: a curation pipeline that runs five quality
signals at 10^12-page scale wants to know which of them are measuring
the same thing. Spearman's ρ over deterministic ranks answers it with
one number per signal pair (ρ → 1: the cheaper signal can replace the
dearer one; ρ → 0: genuinely independent evidence).

    ρ = 1 − 6·Σd² / (n·(n²−1)),   d = rank_a − rank_b

No reference analog (gush has no statistics surface); driver-brief
training-pipeline mandate, next to classifier.calibration_bins (which
audits ONE signal against labels; this audits signals against each
other).

Exactness: ranks are ``row_number`` over a TOTAL order (signal, then
id — ties broken identically in both engines), so Σd² is an exact
BIGINT; n·(n²−1) is exact BIGINT (n < 2^21 before overflow); the
final ρ is ONE double multiply and ONE divide of exactly-represented
integers (Σd² < 2^53), so both engines produce the identical rounded
value. Hash-exact.

Scale honesty: each rank is a global total order. At corpus scale the
``row_number() OVER (ORDER BY ...)`` here is the classic
single-partition-sort trap; the production form swaps BOTH rank
stages for curriculum_order's bucketed two-phase ordinals (bucket →
local rank → KB-sized offset join; operators/curriculum.py) over a
scaled-integer key — same output, no global sort — or runs on a
deterministic hash sample (ρ estimates need ~10^4 rows for 2 decimal
places). At audit-sample scale the direct form below is the honest
plan, and n·(n²−1) overflow (n ≥ ~2^21) is the same boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def spearman_rho(
    df: DataFrame,
    col_a: Column | str,
    col_b: Column | str,
    id_col: str = "doc_id",
) -> DataFrame:
    """One row: ``(n_docs, sum_d2, rho)`` — Spearman rank correlation
    between two per-row signals, ranks ordered (signal ASC, id ASC).
    With distinct signal values this is the textbook ρ; with heavy
    ties it is the deterministic row_number variant (documented, not
    the midrank average — midranks would re-introduce cross-engine
    float averaging for zero audit value)."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    ranked = df.select(
        F.row_number()
        .over(Window.orderBy(a, F.col(id_col)))
        .cast("long")
        .alias("_ra"),
        F.row_number()
        .over(Window.orderBy(b, F.col(id_col)))
        .cast("long")
        .alias("_rb"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_ra") - F.col("_rb")) * (F.col("_ra") - F.col("_rb")))
        .cast("long")
        .alias("sum_d2"),
    ).select(
        "n_docs",
        "sum_d2",
        F.round(
            F.lit(1.0)
            - (F.lit(6.0) * F.col("sum_d2"))
            / (F.col("n_docs") * (F.col("n_docs") * F.col("n_docs") - 1)),
            9,
        ).alias("rho"),
    )
