"""Crawl-budget apportionment — divide a global per-cycle fetch budget
across hosts in proportion to observed demand, exactly.

The scheduling triad this completes: politeness (operators/politeness,
streaming/cep.make_politeness_rule) caps the RATE per host inside a
window; recrawl (operators/recrawl) ranks WHICH pages to refetch;
apportionment decides HOW MANY fetch slots each host gets out of a
fixed global budget — the allocator a 10^12-page crawler runs each
scheduling cycle before either of the others applies.

Method: Hamilton's largest-remainder apportionment (the classic exact
integer scheme; used for legislative seat allocation since 1792 and
the textbook answer to "integerize proportional shares with zero
drift"):

    base(h)  = B·w(h) DIV W          (floor share)
    leftover = B − Σ base            (< number of hosts)
    +1 to the ``leftover`` hosts with the largest remainder
      B·w(h) MOD W, ties broken by host ascending

Exactness: every quantity is a BIGINT product/div/mod; the remainder
ranking is a total order (remainder DESC, host ASC), so the allocation
is deterministic and Σ alloc == B ALWAYS — no float shares to drift,
nothing to renormalize. Overflow budget: B·w must fit int64
(B ≤ 10^9 with weights ≤ 10^9 — beyond that, scale weights down first;
apportionment is scale-invariant up to remainder ties).

Scale shape: one map-side-combinable weight agg per host, one
whole-relation window for the remainder ranking over the HOST frame
(hosts, not pages — at 10^12 pages the host table is ~10^7 rows), and
a driver-free +1 via rank <= leftover where leftover rides a 1-row
scalar (the recrawl/DSIR totals pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apportion_budget(
    weights: DataFrame,
    budget: int,
    key_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """Allocate ``budget`` integer slots across the rows of
    ``weights(key, weight)`` by largest remainder. Returns
    ``(key, weight, base_alloc, extra, alloc)`` with Σ alloc == budget
    exactly (when Σ weight > 0; an all-zero weight table allocates
    nothing). Zero-weight rows get 0 base and lose every remainder
    tie to any positive remainder, as expected."""
    w = weights.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("w"),
    )
    tot = w.agg(F.sum("w").alias("_tw"))  # NOT "W": Spark names are case-insensitive vs "w"
    j = w.join(F.broadcast(tot), how="cross").select(
        "key",
        "w",
        F.when(
            F.col("_tw") > 0, F.expr(f"{int(budget)}L * w DIV _tw")
        ).otherwise(F.lit(0)).alias("base_alloc"),
        F.when(
            F.col("_tw") > 0, F.expr(f"{int(budget)}L * w % _tw")
        ).otherwise(F.lit(0)).alias("_rem"),
        "_tw",
    )
    # leftover = B - Σ base, a scalar; carried as a window sum over the
    # host frame so no driver collect is needed
    wsum = Window.partitionBy(F.lit(1))
    leftover = (
        F.lit(int(budget)).cast("long")
        - F.sum("base_alloc").over(wsum)
    )
    rnk = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), F.col("key"))
    )
    out = j.select(
        "key",
        "w",
        "base_alloc",
        (rnk <= F.when(F.col("_tw") > 0, leftover).otherwise(F.lit(0)))
        .cast("long")
        .alias("extra"),
    )
    return out.select(
        F.col("key").alias(key_col),
        F.col("w").alias(weight_col),
        "base_alloc",
        "extra",
        (F.col("base_alloc") + F.col("extra")).alias("alloc"),
    )
