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


def drain_schedule(
    demand: DataFrame,
    budget: int,
    quota_per_cycle: int,
    key_col: str = "host",
    demand_col: str = "n_pages",
) -> DataFrame:
    """The scheduling triad composed into a drain plan: apportion the
    global per-cycle fetch ``budget`` across hosts by demand
    (:func:`apportion_budget`), cap each host's per-cycle rate at the
    politeness ``quota_per_cycle`` (the budget may hand a mega-host
    more slots than politeness lets it spend), and report how many
    cycles each host needs to drain its backlog:

        (key, n_pages, alloc, effective_rate, cycles_to_drain)

        effective_rate  = least(alloc, quota)
        cycles_to_drain = ceil(n_pages / effective_rate)
                        = (n_pages + rate − 1) DIV rate   (BIGINT)

    ``max(cycles_to_drain)`` over the output is the crawl's makespan;
    hosts NEAR it are the critical path, and slots reclaimed from
    politeness-capped hosts (alloc > quota — allocated slots they can
    never spend) are the reallocation opportunity the next budget
    cycle should take. Hosts with effective_rate 0 (zero alloc under
    an over-subscribed budget) report NULL cycles — unscheduled, not
    infinitely scheduled.

    All-BIGINT (every operand non-negative), hash-exact. Scale shape:
    exactly apportion_budget's — one demand agg, one host-frame
    window; the report adds pure projection."""
    alloc = apportion_budget(
        demand.select(
            F.col(key_col).alias("key"), F.col(demand_col).alias("weight")
        ),
        budget,
        key_col="key",
        weight_col="weight",
    )
    rated = alloc.select(
        F.col("key").alias(key_col),
        F.col("weight").alias(demand_col),
        F.col("alloc").cast("long").alias("alloc"),
        F.least(F.col("alloc"), F.lit(int(quota_per_cycle)).cast("long"))
        .cast("long")
        .alias("effective_rate"),
    )
    return rated.withColumn(
        "cycles_to_drain",
        F.when(
            F.col("effective_rate") > 0,
            F.expr(
                f"({demand_col} + effective_rate - 1) DIV effective_rate"
            ),
        ).cast("long"),
    )
