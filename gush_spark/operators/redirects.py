"""Redirect-chain resolution by pointer doubling — the URL-alias
collapse every crawl needs before dedup and ranking: 301/canonical
chains (a → b → c → d) must fold to their final target so fetches,
link edges and content versions attach to ONE url.

Algorithm: classic pointer jumping. Start from the direct mapping
m(u) = v, hops = 1; each round substitutes the target's own mapping,
DOUBLING resolved path length (after round r every chain of length
≤ 2^r is fully collapsed): a chain of a million hops resolves in 20
rounds. Each round is ONE target-keyed equi-join of the mapping frame
with itself — no per-row recursion, no driver-side walking; the frame
stays (n_redirects) rows throughout. Convergence is detected by an
any-unresolved count (one cheap action per round, ≤ log2(max chain)
rounds total — same bounded-driver-loop discipline as
operators/graph.pagerank and dedup.min_label_components).

Cycles (a → b → a — hostile or misconfigured sites) cannot resolve:
rows still unresolved when the round budget exhausts are returned with
``resolved = false`` and their current (partially-jumped) target —
errors are data (P10 policy), a crawler marks them as redirect traps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chains(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """Collapse every redirect chain to its final target.

    ``edges``: one row per direct redirect (src → dst); a src appears
    at most once (a url redirects to one place — enforce upstream).
    Returns (src, final, n_hops, resolved): final is the chain's
    terminal url (a url that is not itself a redirect source),
    n_hops the exact chain length, resolved=false only for chains
    still open after ``max_rounds`` doublings (length > 2^max_rounds,
    i.e. cycles in practice).
    """
    m = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("final"),
        F.lit(1).cast("long").alias("n_hops"),
        F.lit(False).alias("done"),
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # done rows are final; open rows look up their target's mapping:
        # found → jump (add the target's already-collapsed hop count),
        # not found → the target is terminal, mark done.
        nxt = (
            m.alias("a")
            .join(
                m.select(
                    F.col("src").alias("_t"),
                    F.col("final").alias("_tf"),
                    F.col("n_hops").alias("_th"),
                ).alias("b"),
                F.col("a.final") == F.col("_t"),
                "left",
            )
            .select(
                "src",
                F.when(F.col("done") | F.col("_t").isNull(), F.col("final"))
                .otherwise(F.col("_tf"))
                .alias("final"),
                F.when(F.col("done") | F.col("_t").isNull(), F.col("n_hops"))
                .otherwise(F.col("n_hops") + F.col("_th"))
                .alias("n_hops"),
                (F.col("done") | F.col("_t").isNull()).alias("done"),
            )
        )
        # cut lineage each round (iterative-join discipline: the plan
        # would otherwise double per round) and stop when all resolved
        nxt = nxt.localCheckpoint(eager=True)
        m = nxt
        if nxt.filter(~F.col("done")).limit(1).count() == 0:
            break

    return m.select(
        "src",
        "final",
        "n_hops",
        F.col("done").alias("resolved"),
    )
