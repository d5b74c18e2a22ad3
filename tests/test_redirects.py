"""Redirect-chain resolution: exact hop counts on straight chains,
terminal detection, cycle/self-loop trap marking, and the doubling
property (a chain of length L resolves within ceil(log2(L))+1 rounds).
"""

from __future__ import annotations

from gush_spark.operators.redirects import resolve_chains


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_chains_terminals_and_hops(spark):
    edges = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"),  # 3-chain → d
         ("p", "q"),                            # 1-hop → q
         ("x", "y"), ("y", "x"),               # 2-cycle
         ("s", "s")],                            # self-loop
    )
    got = {r.src: (r.final, r.n_hops, r.resolved)
           for r in resolve_chains(edges, max_rounds=6).collect()}
    assert got["a"] == ("d", 3, True)
    assert got["b"] == ("d", 2, True)
    assert got["c"] == ("d", 1, True)
    assert got["p"] == ("q", 1, True)
    # traps: never resolve, flagged not dropped (errors are data)
    assert got["x"][2] is False and got["y"][2] is False
    assert got["s"][2] is False


def test_doubling_resolves_long_chain_in_log_rounds(spark):
    # chain of 64 hops: u0 → u1 → ... → u64; 64 ≤ 2^6 wants ~7 rounds
    edges = _edges(spark, [(f"u{i}", f"u{i+1}") for i in range(64)])
    got = {r.src: (r.final, r.n_hops, r.resolved)
           for r in resolve_chains(edges, max_rounds=8).collect()}
    assert got["u0"] == ("u64", 64, True)
    assert got["u32"] == ("u64", 32, True)
    assert all(v[2] for v in got.values())
