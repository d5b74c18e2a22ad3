"""enrich_with_dim broadcast size gate: a dim under the broadcast
budget gets the explicit broadcast hint; an over-budget (or
broadcast-disabled, threshold -1) dim falls back to a shuffled hash
join — never a driver-side collect of a 10^9-row "dimension" and never
a sort-merge demotion."""

from __future__ import annotations

from gush_spark.operators.joins import _parse_byte_size, enrich_with_dim


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_dim_is_broadcast(spark):
    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(10).withColumnRenamed("id", "k")
    p = _plan(enrich_with_dim(fact, dim, "k"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_oversize_dim_falls_back_to_shuffled_hash(spark):
    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(10).withColumnRenamed("id", "k")
    p = _plan(enrich_with_dim(fact, dim, "k", broadcast_threshold=1))
    assert "BroadcastHashJoin" not in p
    assert "ShuffledHashJoin" in p


def test_disabled_broadcast_threshold_never_broadcasts(spark):
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.range(5).withColumnRenamed("id", "k")
    p = _plan(enrich_with_dim(fact, dim, "k", broadcast_threshold=-1))
    assert "BroadcastHashJoin" not in p


def test_parse_byte_size_units():
    assert _parse_byte_size("10485760") == 10 * 1024**2
    assert _parse_byte_size("10MB") == 10 * 1024**2
    assert _parse_byte_size("1g") == 1024**3
    assert _parse_byte_size("512k") == 512 * 1024
    assert _parse_byte_size("-1") == -1
