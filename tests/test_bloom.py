"""Bloom membership sketch (operators/bloom.py): no false negatives
ever, bounded false positives, exact bit_or mergeability, and the
broadcast probe plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from gush_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)


def _keys(spark, lo, hi, tag="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"{tag}:"), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives_and_bounded_false_positives(spark):
    members = _keys(spark, 0, 500)
    bitmap = bloom_build(members, "key")
    probes = members.withColumn("is_member", F.lit(True)).unionByName(
        _keys(spark, 0, 500, tag="absent").withColumn("is_member", F.lit(False))
    )
    got = bloom_probe(bitmap, probes, "key").collect()
    assert all(r["bloom_contains"] for r in got if r["is_member"]), \
        "a Bloom filter must NEVER produce a false negative"
    fps = sum(1 for r in got if not r["is_member"] and r["bloom_contains"])
    # m=65536, k=3, n=500 -> per-probe FP ~1e-5; input is deterministic
    assert fps <= 2, f"false-positive count {fps} far above the m/k/n expectation"


def test_small_bitmap_actually_false_positives(spark):
    """Sanity that the FP path is real (not everything-false): squeeze
    m until collisions are forced, FNs must STILL be impossible."""
    members = _keys(spark, 0, 300)
    bitmap = bloom_build(members, "key", m_bits=256)
    probes = members.withColumn("is_member", F.lit(True)).unionByName(
        _keys(spark, 0, 300, tag="absent").withColumn("is_member", F.lit(False))
    )
    got = bloom_probe(bitmap, probes, "key", m_bits=256).collect()
    assert all(r["bloom_contains"] for r in got if r["is_member"])
    fps = sum(1 for r in got if not r["is_member"] and r["bloom_contains"])
    assert fps > 0, "256 bits for 300 keys must saturate into false positives"


def test_merge_equals_build_on_union(spark):
    a, b = _keys(spark, 0, 200), _keys(spark, 150, 400)
    merged = {(r["word_idx"], r["word"]) for r in
              bloom_merge(bloom_build(a, "key"), bloom_build(b, "key")).collect()}
    direct = {(r["word_idx"], r["word"]) for r in
              bloom_build(a.unionByName(b), "key").collect()}
    assert merged == direct


def test_probe_broadcasts_bitmap(spark):
    members = _keys(spark, 0, 100)
    out = bloom_probe(bloom_build(members, "key"), members, "key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_overlap_upper_bounds_exact_overlap(spark):
    """The bloom-served decontamination gate can only OVER-estimate:
    per doc, n_matched_bloom >= n_matched_exact, and every doc the
    exact gate flags is flagged by the bloom gate too (no benchmark
    page can leak through a bloom false positive)."""
    from gush_spark.operators.decontaminate import (
        benchmark_bloom_bitmap,
        ngram_overlap,
        ngram_overlap_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    exact = {r["doc_id"]: r for r in
             ngram_overlap(docs, bench, "doc_id", "text").collect()}
    bitmap = benchmark_bloom_bitmap(bench, "text")
    bloomed = {r["doc_id"]: r for r in
               ngram_overlap_bloom(docs, bitmap, "doc_id", "text").collect()}
    assert set(exact) == set(bloomed)
    for i, e in exact.items():
        b = bloomed[i]
        assert b["n_shingles"] == e["n_shingles"]
        assert b["n_matched"] >= e["n_matched"], "bloom must never under-count"
        if e["contaminated"]:
            assert b["contaminated"], "exact-flagged doc slipped the bloom gate"
    # at the default m the gate decisions should actually coincide here
    assert all(bloomed[i]["contaminated"] == e["contaminated"]
               for i, e in exact.items())


def test_probe_parameters_come_from_the_bitmap(spark):
    """The failure a Bloom gate must never have is a silent false
    negative from probing with the wrong parameters: the bitmap is
    self-describing, a probe against a non-default bitmap needs no
    arguments to be correct, explicit mismatching arguments raise, and
    a merge of incompatible bitmaps is rejected at the next probe."""
    import pytest as _pytest

    members = _keys(spark, 0, 300)
    big = bloom_build(members, "key", m_bits=1 << 20)
    got = {r["key"]: r["bloom_contains"]
           for r in bloom_probe(big, members, "key").collect()}
    assert all(got.values()), "self-configured probe must see every member"
    with _pytest.raises(ValueError, match="m_bits"):
        bloom_probe(big, members, "key", m_bits=65536)
    with _pytest.raises(ValueError, match="k="):
        bloom_probe(big, members, "key", k=5)
    mixed = bloom_merge(big, bloom_build(members, "key", m_bits=256))
    with _pytest.raises(ValueError, match="distinct"):
        bloom_probe(mixed, members, "key")
    with _pytest.raises(ValueError, match="bloom_build"):
        bloom_probe(members.withColumnRenamed("key", "word_idx"), members, "key")
