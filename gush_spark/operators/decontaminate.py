"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set, the step every LLM data pipeline runs before
training so eval questions don't leak into the training corpus.

Semantics (the standard n-gram-overlap rule): a document is
contaminated when ≥ ``threshold`` of its distinct word k-shingles also
appear anywhere in the benchmark set. Reported per doc: shingle count,
matched count, overlap fraction, contaminated flag — callers either
filter (``WHERE NOT contaminated``) or keep the score as a feature.

Scale design (100 TB corpus vs a ~10^4..10^6-ngram benchmark):
- The benchmark side is reduced to DISTINCT 16-byte md5 shingle keys
  and **broadcast** — eval sets are small by construction; the corpus
  side never shuffles for the membership test.
- The corpus side is one map-only pass (shingle explode + md5) feeding
  a broadcast LEFT SEMI-shaped join expressed as left join + count so
  matched/total ride ONE map-side-combinable aggregation keyed by
  doc_id. No raw shingle text crosses the wire: the join key is the
  md5 (collisions at 2^-128 — absorbed into the overlap estimate).
- If the benchmark ever outgrew broadcast, the same plan degrades to a
  shuffled semi-join on the 16-byte key; the operator is agnostic.
- For a reference set too big even for that — decontaminating against
  the 10^12-key corpus index itself — ``ngram_overlap_bloom`` probes a
  mergeable Bloom bitmap (operators/bloom.py) instead: bits-per-key
  rather than 16 bytes-per-key in the broadcast, zero false negatives
  (no contaminated page slips through), false positives only ever
  OVER-estimate overlap — the safe direction for a contamination gate.

Reference parity: the reference filters events against config-driven
blacklists (``/root/reference/src/main/scala/io/simao/gush/util/
GushConfig.scala:31-44``, ignored-tables set); this is the same
gate-against-a-small-reference-set shape applied to n-gram content at
web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.operators.dedup import SHINGLE_K, shingles


def _doc_shingle_keys(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, sk) — one row per DISTINCT k-shingle per doc, keyed by md5."""
    return (
        df.select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("s"))
        .select(id_col, F.md5("s").alias("sk"))
    )


def benchmark_ngram_keys(
    bench: DataFrame, text_col: str, k: int = SHINGLE_K
) -> DataFrame:
    """DISTINCT md5 shingle keys of the benchmark set — the small,
    broadcastable side. Deduped BEFORE the join so a shingle repeated
    across benchmark docs can't multiply corpus rows."""
    return (
        bench.select(F.explode(shingles(F.col(text_col), k)).alias("s"))
        .select(F.md5("s").alias("sk"))
        .distinct()
    )


def benchmark_bloom_bitmap(
    bench: DataFrame,
    text_col: str,
    k: int = SHINGLE_K,
    bloom_k: int | None = None,
    m_bits: int | None = None,
) -> DataFrame:
    """Bloom bitmap over the benchmark's distinct shingle keys — the
    reference-set artifact when exact keys are too big to broadcast.
    Maintained incrementally via ``bloom.bloom_merge`` as the reference
    set grows (new benchmark / newly ingested corpus increments)."""
    from gush_spark.operators import bloom

    return bloom.bloom_build(
        benchmark_ngram_keys(bench, text_col, k),
        "sk",
        k=bloom_k if bloom_k is not None else bloom.BLOOM_K,
        m_bits=m_bits if m_bits is not None else bloom.BLOOM_M_BITS,
    )


def ngram_overlap_bloom(
    docs: DataFrame,
    bench_bitmap: DataFrame,
    id_col: str,
    text_col: str,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
    bloom_k: int | None = None,
    m_bits: int | None = None,
) -> DataFrame:
    """``ngram_overlap`` with the membership test served by a broadcast
    Bloom bitmap instead of the exact key set. Same report schema;
    ``n_matched``/``overlap`` are UPPER BOUNDS (bloom false positives
    over-count matches — never under), so ``contaminated`` can only err
    toward dropping a clean page, never toward leaking a benchmark
    page. Probe cost ∝ distinct doc shingles, map-only after the
    m/8-byte bitmap broadcast.

    The bloom parameters are read from the self-describing bitmap
    (bloom.bitmap_params); ``bloom_k``/``m_bits`` are assertions only —
    a mismatch raises rather than probing the wrong bits."""
    from gush_spark.operators import bloom

    doc_sh = _doc_shingle_keys(docs, id_col, text_col, k)
    probed = bloom.bloom_probe(
        bench_bitmap, doc_sh, "sk", k=bloom_k, m_bits=m_bits
    )
    per_doc = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(
            F.sum(F.col("bloom_contains").cast("long")), F.lit(0)
        ).alias("n_matched"),
    )
    ids = docs.select(id_col)
    return (
        ids.join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.coalesce(
                F.col("n_matched") / F.col("n_shingles"), F.lit(0.0)
            ).alias("overlap"),
        )
        .withColumn("contaminated", F.col("overlap") >= F.lit(threshold))
    )


def ngram_overlap(
    docs: DataFrame,
    bench: DataFrame | None,
    id_col: str,
    text_col: str,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
    bench_keys: DataFrame | None = None,
) -> DataFrame:
    """Per-document benchmark-overlap scores.

    Docs with fewer than ``k`` tokens have no shingles and are reported
    with n_shingles=0, overlap 0.0, not contaminated (nothing to match
    on — the exact-dedup/fingerprint layer owns tiny docs).

    Pass either ``bench`` (raw benchmark docs, keys derived here) or a
    precomputed ``bench_keys`` (one ``sk`` column of distinct shingle
    md5s) — the latter lets streaming callers derive the keys ONCE and
    reuse them every microbatch (streaming/pipeline).
    """
    if bench_keys is None:
        if bench is None:
            raise ValueError(
                "ngram_overlap needs either `bench` (raw benchmark docs) "
                "or `bench_keys` (precomputed distinct shingle md5s)"
            )
        bench_keys = benchmark_ngram_keys(bench, text_col, k)
    doc_sh = _doc_shingle_keys(docs, id_col, text_col, k)
    hits = doc_sh.join(
        F.broadcast(bench_keys.withColumn("_hit", F.lit(1))), on="sk", how="left"
    )
    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
    )
    # left join back so shingle-less docs still appear in the report
    ids = docs.select(id_col)
    return (
        ids.join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.coalesce(
                F.col("n_matched") / F.col("n_shingles"), F.lit(0.0)
            ).alias("overlap"),
        )
        .withColumn("contaminated", F.col("overlap") >= F.lit(threshold))
    )
