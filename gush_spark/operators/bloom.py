"""Mergeable Bloom filter — the set-membership sketch that completes
the sketch kit (sketches.py: HLL distinct / CMS frequency / histogram
quantiles; here: membership).

Why a 100 TB engine needs it: the decontamination gate
(operators/decontaminate.py) broadcasts the benchmark key set as 16-byte
md5s — fine for a benchmark suite (~10^6 n-grams ≈ 16 MB), but the same
gate run against "everything already in the corpus index" (10^12 keys)
cannot broadcast exact keys. A Bloom bitmap at ~10 bits/key with k=3
gives ~2-3% false positives in ~1.2 GB per 10^9 keys — and false
positives are SAFE here (a handful of clean pages re-verified or
over-dropped), while false negatives never happen, which is exactly the
guarantee a contamination/membership pre-filter needs.

Scale design:
- the BUILD is one ``posexplode(k positions)`` + ``bit_or`` hash
  aggregate on ``word_idx`` — map-side combinable, output exactly
  ``m_bits/63`` rows regardless of input volume (the HLL-register
  argument applied to membership);
- bitmaps MERGE by ``bit_or`` on word_idx (union semantics) — daily
  increments fold into the historical filter without touching raw keys;
- the PROBE broadcasts the bitmap (m/8 bytes, millions of times smaller
  than the key set) and is a map-only pass over the probed side:
  zero corpus exchange, same shape as decontaminate.bench_broadcast.

Oracle-exactness: positions are md5-derived (``md5(key || ':' || i)``
first 15 hex digits → int64 → mod m_bits) — byte-identical in Spark and
DuckDB, per the repo hashing conventions (functions/text_analysis.py).
Everything below is pure JVM column expressions; no Python anywhere.

The reference has no sketch analog (gush counts rows into StatsD,
gush/streams/Sink.scala); this follows the driver brief's
training-data-pipeline mandate like sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16  # default bitmap size: 65536 bits = 1024 longs
BLOOM_K = 3  # hash functions


def _position(key: Column, i: Column, m_bits: int) -> Column:
    """The i-th bit position of ``key``: first 15 hex digits of
    ``md5(key || ':' || i)`` as int64 (never negative), mod m_bits —
    reproducible bit-for-bit by DuckDB's md5."""
    h = F.md5(F.concat(key, F.lit(":"), i.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(m_bits)
    )


def bloom_build(
    df: DataFrame, key_col: str, k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS
) -> DataFrame:
    """Build the bitmap: (word_idx, word, m_bits, k) rows, one per word
    with at least one bit set. Words pack 63 bits per long — the sign
    bit stays clear so DuckDB's CHECKED left-shift (which errors on
    1 << 63) can replicate the bitmap bit-for-bit for the oracle.
    ≤ m_bits/63 rows total — broadcastable — and the agg is map-side
    combinable (bit_or is associative and commutative, so partial
    bitmaps merge like HLL registers).

    The build PARAMETERS travel WITH the bitmap (constant ``m_bits``
    and ``k`` columns): a probe against a bitmap built with different
    parameters would produce silent FALSE NEGATIVES (wrong words, wrong
    bits — the one failure a Bloom gate must never have), so
    ``bloom_probe`` reads the parameters from the bitmap itself and a
    round-tripped parquet bitmap (job.py --bench-bloom) stays
    self-describing."""
    pos = _position(F.col(key_col), F.col("_i"), m_bits)
    return (
        df.select(F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_i"),
                  F.col(key_col))
        .select(pos.alias("_pos"))
        .select(
            F.floor(F.col("_pos") / 63).cast("long").alias("word_idx"),
            # F.shiftleft takes a literal shift count; the SQL form
            # accepts a column
            F.expr("shiftleft(cast(1 as bigint), cast(_pos % 63 as int))")
            .alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
        .select(
            "word_idx", "word",
            F.lit(m_bits).cast("long").alias("m_bits"),
            F.lit(k).cast("long").alias("k"),
        )
    )


def bitmap_params(bitmap: DataFrame) -> tuple[int, int]:
    """Read (m_bits, k) off a self-describing bitmap; raises if the
    frame carries mixed parameters (e.g. two incompatible bitmaps
    unioned) or lacks the parameter columns (not a bloom_build
    output).

    The read is a (tiny: ≤3-row) Spark job, so the result is memoized
    on the DataFrame object — a streaming gate probing the same bitmap
    every microbatch (pipeline.curation_pipeline's foreachBatch) pays
    the job once, not once per batch. Safe because DataFrames are
    immutable: the object's parameter columns can never change."""
    cached = getattr(bitmap, "_gush_bloom_params", None)
    if cached is not None:
        return cached
    if "m_bits" not in bitmap.columns or "k" not in bitmap.columns:
        raise ValueError(
            "bitmap lacks m_bits/k columns — not a bloom_build output"
        )
    rows = bitmap.select("m_bits", "k").distinct().limit(3).collect()
    if len(rows) != 1:
        raise ValueError(
            f"bitmap carries {len(rows)} distinct (m_bits, k) parameter "
            "pairs — refusing to probe (mismatched bitmaps would produce "
            "silent false negatives)"
        )
    params = int(rows[0]["m_bits"]), int(rows[0]["k"])
    bitmap._gush_bloom_params = params
    return params


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union semantics: bit_or the two bitmaps word-by-word. Bloom(A) ∪
    Bloom(B) == Bloom(A ∪ B) exactly (same hashes, same m) — the
    property that lets a daily increment fold into the historical
    filter without re-reading history (pinned by test). Grouping
    includes the parameter columns, so merging bitmaps built with
    DIFFERENT parameters yields duplicate word_idx groups that
    ``bitmap_params`` rejects at the next probe instead of silently
    corrupting membership."""
    return (
        a.unionByName(b)
        .groupBy("word_idx", "m_bits", "k")
        .agg(F.bit_or("word").alias("word"))
        .select("word_idx", "word", "m_bits", "k")
    )


def bloom_probe(
    bitmap: DataFrame,
    probes: DataFrame,
    key_col: str,
    k: int | None = None,
    m_bits: int | None = None,
) -> DataFrame:
    """Append ``bloom_contains`` to ``probes``: true iff all k bits are
    set. No false negatives ever; false-positive rate ≈ (1-e^{-kn/m})^k.

    The probe parameters come FROM THE BITMAP (``bitmap_params``);
    passing ``k``/``m_bits`` explicitly is allowed only as an assertion
    — a mismatch with the bitmap's own parameters raises instead of
    probing the wrong bits (which would silently void the
    no-false-negative guarantee).

    Plan shape: the k positions explode from the probe side, join the
    BROADCAST bitmap on word_idx (≤ m/63 rows), and a groupBy on the
    probe key checks every bit landed — the probed corpus shuffles only
    its own (key, word_idx) pairs, never text, and the bitmap never
    shuffles at all."""
    bm_m, bm_k = bitmap_params(bitmap)
    if m_bits is not None and m_bits != bm_m:
        raise ValueError(f"m_bits={m_bits} != bitmap's m_bits={bm_m}")
    if k is not None and k != bm_k:
        raise ValueError(f"k={k} != bitmap's k={bm_k}")
    m_bits, k = bm_m, bm_k
    bitmap = bitmap.select("word_idx", "word")
    pos = _position(F.col(key_col), F.col("_i"), m_bits)
    exploded = (
        probes.select(F.col(key_col)).distinct()
        .select(F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_i"),
                F.col(key_col))
        .select(F.col(key_col), pos.alias("_pos"))  # bind the md5 once
        .select(
            F.col(key_col),
            F.floor(F.col("_pos") / 63).cast("long").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(_pos % 63 as int))")
            .alias("_mask"),
        )
    )
    hit = (
        exploded.join(F.broadcast(bitmap), on="word_idx", how="left")
        .select(
            key_col,
            (
                F.coalesce(F.col("word"), F.lit(0).cast("long"))
                .bitwiseAND(F.col("_mask"))
                == F.col("_mask")
            ).alias("_bit_set"),
        )
        .groupBy(key_col)
        .agg(F.min(F.col("_bit_set").cast("int")).cast("boolean").alias("bloom_contains"))
    )
    return probes.join(hit, on=key_col, how="left")
