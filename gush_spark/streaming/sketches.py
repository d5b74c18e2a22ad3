"""Streaming windowed sketches — approximate distinct per event-time
window, as ONE append-mode streaming aggregation.

Exact ``COUNT(DISTINCT key)`` per window is the classic streaming
non-starter: the state is the key set itself (unbounded per window),
and Spark refuses cascaded streaming aggregations that a
distinct-then-count would need. The HLL register formulation
(operators/sketches.py) collapses both problems:

- state per (window, bucket) is ONE small integer (``max(rho)`` is an
  associative aggregate Spark can run partial/final inside a single
  streaming agg with watermark state eviction);
- the stream EMITS registers — at most ``m`` rows per finalized
  window, regardless of input volume — and the estimate is computed by
  :func:`gush_spark.operators.sketches.finalize_registers` at read
  time. Storing registers (not estimates) in the sink also means late
  re-emits or resumed runs merge by ``max`` without double counting.

Because the sketch is deterministic (md5-derived), the streamed
registers are BIT-EQUAL to the batch sketch over the same
non-late rows — asserted in tests/test_streaming_sketches.py, the
same stream≡batch contract every other operator here follows
(reference analog: gush's windowed insert counters,
src/main/scala/io/simao/gush/cep/Cep.scala:29-35, which are exact and
single-node; this is their unbounded-cardinality replacement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gush_spark.operators.sketches import hll_bucket_rho


def windowed_hll_registers(
    df: DataFrame,
    *,
    ts_col: str,
    key: Column,
    window_duration: str,
    watermark_delay: str,
    group_cols: tuple[str, ...] = (),
    m_bits: int = 8,
) -> DataFrame:
    """Register rows per (window, group, bucket) — streaming or batch.

    On a streaming ``df`` this is a single watermarked aggregation:
    append mode emits each window's registers once the watermark
    passes, and the state store holds ≤ m integers per open
    (window, group). On a batch ``df`` (no watermark needed) the same
    plan computes the batch twin used by the equivalence test.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    bucket, rho = hll_bucket_rho(key, m_bits=m_bits)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            *group_cols,
            bucket,
        )
        .agg(F.max(rho).alias("m_j"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "hll_bucket",
            "m_j",
        )
    )
