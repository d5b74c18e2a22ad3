"""Streaming data-quality monitor (streaming/monitor.py): counters and
fingerprint registers emitted by the watermarked stream must equal the
batch twin over the same non-late rows; the read-time report folds
both into rates with an explicitly-estimated dup rate."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gush_spark.sources.fixtures import generate_pages
from gush_spark.streaming.monitor import (
    quality_monitor_report,
    windowed_fingerprint_registers,
    windowed_quality_counters,
)
from gush_spark.streaming.pipeline import extracted_pages
from gush_spark.streaming.source import read_pages_batch, read_pages_stream


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_monitor")
    generate_pages(d, n_pages=600, n_hosts=40, seed=31, rows_per_file=150)
    return str(d)


def _drop_late(df):
    i = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    sched = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp(F.lit("2024-03-01 00:00:00"))) + i * 2
    )
    return df.where(F.col("warc_ts") >= sched)


_KW = dict(
    ts_col="warc_ts",
    text_col="text",
    window_duration="5 minutes",
    watermark_delay="2 minutes",
)


def test_stream_counters_equal_batch(spark, pages_dir, tmp_dirs):
    stream_in = extracted_pages(
        _drop_late(read_pages_stream(spark, pages_dir, max_files_per_trigger=2))
    )
    q = (
        windowed_quality_counters(stream_in, **_KW)
        .writeStream.format("parquet")
        .option("path", tmp_dirs["sink"])
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(tmp_dirs["sink"]).toPandas()
    assert len(got), "no windows finalized"
    exp = windowed_quality_counters(
        extracted_pages(_drop_late(read_pages_batch(spark, pages_dir))), **_KW
    ).toPandas()
    exp = exp[exp.window_start.isin(set(got.window_start))]
    key = ["window_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )


def test_report_rates_exact_on_batch(spark):
    """Report arithmetic pinned on a hand corpus (batch twins of both
    monitor stages feed the same read-time fold the stream uses)."""
    docs = spark.createDataFrame(
        [
            (100, "dup text"),
            (110, "dup text"),
            (120, "unique one"),
            (130, None),
            (140, "   "),
        ],
        "t long, text string",
    ).withColumn("t", F.timestamp_seconds("t"))
    kw = dict(
        ts_col="t",
        text_col="text",
        window_duration="10 minutes",
        watermark_delay="1 minute",
    )
    counters = windowed_quality_counters(docs, **kw)
    regs = windowed_fingerprint_registers(docs, **kw)
    (row,) = quality_monitor_report(counters, regs).collect()
    assert row["n_rows"] == 5
    assert row["n_null_text"] == 1 and row["null_rate"] == 0.2
    assert row["n_empty"] == 1 and row["empty_rate"] == 0.2
    # 4 non-null texts, 3 distinct contents (exact at this cardinality:
    # HLL linear counting is exact when buckets >> keys)
    assert row["approx_distinct_contents"] == 3
    assert row["dup_rate_est"] == (4 - 3) / 5
    assert row["min_chars"] == 3 and row["max_chars"] == 10


def test_report_clamps_negative_dup_estimate(spark):
    """If the HLL estimate overshoots n_nonnull, the dup rate clamps
    at zero instead of going negative."""
    counters = spark.createDataFrame(
        [("2024-01-01 00:00:00", 10, 0, 0, 10, 100, 10, 10)],
        "window_start string, n_rows long, n_null_text long, n_empty long,"
        " n_nonnull long, sum_chars long, min_chars long, max_chars long",
    ).withColumn("window_start", F.to_timestamp("window_start"))
    # registers implying ~11 distinct > 10 nonnull
    regs = spark.createDataFrame(
        [("2024-01-01 00:00:00", b, 5) for b in range(11)],
        "window_start string, hll_bucket int, m_j int",
    ).withColumn("window_start", F.to_timestamp("window_start"))
    (row,) = quality_monitor_report(counters, regs).collect()
    assert row["dup_rate_est"] == 0.0
