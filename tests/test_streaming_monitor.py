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


def test_stream_histogram_equals_batch_and_drift_math(spark, pages_dir, tmp_dirs):
    """The windowed length histogram emitted by the watermarked stream
    equals the batch twin over the same non-late rows, and the
    read-time drift report matches a hand-computed L1 on consecutive
    windows (first window emits nothing — no baseline)."""
    from gush_spark.operators.snapshot import DRIFT_SCALE
    from gush_spark.streaming.monitor import (
        drift_monitor_report,
        windowed_length_histogram,
    )

    kw = dict(_KW, text_col="extracted_text")
    stream_in = extracted_pages(
        _drop_late(read_pages_stream(spark, pages_dir, max_files_per_trigger=2))
    )
    q = (
        windowed_length_histogram(stream_in, **kw)
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
    exp = windowed_length_histogram(
        extracted_pages(_drop_late(read_pages_batch(spark, pages_dir))), **kw
    ).toPandas()
    exp = exp[exp.window_start.isin(set(got.window_start))]
    key = ["window_start", "bucket"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )

    # drift math on the emitted histogram rows, vs pure-python L1
    hist = spark.read.parquet(tmp_dirs["sink"])
    rep = drift_monitor_report(hist, window_seconds=300).toPandas()
    by_w = {}
    for r in got.itertuples():
        by_w.setdefault(r.window_start, {})[r.bucket] = r.n
    wins = sorted(by_w)
    expect = {}
    for prev_w, cur_w in zip(wins, wins[1:]):
        if (cur_w - prev_w).total_seconds() != 300:
            continue
        p, c = by_w[prev_w], by_w[cur_w]
        tp, tc = sum(p.values()), sum(c.values())
        drift = sum(
            abs(
                (p.get(b, 0) * DRIFT_SCALE) // tp
                - (c.get(b, 0) * DRIFT_SCALE) // tc
            )
            for b in set(p) | set(c)
        )
        expect[cur_w] = (tp, tc, drift)
    assert len(rep), "no drift rows (need >= 2 consecutive windows)"
    got_map = {
        r.window_start: (r.n_prev, r.n_cur, r.drift_x1e9)
        for r in rep.itertuples()
    }
    assert got_map == expect
    assert wins[0] not in got_map  # first window has no baseline
