"""Streaming windowed HLL: stream ≡ batch bit-equality, bounded emits.

The deterministic sketch makes the strongest possible streaming check
available: the registers a watermarked streaming aggregation emits
must be EXACTLY the registers of the batch sketch over the same
(non-late) rows — not approximately, bit-for-bit.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gush_spark.operators.sketches import finalize_registers
from gush_spark.sources.fixtures import generate_pages
from gush_spark.streaming.sketches import windowed_hll_registers
from gush_spark.streaming.source import read_pages_batch, read_pages_stream


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_hll")
    generate_pages(d, n_pages=600, n_hosts=40, seed=23, rows_per_file=150)
    return str(d)


def _kwargs():
    # fixture pages tick 2 s apart (~20 min span): 5-minute windows
    # close under a 2-minute watermark before the stream drains.
    return dict(
        ts_col="warc_ts",
        key=F.col("url"),
        window_duration="5 minutes",
        watermark_delay="2 minutes",
        group_cols=(),
    )


def _drop_late(df):
    """Remove the fixture's ~3% deliberately-late rows (30-120 min
    behind schedule) so the remaining jitter (≤1.5 s) is inside the
    watermark and the stream provably drops nothing — making exact
    stream≡batch register equality well-defined. Page i's scheduled
    time is EPOCH0 + 2i s, recoverable from the url."""
    i = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    sched = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp(F.lit("2024-03-01 00:00:00"))) + i * 2
    )
    return df.where(F.col("warc_ts") >= sched)


def test_stream_registers_equal_batch(spark, pages_dir, tmp_dirs):
    regs_stream = windowed_hll_registers(
        _drop_late(read_pages_stream(spark, pages_dir, max_files_per_trigger=2)),
        **_kwargs(),
    )
    q = (
        regs_stream.writeStream.format("parquet")
        .option("path", tmp_dirs["sink"])
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(tmp_dirs["sink"])
    exp = windowed_hll_registers(_drop_late(read_pages_batch(spark, pages_dir)), **_kwargs())

    key = ["window_start", "hll_bucket"]
    g = got.toPandas().sort_values(key).reset_index(drop=True)
    e = exp.toPandas().sort_values(key).reset_index(drop=True)
    # append mode withholds windows the watermark hasn't closed; every
    # window that WAS finalized must match the batch registers exactly.
    closed = set(g.window_start)
    assert closed, "no windows finalized"
    e = e[e.window_start.isin(closed)].reset_index(drop=True)
    pd.testing.assert_frame_equal(g[key + ["m_j"]], e[key + ["m_j"]])

    # emitted volume is bounded by m per window — the scale contract.
    per_window = g.groupby("window_start").size()
    assert (per_window <= 256).all()

    # finalize at read time and sanity-check against the exact count.
    est = finalize_registers(got, ["window_start"], out="approx_urls").toPandas()
    exact = (
        _drop_late(read_pages_batch(spark, pages_dir))
        .groupBy(F.window("warc_ts", "5 minutes").alias("w"))
        .agg(F.countDistinct("url").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .toPandas()
    )
    j = est.merge(exact, on="window_start")
    assert len(j) == len(est)
    rel = (j.approx_urls - j.n).abs() / j.n
    assert (rel < 0.30).all(), j  # 4.6 sigma at m=256


def test_stream_cms_counters_equal_batch_and_find_hot_hosts(spark, pages_dir, tmp_dirs):
    from gush_spark.operators.sketches import cms_estimate
    from gush_spark.streaming.sketches import windowed_cms_counters

    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    kwargs = dict(
        ts_col="warc_ts",
        key=host,
        window_duration="5 minutes",
        watermark_delay="2 minutes",
    )
    stream = windowed_cms_counters(
        _drop_late(read_pages_stream(spark, pages_dir, max_files_per_trigger=2)),
        **kwargs,
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", tmp_dirs["sink"])
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(tmp_dirs["sink"])
    batch_pages = _drop_late(read_pages_batch(spark, pages_dir))
    exp = windowed_cms_counters(batch_pages, **kwargs)

    key = ["window_start", "r", "b"]
    g = got.toPandas().sort_values(key).reset_index(drop=True)
    closed = set(g.window_start)
    assert closed, "no windows finalized"
    e = exp.toPandas()
    e = e[e.window_start.isin(closed)].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[key + ["c"]], e[key + ["c"]])

    # hot-host detection from one window's counters: estimates bound
    # the exact per-host counts from above (CMS never underestimates).
    w0 = sorted(closed)[0]
    slice0 = got.where(F.col("window_start") == w0).select("r", "b", "c")
    hosts = batch_pages.select(host.alias("host")).distinct()
    est = cms_estimate(slice0, hosts, "host", out="est_n")
    exact = (
        batch_pages.where(
            F.window("warc_ts", "5 minutes")["start"] == w0
        )
        .groupBy(host.alias("host"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = est.join(exact, "host").collect()
    assert j
    assert all(r.est_n >= r.n for r in j)
    # the zipf-hot host is detected as the max estimate too.
    top_est = max(j, key=lambda r: (r.est_n, r.host)).host
    top_exact = max(j, key=lambda r: (r.n, r.host)).host
    assert top_est == top_exact


def test_stream_histogram_bins_equal_batch(spark, pages_dir, tmp_dirs):
    from gush_spark.streaming.sketches import windowed_histogram_bins

    value = F.length("html").cast("double")
    kwargs = dict(
        ts_col="warc_ts",
        value=value,
        width=64.0,
        window_duration="5 minutes",
        watermark_delay="2 minutes",
    )
    stream = windowed_histogram_bins(
        _drop_late(read_pages_stream(spark, pages_dir, max_files_per_trigger=2)),
        **kwargs,
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", tmp_dirs["sink"])
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(tmp_dirs["sink"])
    exp = windowed_histogram_bins(
        _drop_late(read_pages_batch(spark, pages_dir)), **kwargs
    )
    key = ["window_start", "bin"]
    g = got.toPandas().sort_values(key).reset_index(drop=True)
    closed = set(g.window_start)
    assert closed, "no windows finalized"
    e = exp.toPandas()
    e = e[e.window_start.isin(closed)].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[key + ["c"]], e[key + ["c"]])

    # read-time quantile walk over one window's bins brackets the
    # exact median of that window within one bin width.
    w0 = sorted(closed)[0]
    bins0 = g[g.window_start == w0]
    cum = bins0.sort_values("bin").c.cumsum()
    n = bins0.c.sum()
    med_bin = bins0.sort_values("bin").bin[cum >= -(-n // 2)].iloc[0]
    exact_med = (
        _drop_late(read_pages_batch(spark, pages_dir))
        .where(F.window("warc_ts", "5 minutes")["start"] == w0)
        .select(F.percentile(value, F.lit(0.5)).alias("m"))
        .first()["m"]
    )
    assert abs((med_bin * 64.0 + 32.0) - exact_med) <= 64.0


def test_stream_hll_through_exactly_once_sink_resume(spark, tmp_path):
    """Integration with the north-rule sink: windowed HLL registers
    written through IdempotentKeyedSink keyed by (window_start,
    hll_bucket); an interrupted run resumed from its checkpoint must
    produce exactly the registers of an uninterrupted run — sketches
    compose with the exactly-once machinery like every other operator.
    """
    import os
    import shutil

    from gush_spark.sources.fixtures import generate_pages
    from gush_spark.streaming.sink import IdempotentKeyedSink

    src = tmp_path / "src"
    generate_pages(src, n_pages=600, n_hosts=30, seed=7, rows_per_file=150)
    files = sorted(os.listdir(src))
    assert len(files) == 4

    def run(pages_dir, sink_path, ckpt):
        regs = windowed_hll_registers(
            _drop_late(read_pages_stream(spark, str(pages_dir), max_files_per_trigger=1)),
            **_kwargs(),
        )
        sink = IdempotentKeyedSink(sink_path, keys=["window_start", "hll_bucket"])
        q = (
            regs.writeStream.foreachBatch(
                lambda df, bid: sink.write_batch(df, bid)
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(180)
        return sink

    def stage(dst, names, t0):
        dst.mkdir(exist_ok=True)
        for i, n in enumerate(names):
            shutil.copy(src / n, dst / n)
            os.utime(dst / n, (t0 + i, t0 + i))  # pin file order = mtime

    full_dir = tmp_path / "full"
    stage(full_dir, files, 1_000_000)
    full_sink = run(full_dir, tmp_path / "full_sink", tmp_path / "full_ckpt")
    expected = full_sink.read_all_appends(spark).toPandas()
    assert len(expected), "no registers emitted"

    part_dir = tmp_path / "part"
    stage(part_dir, files[:2], 1_000_000)
    sink1 = run(part_dir, tmp_path / "r_sink", tmp_path / "r_ckpt")
    n_first = sink1.read_all_appends(spark).count()
    assert n_first < len(expected)

    stage(part_dir, files[2:], 1_000_100)  # later mtimes: appended files
    sink2 = run(part_dir, tmp_path / "r_sink", tmp_path / "r_ckpt")
    resumed = sink2.read_all_appends(spark).toPandas()

    key = ["window_start", "hll_bucket"]
    exp = expected.sort_values(key).reset_index(drop=True)
    got = resumed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(exp[key + ["m_j"]], got[key + ["m_j"]])
