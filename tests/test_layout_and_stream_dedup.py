"""Production layout (days + host-bucket partitioning with provable
pruning) and streaming dedup (bounded-state first-occurrence-wins)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from gush_spark.sources.fixtures import generate_pages
from gush_spark.sources.layout import (
    read_pages_range,
    with_layout_columns,
    write_pages_partitioned,
)
from gush_spark.streaming.source import read_pages_batch, read_pages_stream
from gush_spark.streaming.dedup import dedup_pages_stream, with_fingerprint


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("layout") / "pages"
    generate_pages(d, n_pages=300, n_hosts=10)
    return str(d)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_layout_prunes_dates_and_buckets(spark, pages_dir, tmp_path):
    pages = read_pages_batch(spark, pages_dir).withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )
    out = str(tmp_path / "warehouse")
    write_pages_partitioned(pages, out)

    dates = sorted(
        r["warc_date"]
        for r in spark.read.parquet(out).select("warc_date").distinct().collect()
    )
    assert dates  # layout materialized
    d0 = str(dates[0])

    pruned = read_pages_range(spark, out, start_date=d0, end_date=str(dates[0]))
    # empty range start==end → start<=x<end selects nothing
    assert pruned.count() == 0

    one_day = read_pages_range(
        spark, out, start_date=d0,
        end_date=str(dates[1]) if len(dates) > 1 else None,
    )
    plan = _plan(one_day)
    assert "PartitionFilters" in plan and "warc_date" in plan
    # pruning must not change semantics
    want = pages.filter(F.to_date("warc_ts") == F.lit(d0).cast("date")).count()
    if len(dates) > 1:
        assert one_day.count() == want

    # host lookup prunes to ONE bucket partition + exact host match
    some_host = pages.select("host").first()["host"]
    by_host = read_pages_range(spark, out, host=some_host)
    plan = _plan(by_host)
    assert "host_bucket" in plan.split("PartitionFilters")[-1]
    assert by_host.count() == pages.filter(F.col("host") == some_host).count()


def test_layout_columns_deterministic(spark, pages_dir):
    pages = read_pages_batch(spark, pages_dir).withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    )
    a = with_layout_columns(pages).select("url", "host_bucket").collect()
    b = with_layout_columns(pages).select("url", "host_bucket").collect()
    assert {(r["url"], r["host_bucket"]) for r in a} == {
        (r["url"], r["host_bucket"]) for r in b
    }
    n_b = with_layout_columns(pages).select("host_bucket").distinct().count()
    assert 1 < n_b <= 16


def test_stream_dedup_first_occurrence_wins(spark, tmp_path):
    import datetime as dt

    # two microbatch files; dup fingerprints within and across batches
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [
        ("http://a.example/1", base, None, "same content here", "en", "plain"),
        ("http://a.example/2", base, None, "same content here", "en", "plain"),
        ("http://a.example/3", base, None, "unique one", "en", "plain"),
    ]
    rows2 = [
        ("http://b.example/4", base + dt.timedelta(minutes=1), None,
         "same content here", "en", "plain"),
        ("http://b.example/5", base + dt.timedelta(minutes=1), None,
         "unique two", "en", "plain"),
    ]
    from gush_spark.streaming.source import PAGES_SCHEMA

    src = tmp_path / "pages"
    src.mkdir()
    spark.createDataFrame(rows1, PAGES_SCHEMA).coalesce(1).write.parquet(str(src / "c0"))
    spark.createDataFrame(rows2, PAGES_SCHEMA).coalesce(1).write.parquet(str(src / "c1"))
    # flatten: file stream wants files, not dirs — move parquet files up
    import shutil

    import os
    import time

    files = sorted(src.rglob("*.parquet"))
    now = time.time()
    for i, f in enumerate(files):
        dst = src / f"part-{i}.parquet"
        shutil.copy(f, dst)
        # the file source orders new files by mtime: pin strictly
        # ascending mtimes so chunk replay order is deterministic
        os.utime(dst, (now + i, now + i))
        shutil.rmtree(f.parent)

    stream = read_pages_stream(spark, str(src), max_files_per_trigger=1)
    deduped = dedup_pages_stream(stream, watermark_delay="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("stream_dedup_out").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["same content here", "unique one", "unique two"]
    # the batch fallback agrees on the fingerprint definition
    batch = spark.createDataFrame(rows1 + rows2, PAGES_SCHEMA)
    assert (
        with_fingerprint(batch).select("fingerprint").distinct().count() == 3
    )
    assert dedup_pages_stream(batch).count() == 3
