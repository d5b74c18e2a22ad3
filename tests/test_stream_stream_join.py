"""Stream-stream join: two live streams over the same replayable
source, joined on url + event-time bounds, must equal the equivalent
batch range join (and drop nothing when nothing is late)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.sources.fixtures import canonical_event_sequences, generate_page_events
from gush_spark.streaming.joins import join_events_within
from gush_spark.streaming.source import read_page_events_batch, read_page_events_stream


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events"
    generate_page_events(d, canonical_event_sequences(), n_chunks=3)
    return str(d)


def test_stream_stream_join_equals_batch_range_join(spark, events_dir, tmp_dirs):
    crawls_s = read_page_events_stream(spark, events_dir).filter(
        F.col("event_type") == "crawl"
    )
    follows_s = read_page_events_stream(spark, events_dir).filter(
        F.col("event_type").isin("recrawl", "drop")
    )
    joined = join_events_within(
        crawls_s, follows_s, within="2 hours", watermark_delay="10 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["crawl_event_id"], r["follow_event_id"])
        for r in spark.table("ss_join_out").collect()
    }

    ev = read_page_events_batch(spark, events_dir)
    c = ev.filter(F.col("event_type") == "crawl").select(
        F.col("url").alias("c_url"),
        F.col("event_id").alias("c_id"),
        F.col("warc_ts").cast("timestamp").alias("c_ts"),
    )
    f = ev.filter(F.col("event_type").isin("recrawl", "drop")).select(
        F.col("url").alias("f_url"),
        F.col("event_id").alias("f_id"),
        F.col("warc_ts").cast("timestamp").alias("f_ts"),
    )
    want = {
        (r["c_id"], r["f_id"])
        for r in c.join(
            f,
            (F.col("c_url") == F.col("f_url"))
            & (F.col("f_ts") > F.col("c_ts"))
            & (F.col("f_ts") <= F.col("c_ts") + F.expr("INTERVAL 2 HOURS")),
        ).collect()
    }
    # the stream may lose pairs whose crawl-side state was evicted by the
    # watermark before the follow arrived; the canonical fixtures keep
    # everything inside the horizon except the known-late event 8
    assert got
    assert got.issubset(want)
    missing = want - got
    assert all(8 in pair for pair in missing), f"unexpected loss: {missing}"
