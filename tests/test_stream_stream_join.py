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


def test_left_outer_emits_null_padded_unmatched_crawls(spark, tmp_path, tmp_dirs):
    """Left-outer stream-stream join: a crawl with no follow-up within
    the horizon emits one null-padded row once the watermark passes its
    expiry. Two far-future sentinel chunks push the watermark beyond
    every real crawl's horizon so all outer rows flush."""
    from gush_spark.sources.fixtures import _ev

    # sentinels on BOTH event types: the join's watermark is the MIN of
    # the two inputs' watermarks, and each input filters one event_type —
    # a crawl-only sentinel would leave the follows side stalled
    events = canonical_event_sequences() + [
        _ev(95, "https://flush-a.example/zz", 100_000, "crawl"),
        _ev(96, "https://flush-b.example/zz", 100_001, "drop"),
        _ev(97, "https://flush-a.example/zz2", 200_000, "crawl"),
        _ev(98, "https://flush-b.example/zz2", 200_001, "drop"),
    ]
    d = tmp_path / "events_outer"
    # 14 events over 7 chunks keeps the two sentinel pairs as the LAST
    # two microbatches: the first advances the watermark past every real
    # expiry, the second triggers the eviction pass that emits outer rows
    generate_page_events(d, events, n_chunks=7)

    crawls_s = read_page_events_stream(spark, str(d)).filter(
        F.col("event_type") == "crawl"
    )
    follows_s = read_page_events_stream(spark, str(d)).filter(
        F.col("event_type").isin("recrawl", "drop")
    )
    joined = join_events_within(
        crawls_s,
        follows_s,
        within="2 hours",
        watermark_delay="10 minutes",
        how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_outer_out")
        .outputMode("append")
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("ss_outer_out").collect()

    matched = {
        (r["crawl_event_id"], r["follow_event_id"])
        for r in out
        if r["follow_event_id"] is not None
    }
    unmatched = {r["crawl_event_id"] for r in out if r["follow_event_id"] is None}

    # batch reference: left outer range join over the same events
    ev = read_page_events_batch(spark, str(d))
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
    ref = c.join(
        f,
        (F.col("c_url") == F.col("f_url"))
        & (F.col("f_ts") > F.col("c_ts"))
        & (F.col("f_ts") <= F.col("c_ts") + F.expr("INTERVAL 2 HOURS")),
        "left",
    ).collect()
    want_matched = {(r["c_id"], r["f_id"]) for r in ref if r["f_id"] is not None}
    # the stream legitimately diverges from the batch reference on two
    # rows: event 8 (the known-late crawl) is dropped by the watermark
    # before it ever enters join state, and sentinel 97's horizon is
    # never crossed (sentinel 95's IS — the second sentinel pair pushes
    # the watermark past it)
    want_unmatched = {
        r["c_id"] for r in ref if r["f_id"] is None and r["c_id"] not in (8, 97)
    }

    assert matched == want_matched
    assert unmatched == want_unmatched, (
        f"stream outer rows {unmatched} != batch reference {want_unmatched}"
    )
