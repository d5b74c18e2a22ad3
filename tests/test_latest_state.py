"""CDC latest-state materialization (the binlog→current-table view):
stream == batch under ordered AND out-of-order arrival, event-time
beats arrival-time, drops tombstone, kill/resume exactly-once, and
compaction preserves event-time resolution.
"""

from __future__ import annotations

import datetime as dt

from gush_spark.config import GushSparkConfig
from gush_spark.sources.fixtures import EPOCH0, generate_page_events
from gush_spark.streaming.pipeline import (
    batch_latest_state,
    latest_state_pipeline,
    read_page_state,
)

CFG = GushSparkConfig(ignored_hosts=("ignored.example",))


def _ev(eid, url, ts_s, etype):
    return {
        "event_id": eid,
        "url": url,
        "host": url.split("/")[2],
        "warc_ts": EPOCH0 + dt.timedelta(seconds=ts_s),
        "event_type": etype,
        "fields": [],
    }


# u1 crawled then recrawled; u2 crawled then dropped; u3 receives an
# OUT-OF-ORDER batch: its newest event (ts=500) arrives in chunk 2, an
# older correction (ts=100) arrives LAST in chunk 4 — arrival order
# would call the stale row current, event-time must not.
EVENTS = [
    _ev(1, "https://a.example/u1", 10, "crawl"),
    # filter parity: an unsupported kind and an ignored host must not
    # become anyone's current state on EITHER side
    _ev(7, "https://a.example/u1", 999, "purge"),
    _ev(8, "https://ignored.example/u9", 50, "crawl"),
    _ev(2, "https://b.example/u2", 20, "crawl"),
    _ev(3, "https://c.example/u3", 500, "recrawl"),
    _ev(4, "https://a.example/u1", 300, "recrawl"),
    _ev(5, "https://b.example/u2", 400, "drop"),
    _ev(6, "https://c.example/u3", 100, "crawl"),  # late, older
]

EXPECTED = {
    "https://a.example/u1": (300, "recrawl", True),
    "https://b.example/u2": (400, "drop", False),
    "https://c.example/u3": (500, "recrawl", True),
}


def _state_dict(df):
    return {
        r.url: (
            int((r.warc_ts - EPOCH0).total_seconds()),
            r.event_type,
            r.is_active,
        )
        for r in df.collect()
    }


def test_stream_equals_batch_with_out_of_order_batches(spark, tmp_path):
    events_dir = tmp_path / "events"
    generate_page_events(events_dir, EVENTS, n_chunks=8)  # 1 event per batch
    query, sink = latest_state_pipeline(
        spark, str(events_dir), str(tmp_path / "sink"), str(tmp_path / "ckpt"),
        config=CFG, available_now=True, max_files_per_trigger=1,
    )
    query.awaitTermination(180)
    got = _state_dict(read_page_state(spark, sink))
    assert got == EXPECTED

    batch = spark.read.parquet(str(events_dir))
    assert _state_dict(batch_latest_state(batch, CFG)) == EXPECTED


def test_kill_resume_and_compaction_preserve_event_time(spark, tmp_path):
    events_dir = tmp_path / "events"
    generate_page_events(events_dir, EVENTS, n_chunks=8)
    sink_path, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    # run 1: stop after first progress
    query, sink = latest_state_pipeline(
        spark, str(events_dir), sink_path, ckpt, config=CFG,
        available_now=True, max_files_per_trigger=1,
    )
    while not query.recentProgress:
        query.awaitTermination(1)
    query.stop()
    query.awaitTermination(60)

    # compact mid-history: the snapshot must keep event-time columns
    # resolving correctly against batches written after it
    sink.compact(spark)

    # run 2: resume to completion (the stale u3 correction arrives
    # AFTER the compaction snapshot that may already hold ts=500)
    query, sink = latest_state_pipeline(
        spark, str(events_dir), sink_path, ckpt, config=CFG,
        available_now=True, max_files_per_trigger=1,
    )
    query.awaitTermination(180)
    assert _state_dict(read_page_state(spark, sink)) == EXPECTED

    # final compaction folds everything; view unchanged
    sink.compact(spark)
    assert _state_dict(read_page_state(spark, sink)) == EXPECTED
