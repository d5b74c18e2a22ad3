"""Crawl-politeness gate (streaming/cep.py::make_politeness_rule):
quota enforcement per (host, event-time window) through the pluggable
CEP machinery — per-batch determinism, cross-microbatch state carry,
bounded state, and stream ≡ batch-twin equality."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gush_spark.sources.fixtures import canonical_event_sequences, generate_page_events
from gush_spark.streaming.cep import (
    POLITENESS_SCHEMA,
    POLITENESS_WIN_US as WIN,
    cep_enrich,
    make_politeness_rule,
)
from gush_spark.streaming.source import read_page_events_batch, read_page_events_stream


def _pdf(ids_ts):
    return pd.DataFrame(
        {
            "host": ["h"] * len(ids_ts),
            "event_id": [i for i, _ in ids_ts],
            "url": ["u"] * len(ids_ts),
            "warc_ts_us": [t for _, t in ids_ts],
            "event_type": ["crawl"] * len(ids_ts),
        }
    )


def test_quota_and_cross_batch_carry():
    rule = make_politeness_rule(quota=2)
    state: dict = {}
    out1 = rule(_pdf([(1, 0), (2, 5), (3, 9)]), state)
    assert out1["allowed"].tolist() == [True, True, False]
    assert out1["seq_in_window"].tolist() == [0, 1, 2]
    # second microbatch, same window: the carried count keeps gating
    out2 = rule(_pdf([(4, 20)]), state)
    assert out2["allowed"].tolist() == [False]
    assert out2["seq_in_window"].tolist() == [3]
    # a new window resets the quota
    out3 = rule(_pdf([(5, WIN + 1)]), state)
    assert out3["allowed"].tolist() == [True]


def test_events_gate_in_event_time_order_not_arrival_order():
    rule = make_politeness_rule(quota=1)
    out = rule(_pdf([(9, 50), (1, 10)]), {})
    # earliest event time wins the slot regardless of row order
    by_id = dict(zip(out["event_id"], out["allowed"]))
    assert by_id[1] and not by_id[9]


def test_state_bounded_for_always_active_host():
    rule = make_politeness_rule(quota=5, retention_windows=3)
    state: dict = {}
    for w in range(40):
        rule(_pdf([(w, w * WIN)]), state)
    assert len(state) <= 4


def test_stream_equals_batch_twin(spark, tmp_path, tmp_dirs):
    events_dir = str(tmp_path / "events")
    generate_page_events(events_dir, canonical_event_sequences(), n_chunks=3)
    quota = 2
    stream = read_page_events_stream(spark, events_dir, max_files_per_trigger=1)
    gated = cep_enrich(
        stream,
        watermark_delay=None,  # every event reaches the rule
        rule=make_politeness_rule(quota=quota),
        output_schema=POLITENESS_SCHEMA,
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("politeness_out")
        .outputMode("append")
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["seq_in_window"], r["allowed"])
        for r in spark.table("politeness_out").collect()
    }

    ev = read_page_events_batch(spark, events_dir).select(
        "host",
        "event_id",
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("ts_us"),
    )
    win = ((F.col("ts_us") / WIN).cast("long") * WIN).alias("w")
    rn = F.row_number().over(
        Window.partitionBy("host", "w").orderBy("ts_us", "event_id")
    )
    want = {
        r["event_id"]: (r["seq"], r["allowed"])
        for r in ev.select("host", "event_id", "ts_us", win)
        .select(
            "event_id",
            (rn - 1).cast("long").alias("seq"),
            (rn <= quota).alias("allowed"),
        )
        .collect()
    }
    assert got == want


def _burst_events():
    """Quota-exercising stream: h1 bursts past any small quota inside
    window [0,60), keeps going in window [60,120); h2 stays polite.
    Chunk boundaries (n_chunks=3, id order) land INSIDE h1's first
    window, so cross-microbatch carry is on the tested path. No late
    rows — every event is inside the pipeline watermark, where the
    gate's guarantee holds (make_politeness_rule docstring)."""
    ev = [
        _mk(1, "https://h1.example/a", 1),
        _mk(2, "https://h1.example/b", 5),
        _mk(3, "https://h2.example/a", 2),
        _mk(4, "https://h1.example/c", 10),
        _mk(5, "https://h1.example/d", 15),
        _mk(6, "https://h2.example/b", 8),
        _mk(7, "https://h1.example/e", 20),
        _mk(8, "https://h1.example/f", 65),
        _mk(9, "https://h1.example/g", 70),
        _mk(10, "https://h2.example/c", 61),
    ]
    return ev


def _mk(event_id, url, ts_s):
    from gush_spark.sources.fixtures import _ev

    return _ev(event_id, url, ts_s, "crawl", fetch_ms=100)


def test_cep_pipeline_politeness_stream_equals_batch_operator(
    spark, tmp_path, tmp_dirs
):
    """job.py --pipeline cep --politeness-quota end to end: the
    pipeline's streamed verdicts (through filters, CEP state and the
    exactly-once sink, 3 microbatches) equal the batch replay operator
    (operators/politeness.politeness_gate) on the same input."""
    from gush_spark.config import DEFAULT_CONFIG
    from gush_spark.operators.events import blacklist_filter, supported_kinds_filter
    from gush_spark.operators.politeness import politeness_gate
    from gush_spark.streaming.pipeline import cep_pipeline

    events_dir = str(tmp_path / "events")
    generate_page_events(events_dir, _burst_events(), n_chunks=3)
    quota = 2
    query, sink = cep_pipeline(
        spark,
        events_dir,
        sink_path=tmp_dirs["sink"],
        checkpoint_path=tmp_dirs["checkpoint"],
        max_files_per_trigger=1,
        politeness_quota=quota,
    )
    query.awaitTermination(120)
    got = {
        r["event_id"]: (r["window_start_us"], r["seq_in_window"], r["allowed"])
        for r in sink.read(spark).collect()
    }

    batch = blacklist_filter(
        supported_kinds_filter(read_page_events_batch(spark, events_dir)),
        DEFAULT_CONFIG,
    )
    gated = politeness_gate(
        batch, "host", "warc_ts", "event_id",
        quota=quota, window_s=WIN // 1_000_000,
    )
    want = {
        r["event_id"]: (
            r["window_start_s"] * 1_000_000, r["seq_in_window"], r["allowed"]
        )
        for r in gated.collect()
    }
    assert got == want
    assert sum(1 for (_, _, ok) in got.values() if not ok) > 0  # gate bit
