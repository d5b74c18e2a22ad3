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
