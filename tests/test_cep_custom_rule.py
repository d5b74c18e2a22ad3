"""User-pluggable CEP rules (SURVEY.md §2.10): a custom python rule —
gush's windowed count flow (GushCEP.scala:40-42 bookingsWindowCount)
re-expressed as a (pdf, state) function — runs through the same
applyInPandasWithState machinery as the default crawl/recrawl/drop
machine, with JSON state carried across microbatches."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gush_spark.sources.fixtures import canonical_event_sequences, generate_page_events
from gush_spark.streaming.cep import (
    WINDOWED_COUNT_SCHEMA as RULE_SCHEMA,
    WINDOWED_COUNT_WIN_US as WIN_US,
    cep_enrich,
    windowed_count_rule,
)
from gush_spark.streaming.source import read_page_events_batch, read_page_events_stream


def test_rule_is_pure_and_accumulates():
    state: dict = {}
    pdf = pd.DataFrame(
        {
            "host": ["h"] * 3,
            "event_id": [1, 2, 3],
            "url": ["u"] * 3,
            "warc_ts_us": [0, 1, WIN_US + 5],
            "event_type": ["crawl"] * 3,
        }
    )
    out1 = windowed_count_rule(pdf, state)
    assert out1["n_events"].tolist() == [2, 1]
    out2 = windowed_count_rule(pdf, state)
    assert out2["n_events"].tolist() == [4, 2]  # running totals
    assert state == {"0": 4, str(WIN_US): 2}


def test_rule_state_is_bounded_for_always_active_host():
    """An always-active host is never TTL-evicted, so the rule itself
    must prune window keys behind the late-data horizon — state size
    stays constant as windows keep arriving, instead of growing one
    entry per window forever."""
    from gush_spark.streaming.cep import WINDOWED_COUNT_RETENTION_WINDOWS

    state: dict = {}
    sizes = []
    for w in range(50):  # 50 consecutive windows of activity
        pdf = pd.DataFrame(
            {
                "host": ["hot"] * 2,
                "event_id": [2 * w, 2 * w + 1],
                "url": ["u"] * 2,
                "warc_ts_us": [w * WIN_US, w * WIN_US + 5],
                "event_type": ["crawl"] * 2,
            }
        )
        out = windowed_count_rule(pdf, state)
        assert out["n_events"].tolist() == [2]  # counts unaffected by pruning
        sizes.append(len(state))
    assert max(sizes) <= WINDOWED_COUNT_RETENTION_WINDOWS + 1
    assert sizes[-1] == sizes[10]  # constant once past the horizon


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events"
    generate_page_events(d, canonical_event_sequences(), n_chunks=3)
    return str(d)


def test_custom_rule_through_streaming_state(spark, events_dir, tmp_dirs):
    stream = read_page_events_stream(spark, events_dir, max_files_per_trigger=1)
    # no watermark: every event reaches the rule, so the final running
    # totals must equal the plain batch groupBy
    enriched = cep_enrich(
        stream, watermark_delay=None, rule=windowed_count_rule,
        output_schema=RULE_SCHEMA,
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("custom_rule_out")
        .outputMode("append")
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("custom_rule_out")
        .groupBy("host", "window_start_us")
        .agg(F.max("n_events").alias("n_events"))  # last running total
        .collect()
    )
    got_map = {(r["host"], r["window_start_us"]): r["n_events"] for r in got}

    ev = read_page_events_batch(spark, events_dir)
    want = (
        ev.select(
            "host",
            ((F.unix_micros(F.col("warc_ts").cast("timestamp")) / WIN_US).cast("long")
             * WIN_US).alias("window_start_us"),
        )
        .groupBy("host", "window_start_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    want_map = {(r["host"], r["window_start_us"]): r["n_events"] for r in want}
    assert got_map == want_map


def test_custom_rule_requires_output_schema(spark, events_dir):
    stream = read_page_events_stream(spark, events_dir)
    with pytest.raises(ValueError, match="output_schema"):
        cep_enrich(stream, rule=windowed_count_rule)
