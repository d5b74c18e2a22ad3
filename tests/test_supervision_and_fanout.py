"""S2 completion + S7 variant (b): the bounded-restart supervisor must
resume a failed query from its checkpoint with the same final sink as an
uninterrupted run, and N independent queries over one source must each
deliver complete results under their own checkpoints."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gush_spark.sources.fixtures import canonical_event_sequences, generate_page_events
from gush_spark.streaming.cep import cep_enrich
from gush_spark.streaming.pipeline import start_independent_queries
from gush_spark.streaming.sink import IdempotentKeyedSink
from gush_spark.streaming.source import read_page_events_batch, read_page_events_stream
from gush_spark.streaming.supervisor import run_supervised


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events"
    generate_page_events(d, canonical_event_sequences(), n_chunks=4)
    return str(d)


def _cep_rows(spark, sink):
    out = sink.read_all_appends(spark).toPandas()
    return sorted(
        (
            int(r.event_id),
            r.event_type,
            None if pd.isna(r.prior_ts_us) else int(r.prior_ts_us),
            int(r.crawl_count),
        )
        for r in out.itertuples()
    )


def _start_cep(spark, events_dir, sink, ckpt, write):
    stream = read_page_events_stream(spark, events_dir, max_files_per_trigger=1)
    enriched = cep_enrich(stream, watermark_delay="10 minutes")
    return (
        enriched.writeStream.outputMode("append")
        .foreachBatch(write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(),
        sink,
    )


def test_supervisor_restart_equals_uninterrupted(spark, events_dir, tmp_path):
    # uninterrupted reference run
    ref_sink = IdempotentKeyedSink(tmp_path / "ref_sink", keys=[])
    q, _ = _start_cep(
        spark, events_dir, ref_sink, str(tmp_path / "ref_ckpt"),
        ref_sink.foreach_batch(),
    )
    q.awaitTermination(120)
    want = _cep_rows(spark, ref_sink)

    # supervised run with one injected microbatch failure
    sink = IdempotentKeyedSink(tmp_path / "sink", keys=[])
    poison = tmp_path / "poison"
    poison.touch()

    def flaky_write(df, bid):
        if bid == 1 and poison.exists():
            poison.unlink()
            raise RuntimeError("injected microbatch failure")
        sink.write_batch(df, bid)

    lineage = tmp_path / "lineage.jsonl"
    _, _, restarts = run_supervised(
        lambda: _start_cep(
            spark, events_dir, sink, str(tmp_path / "ckpt"), flaky_write
        ),
        max_restarts=2,
        lineage_path=str(lineage),
    )
    assert restarts == 1
    assert _cep_rows(spark, sink) == want  # resume == uninterrupted
    entries = [json.loads(l) for l in lineage.read_text().splitlines()]
    assert entries and entries[0]["kind"] == "query_restart"
    assert "injected" in entries[0]["error"] or entries[0]["error"]


def test_supervisor_gives_up_after_max_restarts(spark, events_dir, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    sink = IdempotentKeyedSink(tmp_path / "sink2", keys=[])

    def always_fail(df, bid):
        raise RuntimeError("permanent failure")

    with pytest.raises(StreamingQueryException):
        run_supervised(
            lambda: _start_cep(
                spark, events_dir, sink, str(tmp_path / "ckpt2"), always_fail
            ),
            max_restarts=1,
        )


def test_independent_queries_over_one_source(spark, events_dir, tmp_path):
    enrich_sink = IdempotentKeyedSink(tmp_path / "enrich", keys=[])
    count_sink = IdempotentKeyedSink(tmp_path / "counts", keys=["host"])
    queries = start_independent_queries(
        spark,
        events_dir,
        {
            "enrich": (
                lambda s: cep_enrich(s, watermark_delay="10 minutes"),
                enrich_sink,
                "append",
            ),
            "counts": (
                lambda s: s.groupBy("host").agg(F.count(F.lit(1)).alias("n")),
                count_sink,
                "complete",
            ),
        },
        checkpoint_root=str(tmp_path / "ckpts"),
    )
    for q, _ in queries.values():
        q.awaitTermination(120)

    ev = read_page_events_batch(spark, events_dir)
    want_counts = {
        r["host"]: r["n"]
        for r in ev.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_counts = {
        r["host"]: r["n"] for r in count_sink.read(spark).collect()
    }
    assert got_counts == want_counts
    # the CEP query progressed independently and produced rows
    assert len(_cep_rows(spark, enrich_sink)) > 0
    # separate checkpoints on disk
    assert (tmp_path / "ckpts" / "enrich").exists()
    assert (tmp_path / "ckpts" / "counts").exists()
