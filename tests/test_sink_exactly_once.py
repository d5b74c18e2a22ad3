"""Exactly-once sink + checkpoint resume (SURVEY.md §4.3, §5.2).

The reference is at-most-once (in-memory buffer lost on crash,
BinlogRemoteReaderActor.scala:39); the north_rule requires exactly-once:
replayed batches must not duplicate, and resume-from-checkpoint must
produce the same final rows as an uninterrupted run.
"""

import pandas as pd
import pytest

from gush_spark.config import GushSparkConfig
from gush_spark.sources.fixtures import canonical_event_sequences, generate_page_events
from gush_spark.streaming.pipeline import cep_pipeline
from gush_spark.streaming.sink import IdempotentKeyedSink

CFG = GushSparkConfig(ignored_hosts=("ignored.example",))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    sink.write_batch(df, 0)
    sink.write_batch(df, 0)  # replay: same batch id
    out = sink.read(spark).toPandas().sort_values("k")
    assert out.v.tolist() == ["a", "b"]
    assert sink.committed_batches() == [0]


def test_keyed_merge_last_batch_wins(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    sink.write_batch(spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})), 0)
    sink.write_batch(spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": ["B", "c"]})), 1)
    out = {r["k"]: r["v"] for r in sink.read(spark).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}  # MERGE INTO semantics


def test_crash_between_data_write_and_marker(spark, tmp_path):
    """Failure window: data files written, commit marker NOT yet created
    (crash between the two). The replayed batch must rewrite and commit
    without duplicating — readers never saw the uncommitted files."""
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    # simulate the partial failure: data lands, marker does not
    df.write.mode("overwrite").parquet(str(sink.root / "data" / "batch=0"))
    assert sink.committed_batches() == []  # invisible to readers
    sink.write_batch(df, 0)  # replay after restart
    out = sink.read(spark).toPandas().sort_values("k")
    assert out.v.tolist() == ["a", "b"]
    assert sink.committed_batches() == [0]


def test_fan_out_multi_sink(spark, tmp_path):
    """S7 analog (Broadcast fan-out, GushCEP.scala:15-22): one microbatch
    delivered to N sinks, each committing independently."""
    from gush_spark.streaming.sink import fan_out

    s1 = IdempotentKeyedSink(tmp_path / "s1", keys=["k"])
    s2 = IdempotentKeyedSink(tmp_path / "s2", keys=["k"])
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    fan_out(df, 0, [s1.foreach_batch(), s2.foreach_batch()])
    for s in (s1, s2):
        out = s.read(spark).toPandas().sort_values("k")
        assert out.v.tolist() == ["a", "b"]
        assert s.committed_batches() == [0]


def test_resume_from_checkpoint_equals_uninterrupted(spark, tmp_path):
    events = canonical_event_sequences()
    # uninterrupted reference run over all 10 events
    full_dir = tmp_path / "full"
    generate_page_events(full_dir, events, n_chunks=5)
    q, full_sink = cep_pipeline(
        spark, str(full_dir), str(tmp_path / "full_sink"), str(tmp_path / "full_ckpt"),
        config=CFG, available_now=True, max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    expected = full_sink.read_all_appends(spark).toPandas()

    # interrupted run: first only 3 chunks exist, stream finishes
    # (AvailableNow drains what's there), THEN the remaining chunks
    # appear and the stream restarts from the same checkpoint
    part_dir = tmp_path / "part"
    import numpy as np
    chunks = np.array_split(np.arange(len(events)), 5)
    first = [events[i] for c in chunks[:3] for i in c]
    generate_page_events(part_dir, first, n_chunks=3)
    q1, sink1 = cep_pipeline(
        spark, str(part_dir), str(tmp_path / "r_sink"), str(tmp_path / "r_ckpt"),
        config=CFG, available_now=True, max_files_per_trigger=1,
    )
    q1.awaitTermination(120)
    n_after_first = sink1.read_all_appends(spark).count()
    assert 0 < n_after_first < len(expected)

    rest = [events[i] for c in chunks[3:] for i in c]
    # chunk file names must not collide with the first write
    import pyarrow as pa
    import pyarrow.parquet as pq
    from gush_spark.sources.fixtures import PAGE_EVENTS_ARROW_SCHEMA
    tbl = pa.Table.from_pandas(pd.DataFrame(rest), schema=PAGE_EVENTS_ARROW_SCHEMA,
                               preserve_index=False)
    pq.write_table(tbl, part_dir / "chunk-99990.parquet")

    q2, sink2 = cep_pipeline(
        spark, str(part_dir), str(tmp_path / "r_sink"), str(tmp_path / "r_ckpt"),
        config=CFG, available_now=True, max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    resumed = sink2.read_all_appends(spark).toPandas()

    key = ["event_id", "url", "event_type", "prior_ts_us", "crawl_count"]
    exp = expected[key].sort_values("event_id").reset_index(drop=True)
    got = resumed[key].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_iceberg_adapter_degrades_explicitly(spark, tmp_path):
    """No Iceberg runtime in this sandbox: the production adapters must
    detect that and fail with a pointer to the parquet fallback, never
    silently misbehave."""
    from gush_spark.sources.iceberg import (
        IcebergMergeSink,
        iceberg_available,
        read_pages_stream_iceberg,
    )

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="parquet fallback"):
        read_pages_stream_iceberg(spark, "db.pages")
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["a"]}))
    with pytest.raises(RuntimeError, match="IdempotentKeyedSink"):
        IcebergMergeSink("db.sink", keys=["k"]).write_batch(df, 0)


def test_replayed_batch_still_commits_upstream_state(spark, tmp_path):
    """Spark 4's BatchCommitTracker fails a query whose foreachBatch
    returns without processing every partition ("Expected N commits but
    got 0"): when a replayed batch hits the sink's already-committed
    short-circuit, the STATEFUL upstream (windowed agg) must still be
    materialized so its state stores commit. Repro = fresh checkpoint
    against a sink that already committed batch 0 (exactly what a
    restarted spark-submit job with a recreated checkpoint dir does);
    before the fix the second query died on batch 0."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(f"u{i}", base + dt.timedelta(seconds=i), float(i)) for i in range(20)]
    src = tmp_path / "ev"
    spark.createDataFrame(rows, "url string, warc_ts timestamp, v double").coalesce(
        1
    ).write.parquet(str(src))

    def q(ckpt):
        stream = (
            spark.readStream.schema("url string, warc_ts timestamp, v double")
            .parquet(str(src))
            .withWatermark("warc_ts", "10 minutes")
            .groupBy(F.window("warc_ts", "10 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"), "n")
        )
        return (
            stream.writeStream.foreachBatch(sink.foreach_batch())
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )

    sink = IdempotentKeyedSink(tmp_path / "s", keys=["window_start"])
    q1 = q("ckpt1")
    q1.awaitTermination(120)
    first = {r["window_start"]: r["n"] for r in sink.read(spark).collect()}
    committed = sink.committed_batches()  # data batch + watermark-advance batch
    assert first and 0 in committed

    q2 = q("ckpt2")  # fresh checkpoint, same sink: batch 0 replays
    q2.awaitTermination(120)
    assert q2.exception() is None  # previously: BatchCommitTracker kill
    assert {r["window_start"]: r["n"] for r in sink.read(spark).collect()} == first
    assert sink.committed_batches() == committed  # nothing rewritten
