"""Sink compaction: folding committed batch dirs into a base snapshot
must not change the resolved view, must keep replayed batch ids no-ops
(exactly-once survives), and later batches must still win
last-writer-wins over compacted rows."""

from __future__ import annotations

from pathlib import Path

from gush_spark.streaming.sink import IdempotentKeyedSink


def _write(spark, sink, batch_id, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    sink.write_batch(df, batch_id)


def _view(spark, sink):
    return {r["k"]: r["v"] for r in sink.read(spark).collect()}


def test_compaction_preserves_resolved_view_and_retires_dirs(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    _write(spark, sink, 0, [("a", 1), ("b", 1)])
    _write(spark, sink, 1, [("a", 2)])
    _write(spark, sink, 2, [("c", 5)])
    before = _view(spark, sink)
    assert before == {"a": 2, "b": 1, "c": 5}

    assert sink.compact(spark) == 2
    assert sink.latest_compaction() == 2
    assert _view(spark, sink) == before
    # superseded per-batch dirs are gone; commit markers are kept
    assert not any(Path(tmp_path / "s" / "data").glob("batch=*"))
    assert sink.committed_batches() == [0, 1, 2]


def test_replay_of_compacted_batch_is_noop(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    _write(spark, sink, 0, [("a", 1)])
    _write(spark, sink, 1, [("a", 2)])
    sink.compact(spark)
    # a replayed (even corrupted-upstream) batch 1 must not re-apply
    _write(spark, sink, 1, [("a", 999)])
    assert _view(spark, sink) == {"a": 2}


def test_batches_after_compaction_win_last_writer(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    _write(spark, sink, 0, [("a", 1), ("b", 1)])
    sink.compact(spark)
    _write(spark, sink, 3, [("a", 7)])
    assert _view(spark, sink) == {"a": 7, "b": 1}
    # second compaction folds snapshot + new batch
    assert sink.compact(spark) == 3
    assert _view(spark, sink) == {"a": 7, "b": 1}
    assert sink.latest_compaction() == 3


def test_compact_append_mode_keeps_every_row(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=[])
    _write(spark, sink, 0, [("a", 1), ("a", 1)])
    _write(spark, sink, 1, [("b", 2)])
    before = sorted(
        (r["k"], r["v"]) for r in sink.read_all_appends(spark).collect()
    )
    sink.compact(spark)
    after = sorted(
        (r["k"], r["v"]) for r in sink.read_all_appends(spark).collect()
    )
    assert before == after == [("a", 1), ("a", 1), ("b", 2)]


def test_compact_nothing_new_is_noop(spark, tmp_path):
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    _write(spark, sink, 0, [("a", 1)])
    assert sink.compact(spark) == 0
    assert sink.compact(spark) == 0  # nothing new → returns prev marker
    assert _view(spark, sink) == {"a": 1}


def test_assemble_pins_listing_against_concurrent_commits(spark, tmp_path):
    """The compaction race fix: resolution runs over the (snapshot,
    batch-list) pair listed ONCE — a batch committed by a live stream
    after the listing is excluded from the snapshot rather than folded
    in while its dir survives (which would double its rows)."""
    sink = IdempotentKeyedSink(tmp_path / "s", keys=[])
    _write(spark, sink, 0, [("a", 1)])
    _write(spark, sink, 1, [("b", 2)])
    pinned = [0, 1]
    # a concurrent stream commits batch 2 between listing and resolve
    _write(spark, sink, 2, [("c", 3)])
    rows = {r["k"] for r in sink._assemble(spark, None, pinned).collect()}
    assert rows == {"a", "b"}  # pinned view excludes the late batch
    # and the normal read still sees everything exactly once
    all_rows = sorted(r["k"] for r in sink.read_all_appends(spark).collect())
    assert all_rows == ["a", "b", "c"]


def test_reader_retries_when_compactor_retires_its_listing(spark, tmp_path):
    """Reader-vs-compactor race: a reader whose (marker, batch-list)
    listing went stale because compact() retired those dirs right after
    committing must retry with a fresh listing instead of crashing."""
    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    _write(spark, sink, 0, [("a", 1), ("b", 1)])
    _write(spark, sink, 1, [("a", 2)])

    class StaleFirstListing(IdempotentKeyedSink):
        """Simulates the race: first marker read returns the pre-compaction
        state (None) while the dirs are already retired."""
        calls = 0

        def latest_compaction(self):
            StaleFirstListing.calls += 1
            if StaleFirstListing.calls == 1:
                return None  # stale: read before the marker committed
            return super().latest_compaction()

    reader = StaleFirstListing(tmp_path / "s", keys=["k"])
    assert sink.compact(spark) == 1  # retires batch dirs immediately
    assert {r["k"]: r["v"] for r in reader.read(spark).collect()} == {"a": 2, "b": 1}
    assert StaleFirstListing.calls >= 2  # the retry actually happened


def test_compact_retire_false_defers_cleanup(spark, tmp_path):
    """compact(retire=False) leaves superseded dirs for in-flight readers;
    retire_superseded() removes exactly those afterwards."""
    from pathlib import Path

    sink = IdempotentKeyedSink(tmp_path / "s", keys=["k"])
    _write(spark, sink, 0, [("a", 1)])
    _write(spark, sink, 1, [("a", 2), ("b", 5)])
    assert sink.compact(spark, retire=False) == 1
    # old dirs still present: a reader holding a stale listing can finish
    assert sorted(p.name for p in Path(tmp_path / "s" / "data").glob("batch=*")) == [
        "batch=0", "batch=1",
    ]
    assert sink._assemble(spark, None, [0, 1]).count() == 3  # stale view works
    assert _view(spark, sink) == {"a": 2, "b": 5}
    assert sink.retire_superseded() == [0, 1]
    assert not any(Path(tmp_path / "s" / "data").glob("batch=*"))
    assert _view(spark, sink) == {"a": 2, "b": 5}
