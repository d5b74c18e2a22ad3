"""Streaming heavy-hitter candidates (streaming/heavy_hitters.py):
the per-window Misra-Gries state must emit a provable SUPERSET of the
window's true heavy grams under real microbatch boundaries (the
stream-⊇-batch contract of the LSH candidate emitter), with bounded
state/emission, exact slot sentinels, and a pass-2 finalize that
equals the plain batch groupBy/HAVING twin."""

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gush_spark.sources.fixtures import PAGES_ARROW_SCHEMA
from gush_spark.streaming.heavy_hitters import (
    finalize_window_heavy_hitters,
    windowed_gram_slots,
    windowed_heavy_hitter_candidates,
)
from gush_spark.streaming.source import read_pages_batch, read_pages_stream

EPOCH = dt.datetime(2024, 3, 1)
INV_SHARE, M, SHARDS = 20, 19, 2
KW = dict(
    ts_col="warc_ts",
    text_col="text",
    window_duration="5 minutes",
    watermark_delay="1 minute",
    n=3,
)


def _window_rows(widx: int):
    """One 5-minute window: 'alpha beta gamma' x30 and 'delta epsilon
    zeta' x15 are heavy (n*20 > 230 total slots); 185 distinct noise
    trigrams are not. Every page contributes exactly one trigram slot."""
    base = EPOCH + dt.timedelta(minutes=5 * widx)
    rows, i = [], 0
    for _ in range(30):
        rows.append((f"https://h.example/p/{widx}-{i}",
                     base + dt.timedelta(seconds=i), "alpha beta gamma")); i += 1
    for _ in range(15):
        rows.append((f"https://h.example/p/{widx}-{i}",
                     base + dt.timedelta(seconds=i), "delta epsilon zeta")); i += 1
    for _ in range(185):
        rows.append((f"https://h.example/p/{widx}-{i}",
                     base + dt.timedelta(seconds=i),
                     f"n{widx}x{i} n{widx}y{i} n{widx}z{i}")); i += 1
    return rows


def _write(d, rows, fname, mtime):
    pdf = pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "warc_ts": [r[1] for r in rows],
            "html": [None] * len(rows),
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
            "case": ["plain"] * len(rows),
        }
    )
    p = os.path.join(d, fname)
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=PAGES_ARROW_SCHEMA, preserve_index=False), p
    )
    os.utime(p, (mtime, mtime))


@pytest.fixture(scope="module")
def hh_pages_dir(tmp_path_factory):
    """3 content windows, each split across 2 files (real microbatch
    boundaries so MG decrements interleave with state round-trips),
    plus a flush file 30 min later that drives the watermark past every
    content window's end."""
    d = str(tmp_path_factory.mktemp("pages_hh"))
    t = 1_700_000_000
    for widx in range(3):
        rows = _window_rows(widx)
        _write(d, rows[:115], f"part-{2 * widx:05d}.parquet", t)
        _write(d, rows[115:], f"part-{2 * widx + 1:05d}.parquet", t + 1)
        t += 2
    flush = [(f"https://h.example/p/flush-{i}",
              EPOCH + dt.timedelta(minutes=30, seconds=i), "flush pad row")
             for i in range(3)]
    _write(d, flush, "part-00006.parquet", t)
    return d


def _exact_heavies(spark, pages_dir):
    """Plain per-window GROUP BY/HAVING twin over the same rows."""
    slots = windowed_gram_slots(
        read_pages_batch(spark, pages_dir), shards=1, **KW
    )
    totals = slots.groupBy("window_start_us").agg(
        F.count(F.lit(1)).alias("total_slots")
    )
    return (
        slots.groupBy("window_start_us", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(totals, "window_start_us")
        .filter(F.col("n") * INV_SHARE > F.col("total_slots"))
    )


def test_stream_candidates_superset_bounded_exact_sentinels(
    spark, hh_pages_dir, tmp_dirs
):
    cands = windowed_heavy_hitter_candidates(
        read_pages_stream(spark, hh_pages_dir, max_files_per_trigger=2),
        inv_share=INV_SHARE, counters=M, shards=SHARDS, **KW,
    )
    q = (
        cands.writeStream.format("parquet")
        .option("path", tmp_dirs["sink"])
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(tmp_dirs["sink"]).toPandas()
    sentinels = got[got.gram.isna()]
    closed = set(sentinels.window_start_us)
    assert len(closed) == 3, f"expected all 3 content windows closed: {closed}"

    # slot sentinels are EXACT per closed window (no late rows by
    # construction — every admitted row is counted once)
    batch_slots = (
        windowed_gram_slots(read_pages_batch(spark, hh_pages_dir),
                            shards=SHARDS, **KW)
        .groupBy("window_start_us").count().toPandas()
    )
    slots_by_w = sentinels.groupby("window_start_us").slots.sum()
    for w, n in batch_slots.itertuples(index=False):
        if w in closed:
            assert slots_by_w[w] == n == 230

    # candidates ⊇ true heavies, every emission bounded by m per shard
    heavies = _exact_heavies(spark, hh_pages_dir).toPandas()
    emitted = {
        (w, g) for w, g in zip(got.window_start_us, got.gram) if isinstance(g, str)
    }
    for w, g in zip(heavies.window_start_us, heavies.gram):
        if w in closed:
            assert (w, g) in emitted, f"heavy gram lost: {g} in window {w}"
    per_shard = got[got.gram.notna()].groupby(["window_start_us", "shard"]).size()
    assert (per_shard <= M).all()
    # the decrement actually fired: far fewer candidates than the ~200
    # distinct grams per window
    assert (per_shard.groupby("window_start_us").sum() <= SHARDS * M).all()


def test_finalize_equals_batch_groupby_having_twin(spark, hh_pages_dir, tmp_dirs):
    cands = windowed_heavy_hitter_candidates(
        read_pages_stream(spark, hh_pages_dir, max_files_per_trigger=2),
        inv_share=INV_SHARE, counters=M, shards=SHARDS, **KW,
    )
    q = (
        cands.writeStream.format("parquet")
        .option("path", tmp_dirs["sink"])
        .option("checkpointLocation", tmp_dirs["checkpoint"])
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(180)
    sunk = spark.read.parquet(tmp_dirs["sink"])
    closed = {
        r["window_start_us"]
        for r in sunk.filter(F.col("gram").isNull()).select("window_start_us").collect()
    }
    final = finalize_window_heavy_hitters(
        sunk, read_pages_batch(spark, hh_pages_dir),
        inv_share=INV_SHARE,
        **{k: v for k, v in KW.items() if k != "watermark_delay"},
    ).toPandas()
    final = final[final.window_start_us.isin(closed)]
    exp = _exact_heavies(spark, hh_pages_dir).toPandas()
    exp = exp[exp.window_start_us.isin(closed)]
    key = ["window_start_us", "gram"]
    got_set = {tuple(r) for r in final[key + ["n", "total_slots"]].itertuples(index=False)}
    exp_set = {tuple(r) for r in exp[key + ["n", "total_slots"]].itertuples(index=False)}
    assert got_set == exp_set and len(got_set) == 2 * len(closed)
    assert (final.share_scaled == final.n * 1_000_000 // final.total_slots).all()


def test_batch_replay_form_is_superset_too(spark, hh_pages_dir):
    cands = windowed_heavy_hitter_candidates(
        read_pages_batch(spark, hh_pages_dir),
        inv_share=INV_SHARE, counters=M, shards=SHARDS, **KW,
    ).toPandas()
    heavies = _exact_heavies(spark, hh_pages_dir).toPandas()
    emitted = {
        (w, g) for w, g in zip(cands.window_start_us, cands.gram)
        if isinstance(g, str)
    }
    assert all(
        (w, g) in emitted
        for w, g in zip(heavies.window_start_us, heavies.gram)
    )
    # all 4 windows (3 content + flush) sentineled in batch
    assert cands[cands.gram.isna()].window_start_us.nunique() == 4


def test_counter_floor_enforced_stream(spark, hh_pages_dir):
    with pytest.raises(ValueError):
        windowed_heavy_hitter_candidates(
            read_pages_batch(spark, hh_pages_dir),
            inv_share=100, counters=10, **KW,
        )
