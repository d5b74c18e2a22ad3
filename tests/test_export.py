"""Sharded-JSONL export: lossless round trip, stable shard assignment,
and the script-profile operator's hand-checkable semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.sources.export import read_jsonl_shards, write_jsonl_shards


def test_jsonl_roundtrip_and_stable_shards(spark, tmp_path):
    rows = [(i, f"text {i}", float(i) / 7) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "score"])
    out = str(tmp_path / "corpus")
    write_jsonl_shards(df, out, "doc_id", n_shards=8)

    back = read_jsonl_shards(
        spark, out, "doc_id long, text string, score double"
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)

    # shard dirs exist and assignment is deterministic across exports
    import os

    shards1 = sorted(d for d in os.listdir(out) if d.startswith("_shard="))
    assert len(shards1) == 8
    per_shard1 = {
        d: sorted(
            r["value"] for r in spark.read.text(f"{out}/{d}").collect()
        )
        for d in shards1
    }
    out2 = str(tmp_path / "corpus2")
    write_jsonl_shards(df.repartition(13), out2, "doc_id", n_shards=8)
    per_shard2 = {
        d: sorted(
            r["value"] for r in spark.read.text(f"{out2}/{d}").collect()
        )
        for d in shards1
    }
    assert per_shard1 == per_shard2


# ------------------------------------------------------------- scripts
def test_script_profile_counts(spark):
    from gush_spark.operators.scripts import mixed_script_flag, script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world 42"),
            (2, "Привет мир"),
            (3, "hello Привет 你好"),
            (4, None),
        ],
        ["id", "t"],
    )
    p = script_profile(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            p["n_latin"].alias("lat"),
            p["n_cyrillic"].alias("cyr"),
            p["n_cjk"].alias("cjk"),
            p["n_digit"].alias("dig"),
            p["n_chars"].alias("n"),
            mixed_script_flag(p, "latin", 0.05).alias("mixed"),
        ).collect()
    }
    assert out[1]["lat"] == 10 and out[1]["dig"] == 2 and out[1]["cyr"] == 0
    assert out[2]["cyr"] == 9 and out[2]["lat"] == 0
    assert out[3]["lat"] == 5 and out[3]["cyr"] == 6 and out[3]["cjk"] == 2
    assert out[4]["n"] == 0 and out[4]["mixed"] is False
    # doc 3: latin_frac 5/16 < 0.5 -> not flagged as latin-primary spam
    assert out[3]["mixed"] is False
    # a mostly-latin doc with a cyrillic tail IS flagged
    flagged = (
        spark.createDataFrame([(1, "normal english words here плюс")], ["id", "t"])
        .select(
            mixed_script_flag(
                script_profile(F.col("t")), "latin", 0.05
            ).alias("m")
        )
        .collect()[0]["m"]
    )
    assert flagged is True


# --------------------------------------------------------- compression
def test_compression_ratio_pinned_values(spark):
    """No DuckDB oracle exists for DEFLATE, so exact values are pinned
    here: zlib level 6 is deterministic for a given input."""
    import zlib

    from gush_spark.functions.text_analysis import compression_ratio_udf

    texts = [
        "spam spam spam spam spam spam spam spam spam spam",
        "the quick brown fox jumps over the lazy dog",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "t"]
    )
    got = {
        r["id"]: r["ratio"]
        for r in df.select(
            "id", compression_ratio_udf()(F.col("t")).alias("ratio")
        ).collect()
    }
    for i, t in enumerate(texts):
        if not t:
            assert got[i] is None
        else:
            raw = t.encode()
            assert got[i] == pytest.approx(len(zlib.compress(raw, 6)) / len(raw))
    # the repetitive page compresses far below the prose page
    assert got[0] < got[1] - 0.2


def test_release_manifest_checksum_order_free_and_sensitive(spark, monkeypatch):
    """The shard checksum is partitioning-invariant (bit_xor commutes)
    and any single changed document flips its shard's checksum."""
    import gush_spark.queries_pipeline as qp

    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(40)], "doc_id long, text string"
    )

    def run(d):
        monkeypatch.setattr(qp, "load", lambda s, p, t: d)
        return {
            r["shard"]: (r["n_docs"], r["n_chars"], r["content_hash"])
            for r in qp.q_release_manifest(spark, "x").collect()
        }

    base = run(docs)
    assert run(docs.repartition(7)) == base  # order/partitioning free
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 17, F.lit("tampered")).otherwise(F.col("text")),
    )
    tampered = run(changed)
    diff = {s for s in base if base[s][2] != tampered.get(s, (0, 0, 0))[2]}
    assert len(diff) == 1  # exactly doc 17's shard flips
