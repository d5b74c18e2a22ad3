"""Mojibake detection + repair (functions/encoding.py): golden
round-trip pairs, multiply-encoded text, refusal on false positives,
idempotence on clean text, and the detection-gated split plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.functions.encoding import (
    mojibake_markers,
    repair_text,
    with_repaired_text,
)


def _sloppy_decode(b: bytes) -> str:
    """cp1252 decode with C1 passthrough for the five undefined bytes
    — what a mis-decoding server actually emits (mirrors the module's
    _sloppy_cp1252_encode)."""
    out = []
    for byte in b:
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


def _mojibake(s: str, rounds: int = 1) -> str:
    """Encode the corruption the module undoes: utf-8 bytes mis-read
    as (sloppy) cp1252, ``rounds`` times."""
    for _ in range(rounds):
        s = _sloppy_decode(s.encode("utf-8"))
    return s


GOLDENS = [
    "café résumé naïve",
    "it’s a “quoted” phrase — with a dash… and • bullets",
    "señor João François Müller",
    "temperature 30° and «guillemets»",
]


def test_repair_text_undoes_one_round():
    for clean in GOLDENS:
        assert repair_text(_mojibake(clean)) == clean


def test_repair_text_undoes_double_encoding():
    clean = "café — l’été"
    assert repair_text(_mojibake(clean, rounds=2)) == clean


def test_clean_text_untouched():
    for clean in GOLDENS + ["plain ascii text", "", "русский 中文 العربية"]:
        assert repair_text(clean) == clean


def test_false_positive_comes_back_unchanged():
    """A string that matches the marker pattern but was never
    double-encoded (a linguistics article QUOTING the glyph sequence):
    if transcoding doesn't reduce markers, the original survives."""
    s = 'the sequence "Ã" followed by "©" renders as Ã©'
    got = repair_text(s)
    # never invent text: either unchanged or strictly fewer markers
    import re

    from gush_spark.functions.encoding import MOJIBAKE_PATTERN
    pat = re.compile(MOJIBAKE_PATTERN)
    assert got == s or len(pat.findall(got)) < len(pat.findall(s))


def test_none_passthrough():
    assert repair_text(None) is None


def test_marker_counts_jvm_side(spark):
    df = spark.createDataFrame(
        [(1, _mojibake("café — l’été")), (2, "plain ascii"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", mojibake_markers(F.col("text")).alias("n")
    ).collect()}
    assert got[1] >= 3 and got[2] == 0 and got[3] is None


def test_with_repaired_text_splits_and_repairs(spark):
    clean_rows = [(i, f"plain text number {i}") for i in range(5)]
    dirty = _mojibake("café — l’été")
    df = spark.createDataFrame(
        clean_rows + [(99, dirty), (100, None)],
        "doc_id long, text string",
    )
    out = with_repaired_text(df)
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 7
    assert got[99]["clean_text"] == "café — l’été"
    assert got[0]["clean_text"] == "plain text number 0"
    assert got[100]["clean_text"] is None
    # the clean branch must be Python-free: exactly one ArrowEvalPython
    # in the whole plan (the flagged branch)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_marker_count_parity_spark_duckdb_python(spark):
    """The oracle's value-hash only proves parity on CLEAN text (the
    synthetic corpus has zero markers); this pins nonzero counts equal
    across Java regex (Spark), RE2 (DuckDB) and Python re on real
    artifact strings, so the alternation order is engine-safe."""
    import re

    import duckdb

    from gush_spark.functions.encoding import MOJIBAKE_PATTERN

    samples = [_mojibake(g) for g in GOLDENS]
    samples += [_mojibake(g, rounds=2) for g in GOLDENS]
    samples += ["clean text", "Ã stray", "nbspÂ here", "ï»¿bom"]
    py = [len(re.findall(MOJIBAKE_PATTERN, s)) for s in samples]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    sp = [r["n"] for r in df.select(
        "i", mojibake_markers(F.col("text")).alias("n")
    ).orderBy("i").collect()]
    con = duckdb.connect()
    dk = [
        con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, MOJIBAKE_PATTERN]
        ).fetchone()[0]
        for s in samples
    ]
    assert py == sp == dk, (py, sp, dk)
    assert sum(py) > 0, "the parity check must exercise nonzero counts"
