"""Token-window chunking (operators/chunking.py): full coverage of the
token stream, exact overlap, remainder semantics, null handling, and
the zero-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.operators.chunking import chunk_documents


def _doc(spark, n_tokens, doc_id=1):
    text = " ".join(f"w{i}" for i in range(n_tokens))
    return spark.createDataFrame([(doc_id, text)], ["doc_id", "text"])


def test_windows_cover_every_token_with_exact_overlap(spark):
    rows = sorted(
        chunk_documents(_doc(spark, 300), "doc_id", "text",
                        chunk_tokens=128, stride=96).collect(),
        key=lambda r: r["chunk_id"],
    )
    # ceil((300-128)/96)+1 = 3 chunks
    assert [r["start_token"] for r in rows] == [0, 96, 192]
    assert [r["n_chunk_tokens"] for r in rows] == [128, 128, 108]
    seen = set()
    for r in rows:
        toks = r["chunk_text"].split(" ")
        assert toks == [f"w{i}" for i in
                        range(r["start_token"], r["start_token"] + len(toks))]
        seen.update(range(r["start_token"], r["start_token"] + len(toks)))
    assert seen == set(range(300)), "every token must land in >=1 chunk"
    # consecutive chunks overlap by chunk_tokens - stride = 32
    assert rows[1]["start_token"] - rows[0]["start_token"] == 96


def test_short_doc_is_one_chunk_and_null_text_yields_none(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    docs = spark.createDataFrame(
        [(1, "only five little words here"), (2, None)], schema
    )
    rows = chunk_documents(docs, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["n_chunk_tokens"] == 5
    assert rows[0]["chunk_text"] == "only five little words here"


def test_exact_boundary_no_phantom_chunk(spark):
    # n == chunk_tokens -> exactly one chunk; n == chunk+stride ->
    # exactly two, second is the full-stride remainder
    one = chunk_documents(_doc(spark, 128), "doc_id", "text",
                          chunk_tokens=128, stride=96).collect()
    assert len(one) == 1
    two = sorted(
        chunk_documents(_doc(spark, 224), "doc_id", "text",
                        chunk_tokens=128, stride=96).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["n_chunk_tokens"] for r in two] == [128, 128]


def test_chunking_is_map_only(spark):
    out = chunk_documents(_doc(spark, 300), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "chunking must not shuffle"


def test_invalid_params_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(_doc(spark, 10), "doc_id", "text", stride=0)
