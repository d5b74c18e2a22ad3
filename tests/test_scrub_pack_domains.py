"""Hand-checkable semantics for the PII scrub, frequent-line removal,
sequence packing and domain-reputation operators; the DuckDB oracles
(pii_scrub_report, boilerplate_line_removal, sequence_packing,
domain_reputation) cover the synthetic corpus exhaustively."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gush_spark.operators.domains import domain_reputation_gate
from gush_spark.operators.lines import remove_frequent_lines
from gush_spark.operators.packing import pack_sequences
from gush_spark.operators.scrub import scrub_pii


# --------------------------------------------------------------------- scrub
def test_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@corp.io or alice@x.co.uk thanks"),
            (2, "call 555-123-4567 from 10.1.2.3 now"),
            (3, "no pii here"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df, "doc_id", "text").collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_phone"] == 0
    assert "bob@corp.io" not in rows[1]["clean_text"]
    assert rows[1]["clean_text"].count("<EMAIL>") == 2
    assert rows[2]["n_phone"] == 1 and rows[2]["n_ipv4"] == 1
    assert rows[2]["clean_text"] == "call <PHONE> from <IP> now"
    assert rows[3]["n_pii"] == 0 and rows[3]["clean_text"] == "no pii here"
    assert rows[4]["clean_text"] is None and rows[4]["n_pii"] == 0


def test_scrub_progressive_attribution(spark):
    # digits that LOOK like a phone inside an email are attributed to
    # the email rule (redacted first), not double-counted as a phone
    df = spark.createDataFrame(
        [(1, "x 555-123-4567@spam.com y")], ["doc_id", "text"]
    )
    r = scrub_pii(df, "doc_id", "text").collect()[0]
    assert r["n_email"] == 1
    assert r["n_phone"] == 0
    assert r["clean_text"] == "x <EMAIL> y"


def test_scrub_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a@b.io")], ["doc_id", "text"])
    plan = scrub_pii(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------------- lines
@pytest.fixture(scope="module")
def line_docs(spark):
    banner = "all rights reserved"
    rows = [
        (1, [banner, "unique one", "unique two"]),
        (2, ["unique three", banner]),
        (3, [banner, banner]),  # only boilerplate -> empty doc
        (4, ["untouched content"]),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lines"])


def test_frequent_lines_removed_order_kept(spark, line_docs):
    out = remove_frequent_lines(line_docs, "doc_id", "lines", min_docs=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["clean_text"] == "unique one\nunique two"
    assert rows[1]["n_lines"] == 3 and rows[1]["n_removed"] == 1
    assert rows[2]["clean_text"] == "unique three"
    # doc 3 loses every line but still surfaces
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 2
    assert rows[4]["clean_text"] == "untouched content"
    assert rows[4]["n_removed"] == 0


def test_min_docs_counts_distinct_docs_not_occurrences(spark, line_docs):
    # banner appears 4 times but in only 3 distinct docs: min_docs=4
    # must NOT remove it (doc frequency, not occurrence frequency)
    out = remove_frequent_lines(line_docs, "doc_id", "lines", min_docs=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(rows[i]["n_removed"] == 0 for i in (1, 2, 3, 4))


def test_map_side_form_equals_join_form(spark, line_docs):
    a = remove_frequent_lines(line_docs, "doc_id", "lines", min_docs=3)
    b = remove_frequent_lines(
        line_docs, "doc_id", "lines", min_docs=3, map_side=True
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and the map-side plan moves no text through an exchange
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_map_side_form_equals_join_form_on_nullable_input(spark):
    """Null arrays and null elements: both forms must agree — null
    array -> ('', null, null); null element is never-frequent (kept,
    counted, omitted from the rebuilt text like array_join)."""
    import pyspark.sql.types as T

    banner = "all rights reserved"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lines", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        (1, [banner, None, "keep me"]),
        (2, None),
        (3, [banner, "solo"]),
        (4, [None, None]),
        (5, [banner]),
    ]
    docs = spark.createDataFrame(rows, schema)
    a = remove_frequent_lines(docs, "doc_id", "lines", min_docs=3)
    b = remove_frequent_lines(docs, "doc_id", "lines", min_docs=3, map_side=True)
    got_a = sorted(map(tuple, a.collect()))
    got_b = sorted(map(tuple, b.collect()))
    assert got_a == got_b
    by_id = {r[0]: r for r in got_a}
    assert by_id[1] == (1, "keep me", 3, 1)  # null kept+counted, not joined
    assert by_id[2] == (2, "", None, None)  # null array
    assert by_id[4] == (4, "", 2, 0)


def test_map_side_guard_trips_on_huge_frequent_set(spark, line_docs):
    with pytest.raises(ValueError, match="max_collected_keys"):
        remove_frequent_lines(
            line_docs, "doc_id", "lines",
            min_docs=1, map_side=True, max_collected_keys=2,
        )


def test_removal_join_is_broadcast(spark, line_docs):
    out = remove_frequent_lines(line_docs, "doc_id", "lines", min_docs=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------------- packing
def test_packing_offsets_and_splits(spark):
    # one bucket so the layout is a single deterministic stream
    df = spark.createDataFrame(
        [(i, 40) for i in range(10)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences(df, "doc_id", "n_tokens", budget=100, buckets=1).collect()
    rows = sorted(out, key=lambda r: r["seq_offset"] + 0)  # offsets within seq
    assert all(0 <= r["seq_offset"] < 100 for r in rows)
    # 10 docs x 40 tokens = 400 tokens -> 4 sequences of budget 100
    assert len({r["seq_id"] for r in rows}) == 4
    # doc starting at offset 80 straddles the boundary
    by_off = {}
    for r in out:
        by_off.setdefault(r["seq_id"], []).append(r)
    for seq_rows in by_off.values():
        for r in seq_rows:
            assert r["split"] == (r["seq_offset"] + r["n_tokens"] > 100)
    assert sum(1 for r in out if r["split"]) > 0


def test_packing_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(200)], ["doc_id", "n_tokens"]
    )
    a = pack_sequences(df, "doc_id", "n_tokens", budget=64, buckets=4)
    b = pack_sequences(
        df.repartition(7), "doc_id", "n_tokens", budget=64, buckets=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_no_single_partition_exchange(spark):
    df = spark.createDataFrame([(i, 5) for i in range(50)], ["doc_id", "n_tokens"])
    plan = (
        pack_sequences(df, "doc_id", "n_tokens", budget=64, buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point: no global sort / single-partition window
    assert "SinglePartition" not in plan


# ------------------------------------------------------------------- domains
def test_domain_gate_flags_low_mean_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "good.com", 0.9),
            (2, "good.com", 0.7),
            (3, "spam.biz", 0.2),
            (4, "spam.biz", 0.4),
        ],
        ["doc_id", "domain", "q"],
    )
    out = domain_reputation_gate(df, "doc_id", "domain", "q", min_quality=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["domain_quality"] == pytest.approx(0.8)
    assert rows[1]["domain_flagged"] is False
    assert rows[3]["domain_quality"] == pytest.approx(0.3)
    assert rows[3]["domain_flagged"] is True
    assert rows[3]["n_docs"] == 2


def test_domain_gate_keeps_null_domains(spark):
    df = spark.createDataFrame(
        [(1, "good.com", 0.9), (2, None, 0.1), (3, None, 0.3)],
        ["doc_id", "domain", "q"],
    )
    out = domain_reputation_gate(df, "doc_id", "domain", "q", min_quality=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}, "null-domain docs must not vanish"
    assert rows[2]["domain_quality"] == pytest.approx(0.2)
    assert rows[2]["domain_flagged"] is True and rows[2]["n_docs"] == 2


def test_domain_gate_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "d", 0.5)], ["doc_id", "domain", "q"])
    plan = (
        domain_reputation_gate(df, "doc_id", "domain", "q", min_quality=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_budget_apportionment_exact(spark):
    """Hamilton apportionment: hand-checked allocation, sum == budget
    exactly, zero-weight host gets nothing, all-zero table allocates
    nothing."""
    from gush_spark.operators.budget import apportion_budget

    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("z", 0)], ["host", "weight"]
    )
    # budget 10, W=9: base = [5,3,1,0] rem = [5,3,1,0] -> leftover 1
    # goes to 'a' (largest remainder)
    got = {r["host"]: (r["base_alloc"], r["extra"], r["alloc"])
           for r in apportion_budget(w, 10).collect()}
    assert got == {"a": (5, 1, 6), "b": (3, 0, 3), "c": (1, 0, 1),
                   "z": (0, 0, 0)}
    assert sum(a for _, _, a in got.values()) == 10
    # prime budget, awkward weights: the sum invariant must still hold
    w2 = spark.createDataFrame(
        [(f"h{i}", i * i + 1) for i in range(7)], ["host", "weight"]
    )
    rows = apportion_budget(w2, 101).collect()
    assert sum(r["alloc"] for r in rows) == 101
    # all-zero weights: nothing allocated (no division by zero)
    w3 = spark.createDataFrame([("a", 0), ("b", 0)], ["host", "weight"])
    assert all(
        r["alloc"] == 0 for r in apportion_budget(w3, 10).collect()
    )
