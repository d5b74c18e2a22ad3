"""Contract tests for the Iceberg production path, runnable without an
Iceberg runtime: the MERGE statement text is pinned, the availability
gate fails closed, and write_batch wiring issues exactly the pinned SQL
(mocked session) — guarding the string builder the sandbox can never
execute (ADVICE.md: the production source/sink path was unexercised)."""

from __future__ import annotations

import pytest

from gush_spark.sources.iceberg import (
    IcebergMergeSink,
    iceberg_available,
    merge_sql,
    quote_ident,
)


def test_merge_sql_pinned():
    got = merge_sql(
        "warehouse.page_rollup",
        keys=["host", "window_start"],
        cols=["host", "window_start", "n_pages", "n_errors"],
        source_view="_gush_batch_7",
    )
    assert got == (
        "MERGE INTO warehouse.page_rollup t USING _gush_batch_7 s "
        "ON t.`host` = s.`host` AND t.`window_start` = s.`window_start` "
        "WHEN MATCHED THEN UPDATE SET t.`n_pages` = s.`n_pages`, "
        "t.`n_errors` = s.`n_errors` "
        "WHEN NOT MATCHED THEN INSERT (`host`, `window_start`, `n_pages`, `n_errors`) "
        "VALUES (s.`host`, s.`window_start`, s.`n_pages`, s.`n_errors`)"
    )


def test_merge_sql_quotes_reserved_and_hostile_identifiers():
    """Reserved words, spaces, and embedded backticks must all arrive
    quoted — a crawl schema with a `timestamp` or `order` column cannot
    break the microbatch MERGE."""
    got = merge_sql(
        "cat.db.t",
        keys=["order"],
        cols=["order", "timestamp", "page rank", "evil`col"],
        source_view="v",
    )
    assert "ON t.`order` = s.`order`" in got
    assert "t.`timestamp` = s.`timestamp`" in got
    assert "t.`page rank` = s.`page rank`" in got
    assert "t.`evil``col` = s.`evil``col`" in got  # backtick doubled
    assert quote_ident("a`b") == "`a``b`"


def test_quoted_merge_parses_in_spark(spark):
    """The generated text must be valid Spark SQL: parse it with the
    real parser (no Iceberg runtime needed for parsing) — reserved-word
    and spaced identifiers included."""
    sql = merge_sql(
        "some_table",
        keys=["order"],
        cols=["order", "timestamp", "page rank"],
        source_view="some_view",
    )
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    assert "MergeIntoTable" in plan.toString()


def test_merge_sql_rejects_bad_keys():
    with pytest.raises(ValueError):
        merge_sql("t", keys=[], cols=["a"], source_view="v")
    with pytest.raises(ValueError):
        merge_sql("t", keys=["missing"], cols=["a"], source_view="v")


class _FakeSession:
    def __init__(self):
        self.issued: list[str] = []

    def sql(self, text):
        self.issued.append(text)


class _FakeBatchDF:
    columns = ["host", "window_start", "n_pages"]

    def __init__(self, session):
        self.sparkSession = session
        self.views: list[str] = []

    def createOrReplaceTempView(self, name):
        self.views.append(name)


def test_write_batch_issues_pinned_merge(monkeypatch):
    import gush_spark.sources.iceberg as ice

    monkeypatch.setattr(ice, "iceberg_available", lambda spark: True)
    session = _FakeSession()
    df = _FakeBatchDF(session)
    IcebergMergeSink("cat.db.rollup", keys=["host", "window_start"]).write_batch(df, 42)
    assert df.views == ["_gush_batch_42"]
    assert session.issued == [
        merge_sql(
            "cat.db.rollup",
            ["host", "window_start"],
            ["host", "window_start", "n_pages"],
            "_gush_batch_42",
        )
    ]


def test_write_batch_fails_closed_without_runtime(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(host="h", window_start=1, n=1)])
    with pytest.raises(RuntimeError, match="no Iceberg runtime"):
        IcebergMergeSink("t", keys=["host"]).write_batch(df, 0)
    assert iceberg_available(spark) is False


def test_merge_sql_all_key_columns_omits_matched_clause():
    got = merge_sql("t", keys=["k1", "k2"], cols=["k1", "k2"], source_view="v")
    assert "WHEN MATCHED" not in got
    assert got == (
        "MERGE INTO t t USING v s ON t.`k1` = s.`k1` AND t.`k2` = s.`k2` "
        "WHEN NOT MATCHED THEN INSERT (`k1`, `k2`) VALUES (s.`k1`, s.`k2`)"
    )
