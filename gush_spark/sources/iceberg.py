"""Iceberg adapters — the production source/sink (BASELINE.json names
Iceberg as the primary table format; the sandbox has no Iceberg runtime,
so everything here degrades explicitly and the parquet paths in
sources/ and streaming/sink.py are the tested fallback).

Production layout (SURVEY.md §4.2): pages table partitioned by
``days(warc_ts)`` + ``bucket(N, host)`` — partition pruning on time
ranges, co-located host reads for the CEP shuffle. The sink is a real
``MERGE INTO`` keyed (host, window) inside foreachBatch — the
table-format snapshot commit plays the role our commit-marker protocol
plays on plain parquet (same idempotence argument, SURVEY.md §4.3).

Runtime-execution status (re-checked rounds 4 AND 5 — same result both
times): no ``iceberg-spark-runtime`` jar exists anywhere on this
sandbox filesystem, pip resolves no candidate offline, and the sandbox
has no network (Maven Central DNS does not resolve), so the jar cannot
be obtained and a live
readStream→MERGE round-trip has never executed here. The contract is
pinned instead by tests/test_iceberg_contract.py: the MERGE text is
parsed by Spark's real SQL parser, quoting/reserved-word/degenerate-key
cases covered, and the availability gate fails closed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg runtime is on the classpath AND a catalog is
    configured.

    The classpath probe must force real class resolution: py4j resolves
    a missing class path to a ``JavaPackage`` placeholder without
    raising, so a bare ``spark._jvm.org.apache.iceberg.Schema`` attr
    access always "succeeds". ``Class.forName`` actually loads the class
    and throws ``ClassNotFoundException`` when the jars are absent. Both
    legs fail CLOSED (False) — this gate exists so callers degrade to
    the parquet paths explicitly instead of dying later in an opaque
    catalog/classpath error."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
    except Exception:
        return False
    try:
        confs = spark.conf.getAll
    except Exception:
        return False
    return any(k.startswith("spark.sql.catalog.") for k in confs)


def read_pages_stream_iceberg(
    spark: SparkSession, table: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Rate-controlled incremental scan of an Iceberg pages table
    (replaces the parquet-dir file source at production scale; offsets
    are snapshot ids — replayable, resume-from-checkpoint identical)."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "no Iceberg runtime in this environment — use "
            "gush_spark.sources.source.read_pages_stream (parquet fallback)"
        )
    return (
        spark.readStream.format("iceberg")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("streaming-skip-delete-snapshots", "true")
        .load(table)
    )


def quote_ident(name: str) -> str:
    """Backtick-quote a column identifier for Spark SQL, escaping
    embedded backticks by doubling — reserved words (``order``,
    ``timestamp``), spaces, and hostile names all round-trip. Every
    identifier interpolated into the MERGE text goes through this; a
    name that still injects after doubling is not representable as a
    Spark column at all."""
    return "`" + name.replace("`", "``") + "`"


def merge_sql(table: str, keys: list[str], cols: list[str], source_view: str) -> str:
    """The MERGE INTO statement the sink issues per microbatch — pure
    string builder so the contract is test-pinned even where no Iceberg
    runtime exists (tests/test_iceberg_contract.py). Keyed upsert:
    matched rows update every non-key column, unmatched insert all.
    Column identifiers are always quoted (``quote_ident``); the table
    and view names are multipart / generated internally and passed
    through."""
    if not keys:
        raise ValueError("MERGE sink requires at least one key column")
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"key columns absent from batch: {missing}")
    qk = {c: quote_ident(c) for c in cols}
    cond = " AND ".join(f"t.{qk[k]} = s.{qk[k]}" for k in keys)
    sets = ", ".join(f"t.{qk[c]} = s.{qk[c]}" for c in cols if c not in keys)
    names = ", ".join(qk[c] for c in cols)
    vals = ", ".join(f"s.{qk[c]}" for c in cols)
    # all columns are keys → nothing to update on match; emitting an
    # empty UPDATE SET would be a ParseException at microbatch time
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if sets else ""
    return (
        f"MERGE INTO {table} t USING {source_view} s "
        f"ON {cond} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})"
    )


class IcebergMergeSink:
    """Exactly-once keyed sink via MERGE INTO (foreachBatch body).

    Replayed batch ids re-merge the same deterministic rows — idempotent
    by the merge condition, exactly like the parquet commit-marker sink
    but with the atomicity supplied by Iceberg's snapshot commit."""

    def __init__(self, table: str, keys: list[str]):
        self.table = table
        self.keys = keys

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not iceberg_available(spark):
            raise RuntimeError("no Iceberg runtime — use IdempotentKeyedSink")
        view = f"_gush_batch_{batch_id}"
        batch_df.createOrReplaceTempView(view)
        spark.sql(merge_sql(self.table, self.keys, batch_df.columns, view))

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)
