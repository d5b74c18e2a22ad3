"""Rate-controlled streaming sources (SURVEY.md §2.1 S1-S5).

The reference tails a MySQL binlog with actor-demand backpressure
(BinlogRemoteReaderActor.scala:32-85 — whose demand logic is actually
broken and drains fully; see SURVEY.md S4). Spark's source-offset model
replaces all of that: the file/Iceberg source exposes replayable
offsets, `maxFilesPerTrigger` bounds each microbatch (backpressure),
and `checkpointLocation` resume replaces `postRestart` reconnect
(BinlogRemoteReaderActor.scala:49-52).

On a real cluster the source is an Iceberg table partitioned by
days(warc_ts) + bucket(host); the sandbox fallback is a parquet
directory with identical schema — the engine code is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("case", T.StringType()),
    ]
)

PAGE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """S1/S4 analog: the rate-controlled page stream."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def read_page_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Event-sequence stream; maxFilesPerTrigger=1 replays fixture
    chunks as ordered microbatches (the BinlogToAkkaTest harness
    analog)."""
    return (
        spark.readStream.schema(PAGE_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def read_pages_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_page_events_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGE_EVENTS_SCHEMA).parquet(path)


def read_input_stream(spark: SparkSession, path: str, config) -> DataFrame:
    """Pages stream in the container named by ``config.input_format``:
    parquet table shards (default) or raw WARC archives
    (sources/warc.py — parsed + adapted to the same pages contract).
    Every pipeline reads through this one dispatcher, so swapping the
    crawl's physical format is a config flag, not a code change."""
    if config.input_format == "warc":
        from gush_spark.sources.warc import read_warc_stream, warc_pages

        return warc_pages(
            read_warc_stream(spark, path, config.max_files_per_trigger)
        )
    return read_pages_stream(spark, path, config.max_files_per_trigger)


def read_input_batch(spark: SparkSession, path: str, config) -> DataFrame:
    """Batch twin of read_input_stream (stream == batch tests)."""
    if config.input_format == "warc":
        from gush_spark.sources.warc import read_warc_responses, warc_pages

        return warc_pages(read_warc_responses(spark, path))
    return read_pages_batch(spark, path)
