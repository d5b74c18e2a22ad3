"""Production table layout — days(warc_ts) + bucket(N, host), runnable
on plain parquet.

BASELINE.json's production table is Iceberg partitioned by
``days(warc_ts)`` + ``bucket(N, host)`` (sources/iceberg.py documents
the real transforms). The same physical layout is expressible on plain
parquet with materialized partition columns, which makes the two scale
properties DEMONSTRABLE in this sandbox (tests/test_layout_pruning.py):

- **partition pruning**: a time-range predicate on ``warc_date``
  resolves at planning time — the scan lists only matching date dirs
  (at 10^12 pages, reading a day instead of the full history is the
  difference between a job and a non-starter);
- **co-located host reads**: ``host_bucket`` = xxhash64(host) mod N is
  deterministic, so all pages of one host live in N-th of each day's
  data — the CEP shuffle keyed by host touches a bounded file set per
  reducer, and a bucket-aware reader can join/aggregate per bucket.

The bucket count N is a layout constant: pick it once (per table) at
roughly (cluster cores × a few) and keep it stable so historical and
new partitions stay mutually bucket-aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOST_BUCKETS = 16


def with_layout_columns(pages: DataFrame, host_buckets: int = HOST_BUCKETS) -> DataFrame:
    """Materialize the partition-transform columns: days(warc_ts) and
    bucket(N, host) — deterministic, content-derived (task-retry-safe,
    same rule as operators/windows.salt_column)."""
    return pages.withColumn("warc_date", F.to_date(F.col("warc_ts"))).withColumn(
        "host_bucket", F.pmod(F.xxhash64(F.col("host")), F.lit(host_buckets))
    )


def write_pages_partitioned(
    pages: DataFrame, path: str, host_buckets: int = HOST_BUCKETS
) -> None:
    """Write the pages table in production layout
    (``warc_date=…/host_bucket=…/`` directories ≙ the Iceberg partition
    spec)."""
    with_layout_columns(pages, host_buckets).write.partitionBy(
        "warc_date", "host_bucket"
    ).mode("overwrite").parquet(path)


def read_pages_range(
    spark: SparkSession,
    path: str,
    start_date: str | None = None,
    end_date: str | None = None,
    host: str | None = None,
    host_buckets: int = HOST_BUCKETS,
) -> DataFrame:
    """Layout-aware read: the date range prunes ``warc_date``
    partitions at planning time; a host lookup first prunes to the one
    ``host_bucket`` that can contain it, then filters within. Both
    predicates are partition-column comparisons — they never touch file
    contents of pruned partitions (PartitionFilters in the scan node,
    asserted by tests)."""
    df = spark.read.parquet(path)
    if start_date:
        df = df.filter(F.col("warc_date") >= F.lit(start_date).cast("date"))
    if end_date:
        df = df.filter(F.col("warc_date") < F.lit(end_date).cast("date"))
    if host is not None:
        bucket = None  # computed with the same deterministic rule
        from pyspark.sql import Row

        bucket = (
            spark.createDataFrame([Row(host=host)])
            .select(F.pmod(F.xxhash64(F.col("host")), F.lit(host_buckets)).alias("b"))
            .first()["b"]
        )
        df = df.filter(F.col("host_bucket") == bucket).filter(F.col("host") == host)
    return df
