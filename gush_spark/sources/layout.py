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


# ---------------------------------------------------------------------------
# Z-order clustering — multi-dimensional min/max pruning WITHIN a
# partition. Directory partitioning (above) prunes the coarse dims;
# z-ordering the file/row-group layout inside each partition makes
# parquet min/max statistics selective on EVERY clustered dim at once.
# A 1-D sort gives tight file ranges only for its prefix column; bit
# interleaving gives every dim ~sqrt-tight ranges, so a reader
# filtering on either dim skips most files (tests/test_zorder.py
# measures both). At 10^12 pages this is the difference between
# "point query on host touches one bucket's days" and "full scan of
# the day" for the non-prefix dimension.
# ---------------------------------------------------------------------------

def zorder_value(dims: list, bits: int = 16):
    """Interleaved-bit (Morton) value of integer dim columns.

    ``dims`` are Columns already reduced to ``[0, 2^bits)`` integers
    (bucket a string dim with ``pmod(xxhash64(col), 2^bits)``; a
    timestamp with its epoch-day). Pure JVM bit arithmetic — one
    expression, whole-stage codegen, no UDF.
    """
    if bits * len(dims) > 62:
        raise ValueError(
            f"bits*dims = {bits * len(dims)} would interleave into the "
            "long sign bit (>62): negative z-values would split the "
            "Morton curve at the sign boundary — reduce bits per dim"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, col in enumerate(dims):
            bit = F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, i * len(dims) + d)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list,
    *,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` into ``n_files`` z-ordered parquet files.

    ``repartitionByRange`` on the z-value splits the Morton curve into
    contiguous chunks (one range shuffle — the same cost any layout
    rewrite pays), and the within-partition sort keeps row groups
    curve-contiguous so parquet page/row-group stats are tight too.
    The z column itself is dropped — it is layout, not data.
    """
    z = zorder_value(dims, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_oracle_expr(dim_exprs: list[str], bits: int = 8) -> str:
    """ANSI/DuckDB SQL for the identical Morton value (bit-disjoint
    terms summed with ``+``, which equals the Spark side's ``OR``)."""
    terms = [
        f"((({d}) >> {i}) & 1) << {i * len(dim_exprs) + j}"
        for i in range(bits)
        for j, d in enumerate(dim_exprs)
    ]
    return "(" + " + ".join(f"({t})" for t in terms) + ")"


def minmax_scaled(col, lo, hi, bits: int = 8):
    """Scale a numeric dim with known bounds into ``[0, 2^bits)``.

    Z-order needs every dim to FILL its bit range — a 30-day column
    left as 0..29 wastes its high bits and the interleave degenerates
    to a 1-D sort on the other dim. Uniform min/max scaling is the
    simple normalizer (bounds come from table stats / the partition
    being rewritten); for heavily skewed dims use rank buckets
    (approxQuantile boundaries) instead, same contract: ints in
    [0, 2^bits).
    """
    span = max(int(hi) - int(lo), 1)
    top = (1 << bits) - 1
    # clamp: out-of-bounds values (stale stats) would scale to negative
    # or >= 2^bits ints whose sign-extended bits corrupt the interleave
    # for EVERY dim — pin them to the edge cells instead.
    clamped = F.least(F.greatest(col.cast("long"), F.lit(int(lo))), F.lit(int(hi)))
    return F.floor(
        (clamped - F.lit(int(lo))) * F.lit(top) / F.lit(span)
    ).cast("long")


def rendezvous_shard(key_col: str, n_shards: int) -> Column:
    """Rendezvous (highest-random-weight) shard for the string column
    named ``key_col``: the shard s in 0..n_shards−1 maximizing the
    60-bit integer ``md5(key ‖ '|' ‖ s)`` (Thaler & Ravishankar
    1998 — the consistent-placement rule behind cache rings and shard
    maps). Evaluated as a sequential FOLD over the shard range (one
    struct accumulator, strictly-greater replacement ⇒ smallest shard
    wins the astronomically-unlikely tie) — pure JVM codegen,
    n_shards md5s per row, no explode, no shuffle."""
    w = (
        f"CAST(conv(substring(md5(concat({key_col}, '|',"
        " CAST(x AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return F.expr(
        f"aggregate(sequence(0, {int(n_shards) - 1}), "
        "named_struct('w', -1L, 's', -1L), "
        f"(acc, x) -> CASE WHEN {w} > acc.w "
        f"THEN named_struct('w', {w}, 's', CAST(x AS BIGINT)) "
        "ELSE acc END).s"
    )


def rendezvous_rebalance_report(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int = 16,
    n_shards_after: int = 17,
) -> DataFrame:
    """What adding a shard costs under rendezvous hashing:

        (shard, n_docs, n_moved, moved_ppm)

    per CURRENT shard — ``n_moved`` counts keys whose HRW winner
    changes when the ring grows to ``n_shards_after``. HRW's defining
    property (vs mod-N hashing, where ~all keys move): ONLY keys whose
    new-shard weight beats their current winner move, expected
    fraction 1/n_shards_after — this report is the measured proof the
    shard map can grow without a corpus-wide reshuffle, which at
    10^12 documents is the difference between adding capacity and
    rewriting the lake.

    Exactness: weights are the repo's 60-bit md5 integers; the argmax
    fold is deterministic; all outputs BIGINT (moved_ppm truncating).
    Scale shape: map-only per-row folds (n_shards_after md5s/row) +
    one shard-keyed combinable agg — no shuffle beyond the ≤n_shards
    output frame."""
    keyed = df.select(F.col(id_col).cast("string").alias("_rk"))
    out = keyed.select(
        rendezvous_shard("_rk", n_shards).alias("shard"),
        rendezvous_shard("_rk", n_shards_after).alias("_after"),
    )
    return (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (F.col("shard") != F.col("_after")).cast("long")
            ).cast("long").alias("n_moved"),
        )
        .select(
            "shard",
            "n_docs",
            "n_moved",
            F.expr("n_moved * 1000000L DIV n_docs").alias("moved_ppm"),
        )
    )
