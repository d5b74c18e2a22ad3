"""Training-corpus export — sharded JSONL, the lingua franca LLM data
loaders consume (one JSON object per line, directory of shards).

Scale design: rows are serialized JVM-side (``to_json`` over a struct —
no Python), and sharding is the deterministic id-hash bucket (same
content-independent rule as the dataset split and sequence packing), so
a re-export produces byte-identical shard membership and a downstream
loader can address shards stably. ``repartition(n, shard)`` is the one
exchange — unavoidable for bounded shard counts — then each shard
writes as one partition directory of text files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    *,
    n_shards: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``path/_shard=K/*.txt`` JSONL shards.

    Shard = id-hash bucket (stable across runs/engines); every column
    of ``df`` lands in the JSON object. Read back with
    ``read_jsonl_shards``.
    """
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(n_shards),
    ).cast("int")
    (
        df.withColumn("_shard", shard)
        .repartition(n_shards, "_shard")
        .select("_shard", F.to_json(F.struct(*df.columns)).alias("line"))
        .write.mode(mode)
        .partitionBy("_shard")
        .text(path)
    )


def read_jsonl_shards(spark, path: str, schema) -> DataFrame:
    """Round-trip reader: parse each line back with the given schema
    (DDL string or StructType). Shard membership is recoverable from
    the ``_shard=K`` directories via the usual partition column."""
    lines = spark.read.text(path)
    return lines.select(F.from_json(F.col("value"), schema).alias("r")).select("r.*")
