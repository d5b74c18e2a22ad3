"""Deterministic sequence packing — assign every document a training
sequence id and an offset so a downstream tokenizer can concatenate
docs into fixed token-budget sequences (the standard concat-and-chunk
pre-training layout) without a driver-side loop.

Semantics: docs are laid out in a deterministic pseudo-random order
(md5 of the id — content-independent, so retry/engine/partitioning
stable, same discipline as the dataset split in
queries_pipeline.dataset_split); each doc starts at the running token
offset within its bucket and belongs to the sequence its FIRST token
falls in (``seq_in_bucket = floor(start_offset / budget)``). A doc that
straddles a boundary is flagged ``split`` — exactly what happens in
concat-and-chunk training, where the tokenizer cuts it at the boundary.

Scale design: packing does not need a global order — only a
deterministic one. Docs are hashed into ``buckets`` independent
streams; each bucket packs with ONE window cumsum (partitionBy bucket,
spill-safe streaming sort), so parallelism = ``buckets`` and no global
sort or single-partition window ever forms. At 100 TB set ``buckets``
to a few × cluster cores; sequence ids are globally unique via
(bucket, seq_in_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# seq_id = bucket * _SEQ_STRIDE + seq_in_bucket; 2^40 sequences per
# bucket ~= 10^12 docs/bucket before overflow — beyond any real bucket
_SEQ_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    *,
    budget: int,
    buckets: int = 32,
) -> DataFrame:
    """Assign (seq_id, seq_offset, split) per doc.

    Output: ``id_col``, ``bucket``, ``seq_id``, ``seq_offset`` (token
    offset of the doc's first token within its sequence), ``n_tokens``,
    ``split`` (doc crosses a sequence boundary). Zero-token docs get
    the sequence at their offset with ``split = false``.
    """
    key = F.md5(F.col(id_col).cast("string"))
    bucket = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"), F.lit(buckets)
    ).cast("long")
    laid = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
        key.alias("_ok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("_start")
    return (
        laid.select(id_col, "n_tokens", "bucket", start)
        .select(
            id_col,
            "n_tokens",
            "bucket",
            (
                F.col("bucket") * F.lit(_SEQ_STRIDE)
                + F.floor(F.col("_start") / budget)
            ).cast("long").alias("seq_id"),
            F.pmod(F.col("_start"), F.lit(budget)).cast("long").alias("seq_offset"),
        )
        .withColumn(
            "split",
            F.col("seq_offset") + F.col("n_tokens") > F.lit(budget),
        )
    )


def materialize_sequences(
    assignment: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    eos: str = "<|eos|>",
) -> DataFrame:
    """Turn a ``pack_sequences`` assignment into actual training rows:
    one row per sequence, docs concatenated in layout order with an
    ``eos`` separator, plus doc/token counts.

    Scale shape: the only text movement is ONE exchange keyed by
    seq_id — the unavoidable cost of physically assembling sequences
    (the assignment itself never moved text). The within-sequence sort
    is bounded by docs-per-sequence (~budget/avg_doc), not corpus size;
    grouping is map-side-combinable on the (bucket-prefixed, already
    well-distributed) seq_id.
    """
    joined = assignment.join(docs.select(F.col(id_col), F.col(text_col)), on=id_col)
    return (
        joined.groupBy("seq_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq_offset", F.col(text_col)))
                    ),
                    lambda s: s[text_col],
                ),
                eos,
            ).alias("sequence_text"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def packing_efficiency_report(
    packed: DataFrame,
    *,
    budget: int,
) -> DataFrame:
    """One-row utilization audit over ``pack_sequences`` output: how
    full the training sequences actually are — the number a pipeline
    owner watches when choosing ``budget`` and bucket count (a low
    fill rate wastes accelerator time on padding; a high split rate
    means documents fragment across sequence boundaries).

    Sequences are identified by (bucket, seq_id); a sequence's used
    tokens are the max(seq_offset + doc tokens) inside it, capped at
    ``budget`` (the final doc of a sequence may spill into the next —
    the spill belongs to the next sequence's fill). All counts are
    BIGINTs; the two rates are single divisions.

    Scale: one (bucket, seq_id)-keyed agg over the packing frame (id
    + longs only), then a global 1-row fold — partial-combinable all
    the way."""
    used = F.least(
        F.max(F.col("seq_offset") + F.col("n_tokens")), F.lit(budget)
    )
    per_seq = packed.groupBy("bucket", "seq_id").agg(
        used.alias("used_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("split").cast("int")).alias("n_split"),
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("used_tokens").alias("used_tokens"),
        (F.count(F.lit(1)) * F.lit(budget)).alias("capacity_tokens"),
        (
            F.sum("used_tokens").cast("double")
            / (F.count(F.lit(1)) * F.lit(budget))
        ).alias("fill_rate"),
        F.sum("n_split").alias("n_split_docs"),
        (
            F.sum("n_split").cast("double") / F.sum("n_docs")
        ).alias("split_rate"),
    )
