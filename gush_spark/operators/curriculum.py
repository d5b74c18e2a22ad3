"""Curriculum ordering — an EXACT global training order over the
corpus without a global sort: the distributed-ordinal pattern
(bucket → local rank → offset), the same trick Spark's own
RangePartitioner + zipWithIndex composition plays, expressed in pure
DataFrame ops so Catalyst sees it.

Why it exists: "train short-to-long" (length curriculum; Bengio et al.
ICML 2009 generalized) needs every document's global position in a
deterministic total order. The naive ``row_number() OVER (ORDER BY
...)`` is the classic scale trap — an unpartitioned window plans an
Exchange SinglePartition and one task sorts the corpus. Here:

1. value-range bucket, map-only: ``bucket = least(key div width,
   n_buckets-1)`` — every row in bucket b orders strictly before
   every row in bucket b+1 because the bucket is a monotone function
   of the LEADING sort key (ties on the key stay in one bucket, so
   the tie-break never crosses a boundary);
2. local rank: ``row_number`` partitioned BY BUCKET over
   (key, id) — each bucket sorts independently, in parallel;
3. offsets: cumulative counts over the ≤ n_buckets-row bucket-count
   frame (the only unpartitioned window, over KBs, exactly like the
   1-row scalar joins in recrawl/DSIR), broadcast back;
   ``rank = offset + local_rank``.

Fixed-WIDTH buckets are the honest sandbox choice (deterministic,
zero extra passes); a production run on a skewed key samples range
boundaries first (the RangePartitioner move) — same plan shape, one
extra reduced pass, documented rather than silently assumed. The
``phase`` column cuts the global rank into ``n_phases`` equal bands
(BIGINT arithmetic) — the curriculum schedule a trainer consumes.

No reference analog (gush has no ordering concern); driver-brief
training-pipeline surface, the ORDER complement of sequence packing
(which concatenates) and mixture_resample (which reweights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "n_chars",
    *,
    bucket_width: int = 256,
    n_buckets: int = 64,
    n_phases: int = 3,
) -> DataFrame:
    """(id, key, rank, phase): ``rank`` is the exact 1-based position
    in the total order (key asc, id asc) — equal to the single-sort
    ``row_number() OVER (ORDER BY key, id)`` for every row, computed
    without ever materializing a single-partition sort of the corpus;
    ``phase = (rank-1)·n_phases div total`` (exact BIGINT bands).
    Null keys order first (bucket 0), matching SQL NULLS FIRST there —
    callers with NULLs and strict parity needs should filter them."""
    b = F.least(
        (F.col(key_col) / F.lit(int(bucket_width))).cast("long"),
        F.lit(int(n_buckets) - 1),
    )
    bucketed = docs.select(
        F.col(id_col), F.col(key_col), F.coalesce(b, F.lit(0)).alias("_b")
    )
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # cumulative offsets + grand total over the ≤ n_buckets-row frame:
    # the ONLY unpartitioned windows, over KBs (never the corpus)
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_n").over(
            Window.orderBy("_b").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    w_local = Window.partitionBy("_b").orderBy(key_col, id_col)
    ranked = bucketed.withColumn(
        "_lr", F.row_number().over(w_local).cast("long")
    )
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .select(
            id_col,
            key_col,
            (F.col("_off") + F.col("_lr")).alias("rank"),
            F.expr(f"(_off + _lr - 1) * {int(n_phases)} div _total").alias(
                "phase"
            ),
        )
    )


def interleave_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    *,
    bucket_width: int = 8,
    n_buckets: int = 64,
    n_phases: int = 3,
) -> DataFrame:
    """Balanced round-robin training order — the ANTI-curriculum: where
    :func:`curriculum_order` sorts the corpus by a difficulty key,
    this interleaves strata so every stretch of the training stream
    carries every source/language (the shard-interleave every
    multi-source pretraining run performs so the optimizer never sees
    a million consecutive pages from one crawl).

    Definition: ``depth`` = the document's 1-based rank WITHIN its
    stratum (md5-of-id order — content-independent and stable under
    adding/removing other strata, the stratified-sampling rule);
    global order = (depth ASC, id ASC). All depth-1 docs (one per
    stratum) come first, then every depth-2 doc, ... — exact
    round-robin, degrading gracefully when strata have unequal sizes
    (exhausted strata simply drop out at their depth).

    Returns ``(id, stratum, depth, rank, phase)`` where ``rank`` is
    the exact 1-based global position and ``phase`` the equal BIGINT
    band — both computed by :func:`curriculum_order` over the integer
    ``depth`` key, so the global ordinal costs one stratum-keyed
    window plus the bucketed two-phase ordinal, never a global sort.

    Scale shape: one exchange keyed by stratum (the depth window),
    then curriculum_order's map-only bucket + per-bucket rank + KB
    offset join. ``bucket_width`` buckets the DEPTH key: width 8 and
    64 buckets cover depth ≤ 512 exactly and clamp deeper docs into
    the last bucket (still exact — ties stay in-bucket); size them to
    max-stratum-depth / n_buckets for mega-corpora."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        F.row_number().over(w).cast("long").alias("depth"),
    )
    ordered = curriculum_order(
        ranked,
        id_col=id_col,
        key_col="depth",
        bucket_width=bucket_width,
        n_buckets=n_buckets,
        n_phases=n_phases,
    )
    return ordered.join(
        ranked.select(id_col, stratum_col), on=id_col
    ).select(id_col, stratum_col, "depth", "rank", "phase")
