"""Hot-bucket defense for bucketed self-joins (LSH bands, sign buckets).

A bucketed self-join is quadratic PER BUCKET: a boilerplate-heavy crawl
(cookie banners, parked domains) can put millions of pages into one LSH
bucket and turn the "sublinear" candidate join into a single-reducer
O(n²) stage. The cheap insurance is a cap: count bucket sizes (one extra
agg over a table that is being shuffled on those keys anyway), drop
rows belonging to oversize buckets from the join, and surface what was
dropped — capped buckets are a recall trade, never a silent one.

Why cap instead of salt: salting a self-join bucket still produces all
n² pairs (split across salt cells), so it fixes the reducer skew but not
the quadratic work. For near-dup candidates, a bucket bigger than
``max_bucket`` carries almost no information anyway (everything in it is
boilerplate-similar); production pipelines cap and route the hot bucket
to a cheaper representative-based path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_buckets(df: DataFrame, bucket_cols: list[str], max_bucket: int) -> DataFrame:
    """Buckets with more than ``max_bucket`` members: (bucket_cols...,
    _bucket_size). One partial-aggregated count keyed like the join."""
    return (
        df.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_bucket_size"))
        .filter(F.col("_bucket_size") > max_bucket)
    )


def cap_hot_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    max_bucket: int | None,
    capped_stats: dict | None = None,
) -> DataFrame:
    """Drop rows in buckets larger than ``max_bucket`` before a
    self-join. No-op when ``max_bucket`` is None.

    The anti-join shuffles on the same keys as the downstream self-join
    (co-partitioned; AQE broadcasts the small hot-bucket side). When
    ``capped_stats`` (a dict) is passed, it is filled EAGERLY with
    ``{"n_capped_buckets", "n_capped_rows", "max_bucket"}`` — tests and
    batch callers get the no-silent-truncation accounting; streaming /
    lazy callers pass None and read the same numbers from ``hot_buckets``
    themselves (e.g. into an observe() metric)."""
    if max_bucket is None:
        return df
    hot = hot_buckets(df, bucket_cols, max_bucket)
    if capped_stats is not None:
        # pay the bucket-count aggregation ONCE: collect the (small)
        # hot-bucket list for the stats, then anti-join against it as a
        # broadcast literal instead of re-running the aggregation inside
        # the anti-join on every downstream action
        rows = hot.collect()
        capped_stats.update(
            n_capped_buckets=len(rows),
            n_capped_rows=int(sum(r["_bucket_size"] for r in rows)),
            max_bucket=max_bucket,
        )
        if not rows:
            return df
        hot = F.broadcast(
            df.sparkSession.createDataFrame(rows, schema=hot.schema)
        )
    return df.join(hot.select(*bucket_cols), on=bucket_cols, how="left_anti")
