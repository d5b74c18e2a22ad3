#!/usr/bin/env python
"""100x scale probe for the five heaviest operator families (VERDICT r4
item #4). The 10x probe (tools/smoke_10x.py) catches quadratic
blowups; this one exists for the log-linear-with-big-constant surprises
and shuffle-spill cliffs that only show up another order of magnitude
out — 500k documents / 200k embeddings, the largest corpus this sandbox
can hold in reasonable wall time.

Fixture (one-off, /tmp, NOT committed): the 10x probe's variant
construction at 100 variants, built in a single pass (range crossJoin +
one parameterized regexp_replace — a 100-way union would bloat the
plan). Variant 0 is the original sf0.1 corpus; variant j>0 suffixes
every content word (length >= 4) with j, so variant families share
(almost) no shingles and the corpus is ~100 independent copies of the
original near-dup structure — a LINEAR operator shows ~100x work.
Embeddings get a deterministic per-(id, coord, j) offset so variant
families are cosine-disjoint.

Probed families and their scale knobs:
- containment (``containment_pairs_hashed``, catalog params): verified
  pairs scale ~100x with the fixture structure.
- spans/winnowing (``duplicate_span_report``, ``winnowed_dup_report``,
  catalog params): digests-only shuffles, expected ~linear.
- frequent phrases (``frequent_phrases_hashed``, catalog params).
- SemDeDup (``semantic_dup_clusters`` with k ∝ N, the paper's recipe —
  constant per-cell size keeps the within-cell pair stage linear; the
  N x k coarse-assignment term is the known super-linear component and
  is reported as such, see README).
- IVF-PQ (``ivfpq_topk`` with n_cells ∝ sqrt(N)-ish so cells stay
  ~250 vectors): build + probe timed together here (the bench's
  ann_index section splits them at 1x).

Timing: min of 2 runs at BOTH scales after a discarded 1x warm-up
(same convention as smoke_10x — this host throttles in multi-second
windows; min-of-2 is the quiet-host figure). Pass query names as extra
argv to probe a subset.

Usage: python tools/smoke_100x.py [sf_dir] [out_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_VARIANTS = 100

CATALOG = [
    "containment_pairs_hashed",
    "duplicate_span_report",
    "winnowed_dup_report",
    "frequent_phrases_hashed",
]
SCALED = ["semantic_dup_clusters", "ann_topk_ivfpq"]


def build_fixture(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    done = Path(out_dir) / "_DONE"
    if done.exists():
        return
    variants = (
        spark.range(N_VARIANTS).select(F.col("id").alias("variant")).coalesce(1)
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    (
        docs.crossJoin(F.broadcast(variants))
        .select(
            (F.col("doc_id") + F.col("variant") * n).alias("doc_id"),
            F.when(F.col("variant") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S{4,})"),
                    F.concat(F.lit("$1"), F.col("variant").cast("string")),
                )
            )
            .alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ne = emb.count()
    (
        emb.crossJoin(F.broadcast(variants))
        .select(
            (F.col("vec_id") + F.col("variant") * ne).alias("vec_id"),
            F.when(F.col("variant") == 0, F.col("embedding"))
            .otherwise(
                F.expr(
                    "transform(embedding, (x, i) -> x + sin(cast("
                    "vec_id * 37 + i * 13 + variant * 101 as double)) * 2.0)"
                )
            )
            .alias("embedding"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )
    done.touch()


def probe_fns(spark):
    """name -> (sf_dir -> (wall_s, rows)) single-run callables."""
    from pyspark.sql import functions as F

    from gush_spark.operators import pq as pq_ops
    from gush_spark.operators.similarity import semantic_dup_clusters
    from gush_spark.queries import all_queries

    qs = all_queries()

    def catalog(name):
        def run(sf: str):
            t0 = time.perf_counter()
            rows = qs[name](spark, sf).count()
            return time.perf_counter() - t0, rows
        return run

    def sem(sf: str):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        n = emb.count()
        k = max(8, int((n / 45)))  # k ∝ N: per-cell size pinned at ~45
        t0 = time.perf_counter()
        clusters, assignments, _ = semantic_dup_clusters(
            emb, threshold=0.4, n_cells=k, iters=1, spread=None
        )
        rows = clusters.count()
        assignments.unpersist()
        return time.perf_counter() - t0, rows

    def ivfpq(sf: str):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        n = emb.count()
        cells = max(8, n // 250)  # cells ∝ N: ~250 vectors per cell
        queries_df = emb.filter(F.col("vec_id") < 8)
        t0 = time.perf_counter()
        rows = pq_ops.ivfpq_topk(
            emb, queries_df, n_cells=cells, cell_iters=1, pq_iters=1,
            n_probe=2, k=5, dim=64, spread=None,
        ).count()
        return time.perf_counter() - t0, rows

    fns = {name: catalog(name) for name in CATALOG}
    fns["semantic_dup_clusters"] = sem
    fns["ann_topk_ivfpq"] = ivfpq
    return fns


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/smoke100x"
    names = sys.argv[3:] or (CATALOG + SCALED)
    from gush_spark.session import build_session

    spark = build_session("smoke_100x", cores=32, shuffle_partitions=128)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    build_fixture(spark, sf_dir, out_dir)
    print(f"fixture ready in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    fns = probe_fns(spark)
    results = {}
    for name in names:
        fns[name](sf_dir)  # discarded warm-up (JIT + scan cache)
        base = min((fns[name](sf_dir) for _ in range(2)), key=lambda r: r[0])
        big = min((fns[name](out_dir) for _ in range(2)), key=lambda r: r[0])
        results[name] = (base, big)
        (bt, br), (gt, gr) = base, big
        print(
            f"| {name} | {br} | {gr} | {gr / max(br, 1):.2f}x "
            f"| {bt:.1f} | {gt:.1f} | {gt / max(bt, 0.1):.1f}x |",
            flush=True,
        )

    print("\n| query | 1x rows | 100x rows | rows ratio "
          "| 1x wall s | 100x wall s | wall ratio |")
    print("|---|---|---|---|---|---|---|")
    for name, ((bt, br), (gt, gr)) in results.items():
        print(
            f"| {name} | {br} | {gr} | {gr / max(br, 1):.2f}x "
            f"| {bt:.1f} | {gt:.1f} | {gt / max(bt, 0.1):.1f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
