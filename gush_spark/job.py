"""Cluster job entrypoint — the GushApp analog (reference:
src/main/scala/gush_example/gush.scala:33-36), packaged for
``spark-submit --py-files`` (north_rule requirement).

Usage (cluster):

    tools/package.sh                       # builds dist/gush_spark.zip
    spark-submit \\
      --py-files dist/gush_spark.zip \\
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
      dist/job.py \\
      --pipeline featurize \\
      --input  s3://bucket/pages/ \\
      --sink   s3://bucket/rollups/ \\
      --checkpoint s3://bucket/ckpt/featurize \\
      [--config gush.yml] [--continuous]

The master, executor sizing, and dynamic allocation come from
spark-submit; this module only applies the engine's semantic confs
(state store, Arrow, timezone — session.ENGINE_CONFS). Resume is the
reference's postRestart analog: re-submit with the same --checkpoint
and the stream continues from committed offsets.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from gush_spark.config import DEFAULT_CONFIG, GushSparkConfig
from gush_spark.session import ENGINE_CONFS
from gush_spark.streaming.metrics import LineageListener
from gush_spark.streaming.pipeline import (
    cep_pipeline,
    curation_stream_pipeline,
    featurize_pipeline,
    latest_state_pipeline,
    link_graph_pipeline,
    pages_pipeline,
    salted_rollup_pipeline,
    sample_pipeline,
)
from gush_spark.streaming.supervisor import run_supervised

PIPELINES = {
    "pages": pages_pipeline,        # extract → windowed counts → sink
    "featurize": featurize_pipeline,  # extract → featurize → rollup → sink
    "cep": cep_pipeline,            # events → stateful CEP → sink
    "salted": salted_rollup_pipeline,  # skew-salted rollup (hot hosts)
    "curation": curation_stream_pipeline,  # extract → dedup → quality/lang gates
    "linkgraph": link_graph_pipeline,  # html → link edges → windowed counts
    "state": latest_state_pipeline,  # change events → latest row per url (CDC)
    "sample": sample_pipeline,      # windowed priority sample (min-k state)
}


def build_cluster_session(app_name: str) -> SparkSession:
    """Session for spark-submit: engine confs only, no master override."""
    builder = SparkSession.builder.appName(app_name)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="gushspark streaming job")
    ap.add_argument("--pipeline", choices=sorted(PIPELINES), default="pages")
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--input-format",
        choices=("parquet", "warc"),
        default="parquet",
        help="pages container: parquet shards or raw WARC archives",
    )
    ap.add_argument("--sink", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", help="YAML job config (GushConfig analog)")
    ap.add_argument("--lineage", help="per-microbatch lineage JSONL path")
    ap.add_argument(
        "--continuous", action="store_true",
        help="run until stopped (default: AvailableNow — drain and exit)",
    )
    ap.add_argument(
        "--max-restarts", type=int, default=0,
        help="supervised mode: restart a failed query from its checkpoint "
             "up to N times (the reference's actor-supervision analog; "
             "0 = fail fast)",
    )
    ap.add_argument(
        "--scrub", action="store_true",
        help="curation pipeline: redact PII from extracted text before "
             "the quality gates (operators/scrub)",
    )
    ap.add_argument(
        "--max-pii", type=int, default=None,
        help="curation pipeline: with --scrub, drop pages with more "
             "than N PII matches",
    )
    ap.add_argument(
        "--bench-keys", default=None,
        help="curation pipeline: parquet of distinct benchmark shingle "
             "md5s (column sk, see operators/decontaminate."
             "benchmark_ngram_keys) — gate out contaminated pages",
    )
    ap.add_argument(
        "--bench-bloom", default=None,
        help="curation pipeline: parquet of a Bloom bitmap (word_idx, "
             "word — operators/decontaminate.benchmark_bloom_bitmap) "
             "for reference sets too big to broadcast exactly; "
             "mutually exclusive with --bench-keys",
    )
    ap.add_argument(
        "--quality-threshold", type=float, default=0.5,
        help="curation pipeline: minimum quality_score to keep a page",
    )
    ap.add_argument(
        "--lang", default="en",
        help="curation pipeline: keep pages whose predicted language "
             "matches (lang-ID is the n-gram stopword profile)",
    )
    ap.add_argument(
        "--fix-encoding", action="store_true",
        help="curation pipeline: repair UTF-8-as-cp1252 mojibake inside "
             "the extraction batch, BEFORE the dedup fingerprint "
             "(functions/encoding; lossless rounds only)",
    )
    ap.add_argument(
        "--lm-ref", default=None,
        help="curation pipeline: parquet of a trusted reference corpus "
             "(doc_id, text) — trains the in-domain bigram LM at startup "
             "(operators/lm.train_bigram_lm) and gates pages on mean "
             "bigram log-probability",
    )
    ap.add_argument(
        "--lm-min-logp", type=float, default=None,
        help="curation pipeline: minimum mean bigram log-probability "
             "under the --lm-ref model to keep a page (requires --lm-ref)",
    )
    ap.add_argument(
        "--gopher-gate", action="store_true",
        help="curation pipeline: additionally gate pages on the seven "
             "published Gopher/MassiveText quality rules "
             "(functions/text_analysis.gopher_rules, Rae et al. 2021 "
             "A1.1) — stateless column expressions fused into the "
             "quality/language projection",
    )
    ap.add_argument(
        "--politeness-quota", type=int, default=None,
        help="cep pipeline: run the crawl-politeness gate instead of the "
             "default machine — at most N fetches per (host, event-time "
             "window), deferred events flagged not dropped "
             "(streaming/cep.make_politeness_rule)",
    )
    ap.add_argument(
        "--anomaly-k", type=int, default=None,
        help="pages/featurize pipelines: after the drain, write a "
             "crawler-trap report (<sink>_anomalies) flagging (host, "
             "window) counts more than K sigma above the host's trailing "
             "baseline (integer-exact z²-test, "
             "operators/trending.volume_anomaly_windows); availableNow "
             "mode only",
    )
    ap.add_argument(
        "--sample-k", type=int, default=None,
        help="sample pipeline: per-window sample size (bounded min-k "
             "state per (window, shard); finalize with "
             "streaming/sampling.finalize_window_sample — the result "
             "provably equals the batch twin)",
    )
    ap.add_argument(
        "--recrawl-topk", type=int, default=None,
        help="cep pipeline: after the drain, write a recrawl schedule "
             "(<sink>_recrawl) — top-K urls by change-rate x staleness "
             "(Cho & Garcia-Molina; pipeline.read_recrawl_priorities); "
             "availableNow mode only",
    )
    args = ap.parse_args(argv)
    if args.max_pii is not None and not args.scrub:
        ap.error("--max-pii requires --scrub (the gate runs on scrubbed text)")
    if args.bench_keys and args.bench_bloom:
        ap.error("--bench-keys and --bench-bloom are mutually exclusive")
    if args.lm_min_logp is not None and not args.lm_ref:
        ap.error("--lm-min-logp requires --lm-ref (the model to score under)")
    if args.sample_k is not None and args.pipeline != "sample":
        ap.error("--sample-k only applies to --pipeline sample")
    if args.politeness_quota is not None and args.pipeline != "cep":
        ap.error("--politeness-quota only applies to --pipeline cep")
    if args.input_format == "warc" and args.pipeline in ("cep", "state"):
        ap.error("--input-format warc applies to page pipelines, not "
                 "cep/state (they consume the page_events change stream)")
    if args.anomaly_k is not None:
        if args.pipeline not in ("pages", "featurize"):
            ap.error("--anomaly-k only applies to --pipeline pages/featurize")
        if args.continuous:
            ap.error("--anomaly-k is a post-drain report (availableNow only)")
    if args.recrawl_topk is not None:
        if args.pipeline != "cep":
            ap.error("--recrawl-topk only applies to --pipeline cep")
        if args.continuous:
            ap.error("--recrawl-topk is a post-drain report (availableNow only)")
    if args.pipeline != "curation":
        for flag, val, default in (
            ("--scrub", args.scrub, False),
            ("--max-pii", args.max_pii, None),
            ("--bench-keys", args.bench_keys, None),
            ("--bench-bloom", args.bench_bloom, None),
            ("--quality-threshold", args.quality_threshold, 0.5),
            ("--lang", args.lang, "en"),
            ("--fix-encoding", args.fix_encoding, False),
            ("--lm-ref", args.lm_ref, None),
            ("--lm-min-logp", args.lm_min_logp, None),
            ("--gopher-gate", args.gopher_gate, False),
        ):
            if val != default:
                ap.error(f"{flag} only applies to --pipeline curation")

    config = (
        GushSparkConfig.from_yaml(args.config) if args.config else DEFAULT_CONFIG
    )
    if args.input_format != "parquet":
        import dataclasses

        config = dataclasses.replace(config, input_format=args.input_format)
    spark = build_cluster_session(f"gushspark_{args.pipeline}")
    listener = LineageListener(args.lineage) if args.lineage else None
    if listener:
        spark.streams.addListener(listener)

    pipeline = PIPELINES[args.pipeline]
    kwargs = dict(
        config=config,
        available_now=not args.continuous,
    )
    if args.pipeline in ("pages", "cep", "linkgraph", "state", "sample") \
            and args.lineage:
        kwargs["lineage_path"] = args.lineage
    if args.politeness_quota is not None:
        kwargs["politeness_quota"] = args.politeness_quota
    if args.pipeline == "sample" and args.sample_k is not None:
        kwargs["sample_k"] = args.sample_k
    if args.pipeline == "curation":
        kwargs["quality_threshold"] = args.quality_threshold
        kwargs["lang"] = args.lang
        if args.fix_encoding:
            kwargs["fix_encoding"] = True
        if args.gopher_gate:
            kwargs["gopher_gate"] = True
        if args.scrub:
            kwargs["scrub"] = True
            kwargs["max_pii"] = args.max_pii
        if args.bench_keys:
            kwargs["bench_keys"] = spark.read.parquet(args.bench_keys)
        if args.bench_bloom:
            kwargs["bench_bitmap"] = spark.read.parquet(args.bench_bloom)
        if args.lm_ref:
            from gush_spark.operators.lm import train_bigram_lm

            ref = spark.read.parquet(args.lm_ref)
            kwargs["lm_model"] = train_bigram_lm(ref, "doc_id", "text")
            if args.lm_min_logp is not None:
                kwargs["lm_min_logp"] = args.lm_min_logp
    def start():
        return pipeline(
            spark,
            args.input,
            sink_path=args.sink,
            checkpoint_path=args.checkpoint,
            **kwargs,
        )

    if args.max_restarts > 0:
        _query, sink, _n_restarts = run_supervised(
            start, max_restarts=args.max_restarts, lineage_path=args.lineage
        )
    else:
        query, sink = start()
        query.awaitTermination()
    if args.anomaly_k is not None:
        from gush_spark.streaming.pipeline import read_host_anomalies

        report = read_host_anomalies(spark, sink, k_sq=args.anomaly_k**2)
        report.write.mode("overwrite").parquet(f"{args.sink}_anomalies")
    if args.recrawl_topk is not None:
        from gush_spark.streaming.pipeline import read_recrawl_priorities

        schedule = read_recrawl_priorities(spark, sink, k=args.recrawl_topk)
        schedule.write.mode("overwrite").parquet(f"{args.sink}_recrawl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
