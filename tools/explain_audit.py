#!/usr/bin/env python
"""Physical-plan audit — asserts the plans are the plans we designed.

Checks, per representative query:
- filters reach the parquet scan (PushedFilters non-empty where expected);
- scans read only needed columns (ReadSchema pruned);
- dimension/query-set joins are BroadcastHashJoin, never SortMergeJoin;
- the extraction UDF sits ABOVE the source filters (ArrowEvalPython after
  Filter in the plan — gush's prefilter-then-parse ordering);
- whole-stage codegen covers the aggregation pipelines.

Run: python tools/explain_audit.py [sf_dir]  → PASS/FAIL lines, exit 1
on any failure. This is the scale-shape regression gate: a refactor that
silently turns a broadcast join into a shuffle join or lifts a filter
above the UDF fails here long before it burns a cluster.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FAILURES = []


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, cond: bool, detail: str = "") -> None:
    if cond:
        print(f"PASS {name}")
    else:
        print(f"FAIL {name} {detail}")
        FAILURES.append(name)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from gush_spark.config import GushSparkConfig
    from gush_spark.operators import joins
    from gush_spark.queries import load
    from gush_spark.session import build_session
    from gush_spark.streaming.pipeline import extracted_pages
    from gush_spark.streaming.source import read_pages_batch

    spark = build_session("explain_audit")

    # 1. filter pushdown + column pruning on a plain filtered projection
    ev = load(spark, sf_dir, "events")
    q = ev.filter(F.col("event_type") == "view").select("event_id", "user_id")
    p = plan_of(q)
    check("pushdown.filter_reaches_scan",
          re.search(r"PushedFilters: \[.*event_type.*\]", p) is not None, p[-400:])
    check("pruning.read_schema_minimal",
          "ReadSchema" in p and "value" not in re.search(r"ReadSchema: ([^\n]*)", p).group(1),
          re.search(r"ReadSchema: ([^\n]*)", p).group(1) if "ReadSchema" in p else "no scan")

    # 2. broadcast dim join stays broadcast (J2)
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    j = joins.enrich_with_dim(
        orders, nation.withColumnRenamed("n_nationkey", "o_custkey"), on="o_custkey"
    )
    p = plan_of(j)
    check("join.dim_is_broadcast", "BroadcastHashJoin" in p and "SortMergeJoin" not in p)

    # 3. extraction UDF above the source filters (prefilter-then-parse)
    cfg = GushSparkConfig(ignored_hosts=("ignored.example",))
    import tempfile

    from gush_spark.sources.fixtures import generate_pages

    pages_dir = Path(tempfile.mkdtemp(prefix="audit_pages_")) / "pages"
    generate_pages(pages_dir, n_pages=50, n_hosts=5)
    pages = read_pages_batch(spark, str(pages_dir))
    ext = extracted_pages(pages, cfg).select("url", "extracted_text")
    p = plan_of(ext)
    arrow_pos = p.find("ArrowEvalPython")
    filter_pos = p.find("Filter")
    check("udf.filters_below_extraction",
          arrow_pos != -1 and filter_pos != -1,
          f"arrow@{arrow_pos} filter@{filter_pos}")
    if arrow_pos != -1 and filter_pos != -1:
        # formatted plans print top-down: the UDF node must appear ABOVE
        # (= earlier than) the filter only if it consumes it... verify via
        # the numbered tree: Filter's id must be larger (deeper) than
        # ArrowEvalPython's input
        m_arrow = re.search(r"\((\d+)\) ArrowEvalPython", p)
        m_filter = re.search(r"\((\d+)\) Filter", p)
        check("udf.order_filter_then_udf",
              m_arrow is not None and m_filter is not None
              and int(m_filter.group(1)) < int(m_arrow.group(1)),
              f"filter node {m_filter.group(1) if m_filter else '?'} vs "
              f"arrow node {m_arrow.group(1) if m_arrow else '?'}")

    # 4. whole-stage codegen spans the agg pipeline
    from gush_spark.operators import windows

    agg = windows.windowed_count(ev, "ts", "10 minutes", "event_type")
    p = plan_of(agg)
    # map-side combine: partial + final HashAggregate around ONE exchange
    # (un-executed AQE plans don't print WholeStageCodegen spans; the
    # aggregate shape is the scale-relevant property)
    n_agg = len(re.findall(r"\(\d+\) HashAggregate", p))
    n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    check("agg.partial_then_final", n_agg == 2 and n_ex == 1,
          f"HashAggregate x{n_agg}, Exchange x{n_ex}")

    # 5. ANN query-set broadcast (scored corpus never shuffles)
    from gush_spark.operators.similarity import brute_force_topk

    vecs = load(spark, sf_dir, "embeddings")
    topk = brute_force_topk(vecs, vecs.filter(F.col("vec_id") < 8), k=5)
    p = plan_of(topk)
    check("join.ann_queries_broadcast",
          "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p)

    # 6. salted agg is two HashAggregate stages with one exchange between
    salted = windows.salted_agg(
        ev.withColumn("value_dec", F.col("value").cast("decimal(18,2)")),
        keys=["user_id"], agg_exprs={"n": "count(*)", "s": "sum(value_dec)"},
        salt_on="event_id",
    )
    p = plan_of(salted)
    check("skew.salted_two_stage", p.count("HashAggregate") >= 3)  # partial+final x2 stages

    # 7. top-k is distributed partial top-k (TakeOrderedAndProject), not a
    # global sort through one reducer; the only Sort/Window allowed is the
    # k-row re-rank ABOVE the limit
    from gush_spark.queries import all_queries

    topk = all_queries()["top_users"](spark, sf_dir)
    p = plan_of(topk)
    check("topk.take_ordered_and_project", "TakeOrderedAndProject" in p, p[-400:])
    check("topk.no_global_sort",
          re.search(r"\(\d+\) Sort\b", p) is None
          and "Exchange SinglePartition" not in p,
          "a full sort / single-partition exchange feeds the limit")

    # 7b. per-group top-k: the rank filter must be pushed into a
    # Partial WindowGroupLimit BELOW the exchange (the shuffle then
    # carries <= k rows per group per input partition, not the table)
    gk = all_queries()["top_docs_per_source"](spark, sf_dir)
    p = plan_of(gk)
    # A Partial-mode WindowGroupLimit only exists pre-shuffle (that is
    # what Partial means); requiring BOTH modes pins the pushdown
    # without parsing node positions out of the formatted plan.
    check("topk.window_group_limit",
          re.search(r"WindowGroupLimit.*Partial", p, re.S) is not None
          and re.search(r"WindowGroupLimit.*Final", p, re.S) is not None,
          "missing Partial+Final WindowGroupLimit pair")

    # 8. multi-probe ANN: the probe fan-out stays on the (broadcast)
    # query side — the corpus bucket join must be a broadcast hash join,
    # and the only explode feeds the query side, never the corpus
    from gush_spark.operators.similarity import lsh_topk_multiprobe

    mp = lsh_topk_multiprobe(vecs, vecs.filter(F.col("vec_id") < 8), k=5)
    p = plan_of(mp)
    check("ann.multiprobe_broadcast_join",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p)
    check("ann.multiprobe_single_generate", p.count("Generate") <= 2,
          f"explode nodes: {p.count('Generate')}")

    # 9. as-of join is the union-merge form: exactly one key Exchange
    # feeding one Window, and NO join node anywhere in the plan
    from gush_spark.operators.joins import as_of_join

    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").alias("v"))
        .select("user_id", F.col("ts").alias("p_ts"), "v")
    )
    asof = as_of_join(
        ev.select("event_id", "user_id", "ts"), purchases,
        key="user_id", left_ts="ts", right_ts="p_ts", carry=["p_ts", "v"],
    )
    p = plan_of(asof)
    check("asof.no_join_node", "Join" not in p, "a join node appeared")
    n_win_ex = len(re.findall(r"hashpartitioning\(_k", p))
    check("asof.single_key_exchange", n_win_ex == 1,
          f"key exchanges: {n_win_ex}")

    # 10. dedup sketches at scale defaults (spread=0): the ONLY exchange
    # is the hash-agg shuffle keyed on doc id carrying sketch partials —
    # no RoundRobin repartition of the raw-text DataFrame, and no
    # Exchange whose input rows still contain the text column
    from gush_spark.operators import dedup as dedup_ops

    docs = load(spark, sf_dir, "documents")

    def rawtext_exchange(p: str) -> str | None:
        if "RoundRobinPartitioning" in p:
            return "RoundRobinPartitioning (raw repartition) in plan"
        for m in re.finditer(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p):
            if "text#" in m.group(1):
                return f"text column crosses an Exchange: {m.group(1)[:120]}"
        return None

    for qname, q in (
        ("minhash", dedup_ops.minhash_signatures(docs, "doc_id", "text")),
        ("simhash", dedup_ops.simhash32(docs, "doc_id", "text")),
    ):
        p = plan_of(q)
        bad = rawtext_exchange(p)
        check(f"dedup.{qname}_spread0_no_rawtext_exchange", bad is None, bad or "")

    # 11. round-3 curation passes keep their scale shapes
    from gush_spark.operators.decontaminate import ngram_overlap
    from gush_spark.operators.packing import pack_sequences
    from gush_spark.operators.scrub import scrub_pii
    from gush_spark.operators.trending import (
        top_terms_per_window,
        windowed_term_counts,
    )

    p = plan_of(scrub_pii(docs, "doc_id", "text"))
    check("scrub.zero_shuffle", "Exchange" not in p, "scrub plan shuffles")

    bench = docs.filter(F.col("doc_id") % 50 == 0)
    p = plan_of(ngram_overlap(docs, bench, "doc_id", "text"))
    check(
        "decontaminate.bench_broadcast",
        "BroadcastHashJoin" in p and p.count("SortMergeJoin") <= 1,
        "benchmark membership test not broadcast",
    )

    sized = docs.select("doc_id", F.length("text").cast("long").alias("n_tokens"))
    p = plan_of(pack_sequences(sized, "doc_id", "n_tokens", budget=512, buckets=8))
    check(
        "packing.no_single_partition",
        "SinglePartition" not in p,
        "global-sort window in packing plan",
    )

    ts_docs = docs.withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") * 60)
    )
    p = plan_of(
        top_terms_per_window(
            windowed_term_counts(
                ts_docs, ts_col="ts", text_col="text", window_duration="1 hour"
            ),
            5,
        )
    )
    check(
        "trending.window_group_limit",
        "WindowGroupLimit" in p,
        "top-k rank filter not pushed to WindowGroupLimit",
    )

    # round-4 operators: bloom probe broadcasts the bitmap; chunking is
    # map-only; the signature-only verify never reads text columns
    from gush_spark.operators.bloom import bloom_build, bloom_probe
    from gush_spark.operators.chunking import chunk_documents
    from gush_spark.operators.dedup import minhash_estimate_pairs

    docs = load(spark, sf_dir, "documents")
    keys = docs.select(F.md5("text").alias("key"))
    p = plan_of(bloom_probe(bloom_build(keys, "key"), keys, "key"))
    check("bloom.probe_bitmap_broadcast",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p,
          "bitmap not broadcast")
    p = plan_of(chunk_documents(docs, "doc_id", "text"))
    check("chunking.zero_shuffle", "Exchange" not in p, "chunking shuffles")
    p = plan_of(minhash_estimate_pairs(docs, "doc_id", "text", spread=None))
    # the verify joins must carry signature longs, not the text column:
    # `text` may appear only under scans/minhash aggs, never in a join
    join_lines = [ln for ln in p.splitlines() if "Join" in ln]
    check("estimate.no_text_in_verify_join",
          join_lines and not any("text" in ln for ln in join_lines),
          "text column crossed the verify join")

    # duplicate-span profile: the token-window explosion (the expensive
    # interpreted map stage) must run exactly once, and the partial agg
    # must sit BELOW the first exchange so only reduced (digest, doc)
    # pairs ever shuffle
    from gush_spark.operators.spans import duplicate_spans

    p = plan_of(duplicate_spans(docs, "doc_id", "text"))
    n_gen = len(re.findall(r"\+- Generate ", p))
    check("spans.single_generate", n_gen == 1,
          f"expected 1 Generate tree node, saw {n_gen}")
    first_exchange = p.find("Exchange")
    check("spans.partial_agg_below_first_exchange",
          first_exchange != -1 and "partial_count" in p[first_exchange:],
          "raw window stream reached an exchange un-combined")

    # span removal: same single-explosion discipline, and the final
    # text-bearing join is keyed by the doc id (the only shuffle that
    # may carry text)
    from gush_spark.operators.spans import remove_duplicate_spans

    p = plan_of(remove_duplicate_spans(docs, "doc_id", "text"))
    n_gen = len(re.findall(r"\+- Generate ", p))
    check("spans.removal_single_generate", n_gen == 1,
          f"expected 1 Generate tree node, saw {n_gen}")

    # round-4 second wave: LM likelihood, DSIR importance, keep-best
    # canonical selection
    from gush_spark.operators import importance as importance_ops
    from gush_spark.operators import lm as lm_ops
    from gush_spark.operators.dedup import best_per_cluster

    # LM scoring: raw text must never cross an exchange (gram keys are
    # built map-only; the only text-bearing stages are scans)
    ref = docs.filter(F.col("lang") == "en")
    model, lm_ctx, vocab = lm_ops.train_bigram_lm(ref, "doc_id", "text")
    p = plan_of(
        lm_ops.score_with_bigram_lm(docs, model, lm_ctx, vocab, "doc_id", "text")
    )
    bad = rawtext_exchange(p)
    check("lm.no_rawtext_exchange", bad is None, bad or "")

    # DSIR scoring: the fitted counts table and totals are broadcast
    # (scoring = broadcast join + per-doc agg; no bucket-keyed shuffle
    # join), and no raw text crosses an exchange
    counts, tot = importance_ops.fit_bucket_distributions(
        docs, F.col("lang") == "en", "doc_id", "text"
    )
    p = plan_of(
        importance_ops.importance_scores(docs, counts, tot, "doc_id", "text")
    )
    check("dsir.counts_broadcast_join",
          "BroadcastHashJoin" in p and "BroadcastNestedLoopJoin" in p,
          "expected broadcast counts join + broadcast totals cross join")
    bad = rawtext_exchange(p)
    check("dsir.no_rawtext_exchange", bad is None, bad or "")
    counts.unpersist()

    # repetition scores: gram construction is map-only (no per-doc
    # window, no position exchange) — exactly the two agg exchanges
    from gush_spark.operators.repetition import repetition_scores

    p = plan_of(repetition_scores(docs, "doc_id", "text"))
    n_ex = len(re.findall(r"\) Exchange", p))
    check("repetition.two_exchanges_no_window",
          n_ex == 2 and ") Window" not in p,
          f"expected 2 exchanges / 0 windows, saw {n_ex} / "
          f"{p.count(') Window')}")

    # keep-best canonical selection: the rank-1 filter must plan as
    # WindowGroupLimit (per-partition top-1 below the exchange), one
    # cluster-keyed shuffle total
    clusters = docs.select("doc_id", (F.col("doc_id") % 50).alias("cluster_id"))
    scored = docs.select("doc_id", F.length("text").cast("double").alias("s"))
    p = plan_of(best_per_cluster(clusters, scored, "doc_id", "s"))
    check("canonical.window_group_limit", "WindowGroupLimit" in p,
          "rank-1 filter did not plan as WindowGroupLimit")

    # round-4 third wave: embedding-space curation (SemDeDup family).
    from gush_spark.operators import similarity as sim_ops

    def vec_exchange(p: str) -> str | None:
        for m in re.finditer(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p):
            if "embedding#" in m.group(1):
                return f"embedding array crosses an Exchange: {m.group(1)[:120]}"
        return None

    emb = load(spark, sf_dir, "embeddings")

    # cosine decontamination: bench side broadcast (the corpus is the
    # 10^12 side), scoring map-only — embedding arrays never shuffle;
    # only (id, cos) rows reach the per-id max exchange
    bench_v = emb.filter(F.col("vec_id") % 25 == 0)
    p = plan_of(sim_ops.cosine_contamination_report(emb, bench_v))
    check("semantic.bench_broadcast",
          "BroadcastNestedLoopJoin" in p
          and not any(j in p for j in (
              "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
              "CartesianProduct")),
          "expected ONLY the broadcast bench join (no corpus rejoin)")
    bad = vec_exchange(p)
    check("semantic.decontaminate_no_vector_exchange", bad is None, bad or "")

    # SemDeDup pair stage: the quadratic compare must be a CELL-keyed
    # equi-join (hashpartitioning on the kmeans cell) — never a global
    # cross/nested-loop join over the corpus
    edges, assignments, _ = sim_ops.semantic_edges(
        emb, n_cells=16, iters=1, spread=None
    )
    p = plan_of(edges)
    check("semantic.pair_join_cell_keyed",
          "hashpartitioning(cell" in p
          and "BroadcastNestedLoopJoin" not in p
          and "CartesianProduct" not in p,
          "within-cell pair join is not a cell-keyed equi-join")
    # keyword extraction: tokenization is map-only (raw text never
    # crosses an exchange — only (doc, term, count) partials shuffle)
    # and the per-doc top-k plans as WindowGroupLimit
    from gush_spark.operators import keywords as kw_ops

    p = plan_of(kw_ops.tfidf_top_terms(docs, max_df_frac=0.9))
    bad = rawtext_exchange(p)
    check("keywords.tfidf_no_rawtext_exchange", bad is None, bad or "")
    check("keywords.tfidf_window_group_limit", "WindowGroupLimit" in p,
          "top-k rank filter not pushed to WindowGroupLimit")
    p = plan_of(kw_ops.bm25_top_terms(docs, max_df_frac=0.9))
    bad = rawtext_exchange(p)
    check("keywords.bm25_no_rawtext_exchange", bad is None, bad or "")

    # quantized k-means assignment stays codegen: zip_with may appear
    # only as per-ROW norm folds (self-dot) and the per-candidate-PAIR
    # verify — never the vector×centroid dot, the exact path's N×k
    # interpreted signature
    check("semantic.quantized_assign_no_vector_x_centroid_lambda",
          not re.search(r"zip_with\(embedding#\d+L?, c_vec#", p),
          "interpreted vector x centroid zip_with in the assignment plan")
    assignments.unpersist()

    # product quantization: codebooks/LUTs broadcast (never a shuffle
    # join against the exploded coords), raw embedding arrays never
    # cross an exchange, ADC top-k plans as WindowGroupLimit
    from gush_spark.operators import pq as pq_ops

    cb = pq_ops.pq_train(emb, iters=1, dim=64)
    codes = pq_ops.pq_encode(emb, cb, dim=64)
    p = plan_of(
        pq_ops.pq_adc_topk(
            codes, cb, emb.filter(F.col("vec_id") < 8), k=5, dim=64
        )
    )
    check("pq.broadcast_codebook_and_lut",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p
          and "ShuffledHashJoin" not in p,
          "codebook/LUT join not broadcast")
    bad = vec_exchange(p)
    check("pq.no_vector_exchange", bad is None, bad or "")
    check("pq.topk_window_group_limit", "WindowGroupLimit" in p,
          "ADC top-k not WindowGroupLimit")

    # IVF-PQ composition: same invariants end to end — centroids, PQ
    # codebook and LUTs all broadcast; no embedding array ever shuffles
    p = plan_of(
        pq_ops.ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 8),
            n_cells=8, cell_iters=1, pq_iters=1, n_probe=2, k=5, dim=64,
        )
    )
    # embedding arrays may cross ONLY the vec_id-keyed index-build
    # co-location exchange (vectors ⋈ assignments for residuals) —
    # never a query-time or non-id-keyed one
    bad = None
    for mm in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]"
        r"\s*\nArguments: ([^\n]*)",
        p,
    ):
        if "embedding#" in mm.group(1) and "hashpartitioning(vec_id#" \
                not in mm.group(2):
            bad = f"non-id-keyed vector exchange: {mm.group(2)[:100]}"
    check("ivfpq.vectors_only_cross_idkeyed_build_exchange",
          bad is None, bad or "")
    check("ivfpq.no_shuffle_joins_on_codes_or_lut",
          "ShuffledHashJoin" not in p
          and not re.search(r"SortMergeJoin.*(code|cell)", p),
          "a codes/LUT join fell back to a shuffle join")

    # Round-4 session 2: snapshot diff, interval join, classifier, search
    from gush_spark import queries_pipeline as qp

    p = plan_of(qp.q_snapshot_diff(spark, sf_dir))
    bad = None
    for line in p.splitlines():
        if "Exchange" in line and "text#" in line:
            bad = line[:120]
    check("snapshot.no_text_exchange", bad is None, bad or "")

    p = plan_of(qp.q_interval_join_events(spark, sf_dir))
    check("interval.equi_join_not_nested_loop",
          "BroadcastNestedLoopJoin" not in p
          and "CartesianProduct" not in p,
          "range join planned as nested loop")

    p = plan_of(qp.q_linear_classifier_scores(spark, sf_dir))
    check("classifier.hashed_weights_single_doc_exchange",
          len(re.findall(r"\(\d+\) Exchange", p)) <= 1
          and "Join" not in p,
          "hashed-weight scoring grew joins/exchanges")

    p = plan_of(qp.q_bm25_search_topk(spark, sf_dir))
    check("search.topk_take_ordered",
          "TakeOrderedAndProject" in p, "global top-k is not TakeOrdered")
    check("search.query_filter_below_stats_joins",
          re.search(r"Filter.*term#\d+ IN", p) is not None
          or "dynamicpruning" in p or " IN (" in p,
          "query-term IN filter not visible in plan")

    # session-2 late additions: trap detection + path mining stay
    # window-function-shaped over reduced rows (no joins at all) and
    # the path top-k is an ordered limit, not a global sort
    p = plan_of(qp.q_host_volume_anomalies(spark, sf_dir))
    check("anomaly.window_over_reduced_counts_no_join",
          "Join" not in p and "Window" in p
          and len(re.findall(r"\(\d+\) Exchange", p)) <= 2,
          "anomaly plan grew joins or extra exchanges")

    p = plan_of(qp.q_session_path_counts(spark, sf_dir))
    check("paths.topk_take_ordered_no_join",
          "TakeOrderedAndProject" in p and "Join" not in p,
          "path frequency top-k is not TakeOrdered / grew joins")

    # round-5: batch politeness gate — one (key, window)-keyed exchange
    # powering a single row_number, no joins, corpus passes through once
    p = plan_of(qp.q_crawl_politeness_gate(spark, sf_dir))
    check("politeness.single_exchange_window_no_join",
          "Join" not in p and "Window" in p
          and len(re.findall(r"\(\d+\) Exchange", p)) <= 1,
          "politeness gate grew joins or extra exchanges")

    # round-5: PageRank — every per-iteration join must be an equi-join
    # (hash or sort-merge), never a nested loop / cartesian, and the
    # whole pipeline stays JVM-side (no Python eval nodes)
    p = plan_of(qp.q_covisit_pagerank(spark, sf_dir))
    check("graph.pagerank_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "Join" in p,
          "pagerank grew a nested-loop/cartesian join")
    check("graph.pagerank_jvm_only",
          "EvalPython" not in p and "PythonUDF" not in p,
          "pagerank plan contains Python eval nodes")
    p = plan_of(qp.q_trusted_pagerank(spark, sf_dir))
    check("graph.trustrank_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "EvalPython" not in p,
          "trustrank grew a nested-loop join or Python eval nodes")
    # round-5: HITS — same contract as pagerank (equi-joins only,
    # JVM-side end to end)
    p = plan_of(qp.q_covisit_hits(spark, sf_dir))
    check("graph.hits_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "Join" in p,
          "hits grew a nested-loop/cartesian join")
    check("graph.hits_jvm_only",
          "EvalPython" not in p and "PythonUDF" not in p,
          "hits plan contains Python eval nodes")

    # round-5: frontier BFS — every round is an equi-join (src-keyed
    # expand + node-keyed anti), never nested-loop, JVM end to end
    p = plan_of(qp.q_crawl_frontier_hops(spark, sf_dir))
    check("graph.bfs_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "Join" in p and "EvalPython" not in p,
          "bfs grew a nested-loop/cartesian join or Python eval nodes")
    # round-5: triangles — wedge join and the two-column closing-edge
    # join must both be hash/sort-merge equi-joins (the classic failure
    # is the closing edge falling back to a nested loop)
    p = plan_of(qp.q_covisit_triangles(spark, sf_dir))
    check("graph.triangles_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "Join" in p and "EvalPython" not in p,
          "triangles grew a nested-loop/cartesian join or Python eval")

    # round-5: reciprocity — the reversed-pair self-join is a
    # two-column hash equi-join, never nested-loop; JVM end to end
    p = plan_of(qp.q_covisit_reciprocity(spark, sf_dir))
    check("graph.reciprocity_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "Join" in p and "EvalPython" not in p,
          "reciprocity grew a nested-loop/cartesian join or Python eval")

    # round-5: recrawl priorities — the corpus scalar rides the 1-row
    # broadcast nested-loop join (the DSIR totals pattern) and top-k is
    # an ordered limit, not a global sort
    p = plan_of(qp.q_recrawl_priorities(spark, sf_dir))
    check("recrawl.scalar_bnlj_and_take_ordered",
          "BroadcastNestedLoopJoin" in p and "TakeOrderedAndProject" in p,
          "recrawl lost the 1-row scalar join or the ordered-limit top-k")

    # round-5 session 3: Gopher gate — one codegen projection over the
    # scan, zero shuffles, zero joins, zero Python
    p = plan_of(qp.q_gopher_quality_gate(spark, sf_dir))
    check("gopher.map_only_jvm",
          "Exchange" not in p and "Join" not in p
          and "EvalPython" not in p and "PythonUDF" not in p,
          "gopher gate grew a shuffle/join or Python eval nodes")

    # round-5 session 3: k-core peel — per round one degree agg + two
    # semi-joins, all equi (never nested-loop), JVM end to end
    p = plan_of(qp.q_covisit_kcore(spark, sf_dir))
    check("graph.kcore_equi_joins_only",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "EvalPython" not in p,
          "kcore grew a nested-loop/cartesian join or Python eval")

    # round-5 session 3: funnel — per-stage min-aggs chained by
    # user-keyed equi-joins; the stage filter reaches the scan
    # (PushedFilters on event_type), no window sort, no Python.
    # funnel_conversion's catalog entry collects 3 driver scalars and
    # returns a local frame, so audit the stage-2 lineage directly.
    from gush_spark.operators.events import funnel_conversion as _fc  # noqa: E402
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as _F
    us = _F.unix_micros(_F.col("ts").cast("timestamp"))
    s0 = (ev.filter(_F.col("event_type") == "view")
          .select(_F.col("user_id").alias("_u"), us.alias("_t"))
          .groupBy("_u").agg(_F.min("_t").alias("_done")))
    s1 = (s0.join(ev.filter(_F.col("event_type") == "click")
                  .select(_F.col("user_id").alias("_u"), us.alias("_t")),
                  on="_u")
          .filter((_F.col("_t") > _F.col("_done"))
                  & (_F.col("_t") <= _F.col("_done") + _F.lit(86400000000)))
          .groupBy("_u").agg(_F.min("_t").alias("_done")))
    p = plan_of(s1)
    check("funnel.pushed_stage_filter_no_window",
          "PushedFilters" in p and "event_type" in p
          and "Window" not in p and "EvalPython" not in p
          and "partial_min" in p,
          "funnel stage lineage lost filter pushdown / map-side min, "
          "or grew a window/Python node")

    # round-5 session 3: hash walks — per step one src-keyed equi-join
    # + a struct-min argmin AGG (map-side combinable min, no per-start
    # row_number Window; the only Window nodes allowed are the ones the
    # sessionized edge build itself carries — lag/lead/sum, never
    # row_number)
    p = plan_of(qp.q_covisit_walks(spark, sf_dir))
    check("graph.walks_equi_join_argmin_no_rownumber",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "EvalPython" not in p and "row_number" not in p
          and "partial_min" in p,
          "walks grew a nested-loop join, a row_number sort, or Python "
          "eval, or lost the map-side-combinable argmin")

    # round-5 session 6: hyperlink extraction — pure JVM (regexps +
    # one Generate), the wide html column must never cross an
    # Exchange (it dies at the explode's child projection), and the
    # anchor top-k is WindowGroupLimit
    p = plan_of(qp.q_link_host_graph(spark, sf_dir))
    bad = None
    for mm in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p
    ):
        if "html" in mm.group(1):
            bad = f"html crosses an Exchange: {mm.group(1)[:120]}"
    check("links.jvm_only_html_never_shuffles",
          "EvalPython" not in p and bad is None
          and len(re.findall(r"\(\d+\) Generate", p)) == 1,
          bad or "link extraction grew Python eval or a second Generate")
    p = plan_of(qp.q_anchor_text_topk(spark, sf_dir))
    check("links.anchor_topk_window_group_limit",
          "WindowGroupLimit" in p and "EvalPython" not in p,
          "anchor top-k lost WindowGroupLimit or grew Python eval")

    # round-5 session 7: resource-allocation link prediction — wedge
    # enumeration must stay equi-join (hash on the middle vertex /
    # (a,c) pair keys, never nested-loop) and the per-node top-k must
    # be WindowGroupLimit, not a global sort
    p = plan_of(qp.q_covisit_link_prediction(spark, sf_dir))
    check("linkpred.equi_joins_and_window_group_limit",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
          and "EvalPython" not in p and "WindowGroupLimit" in p,
          "link prediction grew a nested-loop join or lost the "
          "WindowGroupLimit top-k")

    # session 7: SQ8 audit — the embedding ARRAY must never cross an
    # Exchange (only (dim, element) pairs shuffle for the stats table;
    # the pinned min/max arrays come back as a 1-row broadcast)
    p = plan_of(qp.q_sq8_quantization_report(spark, sf_dir))
    bad = None
    for mm in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p
    ):
        if "embedding" in mm.group(1):
            bad = f"embedding crosses an Exchange: {mm.group(1)[:120]}"
    check("sq8.vectors_never_shuffle",
          bad is None and "EvalPython" not in p and "SortMergeJoin" not in p,
          bad or "SQ8 grew Python eval or a shuffle join")

    # session 7: vocabulary divergence — raw text dies at the explode
    # (only (source, bucket) counts shuffle) and the corpus vector
    # joins back broadcast
    p = plan_of(qp.q_source_vocab_divergence(spark, sf_dir))
    bad = None
    for mm in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p
    ):
        if re.search(r"\b(text|norm)", mm.group(1)):
            bad = f"raw text crosses an Exchange: {mm.group(1)[:120]}"
    # (the plan's BroadcastNestedLoopJoins are the bounded parameter
    # cross-joins — the 1-row corpus total and the n_buckets-row
    # corpus vector — never a data-sized side)
    check("divergence.no_rawtext_exchange_broadcast_vector",
          bad is None and "CartesianProduct" not in p
          and "EvalPython" not in p,
          bad or "divergence grew an unbroadcast cartesian or Python eval")

    # session 7: calibration — the eval-label join must broadcast (the
    # labeled sample is orders of magnitude smaller than the corpus)
    p = plan_of(qp.q_classifier_calibration_bins(spark, sf_dir))
    check("calibration.label_join_broadcast",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p
          and "EvalPython" not in p,
          "label join stopped broadcasting")

    # session 7: LSH planner — a parameter table: no table scan, no
    # exchange, nothing but codegen over a range
    p = plan_of(qp.q_lsh_parameter_plan(spark, sf_dir))
    check("lshplan.pure_codegen_no_scan_no_exchange",
          "Scan parquet" not in p and "Exchange" not in p
          and "EvalPython" not in p,
          "the parameter table grew a scan or a shuffle")

    # session 7 wave 2: block-max index build — per-TERM windows only
    # (posting lists sort in parallel; a SinglePartition window would
    # be the corpus-sort trap)
    # (the plan's SinglePartition exchanges are the two 1-row scalar
    # totals (N, Σtf) — same as bm25_search; the WINDOW must hash by
    # term so posting lists sort in parallel)
    p = plan_of(qp.q_blockmax_postings(spark, sf_dir))
    check("blockmax.per_term_windows_no_global_sort",
          "hashpartitioning(term" in p and "EvalPython" not in p,
          "index build lost the term-keyed window partitioning")

    # PQ rerank — the float corpus must be pruned by a (broadcast)
    # LeftSemi on the shortlist BEFORE any explode
    p = plan_of(qp.q_pq_adc_rerank_topk(spark, sf_dir))
    check("pqrerank.semi_join_prunes_corpus",
          "LeftSemi" in p and "CartesianProduct" not in p
          and "EvalPython" not in p,
          "rerank lost the shortlist semi-join prune")

    # hapax — raw words die at the md5; exchanges carry hashed keys
    p = plan_of(qp.q_hapax_rate_report(spark, sf_dir))
    bad = None
    for mm in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", p
    ):
        if re.search(r"\b(_w|text|norm)", mm.group(1)):
            bad = f"raw words cross an Exchange: {mm.group(1)[:120]}"
    check("hapax.hashed_keys_on_the_wire",
          bad is None and "EvalPython" not in p,
          bad or "hapax grew Python eval")

    # TPC-H Q3 shape — filters pushed into all three scans, the
    # filtered dim broadcast, top-10 as TakeOrdered (never global sort)
    import gush_spark.queries as coreq
    p = plan_of(coreq.q_shipping_priority_topk(spark, sf_dir))
    check("q3.pushed_filters_broadcast_dim_takeordered",
          "PushedFilters: [" in p and "BroadcastHashJoin" in p
          and "TakeOrderedAndProject" in p,
          "Q3 lost filter pushdown, the broadcast dim join, or "
          "TakeOrderedAndProject")

    # RRF fusion — bounded frames end-to-end, WindowGroupLimit top-k
    p = plan_of(qp.q_ann_rrf_fused_topk(spark, sf_dir))
    check("rrf.window_group_limit_no_python",
          "WindowGroupLimit" in p and "EvalPython" not in p,
          "fusion lost WindowGroupLimit or grew Python eval")

    # Q5 snowflake — the dimension chain broadcasts; never a cartesian
    p = plan_of(coreq.q_local_supplier_volume(spark, sf_dir))
    check("q5.snowflake_broadcast_chain",
          p.count("BroadcastHashJoin") >= 3
          and "CartesianProduct" not in p and "EvalPython" not in p,
          "Q5 lost the broadcast dimension chain")

    # Q14 — part broadcast against the filtered fact, one agg
    p = plan_of(coreq.q_promo_revenue_share(spark, sf_dir))
    check("q14.broadcast_part_pushed_dates",
          "BroadcastHashJoin" in p and "PushedFilters: [" in p
          and "SortMergeJoin" not in p,
          "Q14 lost the broadcast part join or the date pushdown")

    spark.stop()
    print(f"{'ALL PASS' if not FAILURES else f'{len(FAILURES)} FAILURES'}")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
