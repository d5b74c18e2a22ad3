"""Keyword-extraction semantics: TF-IDF / BM25 rankings on a planted
corpus where the characteristic terms are known, plus the cluster-topic
report over separable embedding groups."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gush_spark.operators import keywords as kw


@pytest.fixture(scope="module")
def kw_docs(spark):
    """8 docs over a shared filler vocabulary; docs 0-3 carry 'zebra'
    (doc 0 repeatedly), docs 4-7 carry 'quark'. 'the' appears in every
    doc (the stopword the max_df cut must drop)."""
    filler = "the data table row"
    rows = [
        (0, f"{filler} zebra zebra zebra zebra"),
        (1, f"{filler} zebra"),
        (2, f"{filler} zebra extra words here"),
        (3, f"{filler} zebra longer document with many extra filler words"),
        (4, f"{filler} quark"),
        (5, f"{filler} quark"),
        (6, f"{filler} quark"),
        (7, f"{filler} quark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).persist()


def test_tfidf_ranks_planted_term_and_cuts_stopwords(kw_docs):
    out = kw.tfidf_top_terms(kw_docs, k=3, min_df=2, max_df_frac=0.6)
    rows = out.collect()
    # 'the'/'data'/'table'/'row' are in all 8 docs > 0.6*8 — cut
    assert not any(r["term"] in {"the", "data", "table", "row"} for r in rows)
    top = {r["doc_id"]: r["term"] for r in rows if r["rank"] == 1}
    assert top[0] == "zebra" and top[4] == "quark"
    # df bookkeeping: zebra in 4 docs, quark in 4
    by_term = {(r["doc_id"], r["term"]): r for r in rows}
    assert by_term[(0, "zebra")]["df"] == 4
    assert by_term[(0, "zebra")]["tf"] == 4
    # value pins the formula: tf * round(ln((N+1)/(df+1)) + 1, 6)
    want = round(4 * round(math.log(9 / 5) + 1, 6), 6)
    assert by_term[(0, "zebra")]["tfidf"] == pytest.approx(want, abs=0)


def test_bm25_saturates_and_length_normalizes(kw_docs):
    out = kw.bm25_top_terms(kw_docs, k=3, min_df=2, max_df_frac=0.6)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    # saturation: 4x the tf gives far less than 4x the score
    s4, s1 = rows[(0, "zebra")]["score"], rows[(1, "zebra")]["score"]
    assert s4 > s1
    assert s4 < 2.5 * s1
    # length normalization: same tf=1 'zebra', longer doc scores lower
    assert rows[(3, "zebra")]["score"] < rows[(1, "zebra")]["score"]
    # value pin against the exact shared formula
    r = rows[(1, "zebra")]
    n, df, tf, dl = 8, 4, 1, r["dl"]
    avgdl = sum(
        len(t.split()) for t in (
            x["text"] for x in kw_docs.select("text").collect()
        )
    ) / n
    idf = round(math.log(1 + (n - df + 0.5) / (df + 0.5)), 6)
    want = round(
        idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))), 6
    )
    assert r["score"] == pytest.approx(want, abs=1e-12)


def test_bm25_rank_total_order_and_k(kw_docs):
    out = kw.bm25_top_terms(kw_docs, k=2, min_df=1, max_df_frac=1.0).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append((r["rank"], r["score"], r["term"]))
    for doc, rs in per_doc.items():
        rs.sort()
        assert [r[0] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
        # descending score, ties broken by term ascending
        for (ra, sa, ta), (rb, sb, tb) in zip(rs, rs[1:]):
            assert sa > sb or (sa == sb and ta < tb)


def test_cluster_topics_recover_group_vocabulary(spark):
    """Two tight embedding groups whose documents use disjoint content
    words: each cell's top terms must come from its own group's
    vocabulary, and the all-docs filler word scores at the cf == C
    floor (never above a group-exclusive term)."""
    rng = np.random.default_rng(5)
    c0, c1 = rng.normal(size=8) * 6, rng.normal(size=8) * 6
    vec_rows, doc_rows = [], []
    for i in range(20):
        grp = i % 2
        base = c0 if grp == 0 else c1
        vec_rows.append((i, [float(x) for x in base + rng.normal(size=8) * 0.05]))
        word = "astronomy stars galaxy" if grp == 0 else "cooking flour oven"
        doc_rows.append((i, f"shared {word}"))
    vecs = spark.createDataFrame(vec_rows, ["vec_id", "embedding"])
    docs = spark.createDataFrame(doc_rows, ["doc_id", "text"])
    out = kw.cluster_topic_report(
        docs, vecs, n_cells=2, iters=2, k=3
    ).collect()
    cells = {}
    for r in out:
        cells.setdefault(r["cell"], []).append(r)
    assert len(cells) == 2
    vocab0 = {"astronomy", "stars", "galaxy"}
    vocab1 = {"cooking", "flour", "oven"}
    tops = {c: {r["term"] for r in rs} for c, rs in cells.items()}
    assert vocab0 in tops.values() or vocab1 in tops.values()
    for rs in cells.values():
        terms = {r["term"] for r in rs}
        assert terms == vocab0 or terms == vocab1  # 'shared' never top-3
        for r in rs:
            if r["term"] != "shared":
                assert r["cf"] == 1


def test_empty_and_whitespace_docs_drop_out(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "alpha beta"), (3, "alpha gamma")],
        ["doc_id", "text"],
    )
    out = kw.tfidf_top_terms(docs, k=5, min_df=1, max_df_frac=1.0).collect()
    assert {r["doc_id"] for r in out} == {2, 3}
    # N still counts the empty docs: df=2 of N=4 for 'alpha'
    a = next(r for r in out if r["doc_id"] == 2 and r["term"] == "alpha")
    assert a["df"] == 2
    want = round(1 * round(math.log(5 / 3) + 1, 6), 6)
    assert a["tfidf"] == pytest.approx(want, abs=0)


def test_bm25_search_ranks_full_matches_first(spark):
    from gush_spark.operators.keywords import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle skew salt shuffle"),
            (2, "shuffle only here with lots of other filler words around"),
            (3, "completely unrelated text about gardens"),
            (4, "skew and salt appear together salt"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_search(docs, ["shuffle", "skew", "salt"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids  # no query term -> not a hit
    assert ids[0] in (1, 4) and set(ids) == {1, 2, 4}
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["n_matched"] == 3  # shuffle + skew + salt
    assert by_id[4]["n_matched"] == 2
    assert by_id[2]["n_matched"] == 1
    # ranks are 1..n and ordered by score
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]


def test_bm25_search_topk_plans_ordered_limit(spark):
    from gush_spark.operators.keywords import bm25_search

    docs = spark.createDataFrame(
        [(i, f"term{i % 7} shuffle filler") for i in range(200)],
        "doc_id long, text string",
    )
    df = bm25_search(docs, ["shuffle"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heads, no global sort
    assert len(df.collect()) == 5


def test_collocation_lift_exact_values(spark):
    from gush_spark.operators.keywords import collocation_lift

    # Corpus: "a b" x3, "a c" x1 — bigram slots within each doc only.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    rows = collocation_lift(docs, "doc_id", "text", min_count=1, k=10).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    # T=4; c(a b)=3, left a=4, right b=3 -> 3*4*1e6 div (4*3) = 1e6 (lift 1.0)
    ab = by_pair[("a", "b")]
    assert ab["pair_count"] == 3 and ab["left_count"] == 4
    assert ab["right_count"] == 3 and ab["total_pairs"] == 4
    assert ab["lift_scaled"] == 1_000_000
    # c(a c)=1, left a=4, right c=1 -> 1*4*1e6 div (4*1) = 1e6
    assert by_pair[("a", "c")]["lift_scaled"] == 1_000_000


def test_collocation_lift_bound_pair_beats_common_pair(spark):
    from gush_spark.operators.keywords import collocation_lift

    # "x y" always co-occur exclusively; "the end"/"the start" split
    # "the"'s mass -> lift(x,y) > lift(the,*) even at equal counts.
    data = [(i, "x y") for i in range(5)]
    data += [(100 + i, "the end") for i in range(5)]
    data += [(200 + i, "the start") for i in range(5)]
    rows = collocation_lift(
        spark.createDataFrame(data, "doc_id long, text string"),
        min_count=1, k=10,
    ).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    # T=15: lift(x,y) = 5*15e6 div 25 = 3e6; lift(the,end) = 5*15e6 div (10*5) = 1.5e6
    assert by_pair[("x", "y")]["lift_scaled"] == 3_000_000
    assert by_pair[("the", "end")]["lift_scaled"] == 1_500_000
    assert rows[0]["w1"] == "x"  # bound pair ranks first
    # min_count prunes (margins still computed on full mass)
    pruned = collocation_lift(
        spark.createDataFrame(data, "doc_id long, text string"),
        min_count=6, k=10,
    ).collect()
    assert pruned == []


def test_collocation_lift_plans_take_ordered(spark):
    from gush_spark.operators.keywords import collocation_lift

    docs = spark.createDataFrame(
        [(i, "web crawl page index rank host") for i in range(50)],
        "doc_id long, text string",
    )
    df = collocation_lift(docs, min_count=1, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k never a global sort
    assert "BroadcastNestedLoopJoin" in plan  # 1-row total broadcast
    assert len(df.collect()) == 3
